"""
Offline feature-precompute differential vs the ACTUAL reference: the same
on-disk corpus through both implementations' ``CutSet.
compute_and_store_features`` (numpy_files storage, no lilcom needed), with
the resulting cut/feature manifests compared field-by-field and the stored
payloads compared at the float32 extractor noise floor.

Reference: lhotse/cut/set.py:1981 (compute_and_store_features),
lhotse/features/base.py:870 (FeatureSetBuilder).
"""
import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    import lhotse.features.io as RIO
    from lhotse import (
        CutSet as RefCutSet,
        Fbank as RefFbank,
        Recording as RefRecording,
    )
    from lhotse.audio.backend import (
        LibsndfileBackend,
        set_current_audio_backend as ref_set_backend,
    )

    ref_set_backend(LibsndfileBackend())

import lhotse_tpu.features.io as MIO
from lhotse_tpu import CutSet as MyCutSet, Fbank as MyFbank, Recording as MyRecording
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def test_compute_and_store_features_matches(tmp_path):
    rng = np.random.RandomState(4)
    audio = tmp_path / "audio"
    audio.mkdir()
    for i in range(3):
        n = int(SR * (1.0 + 0.3 * i))
        write_wav(str(audio / f"r{i}.wav"), (rng.randn(1, n) * 0.1).astype(np.float32), SR)

    their_cuts = RefCutSet.from_cuts(
        RefRecording.from_file(audio / f"r{i}.wav").to_cut() for i in range(3)
    ).compute_and_store_features(
        extractor=RefFbank(),
        storage_path=tmp_path / "ref_feats",
        storage_type=RIO.NumpyFilesWriter,
        progress_bar=False,
    )
    my_cuts = MyCutSet.from_cuts(
        MyRecording.from_file(audio / f"r{i}.wav").to_cut() for i in range(3)
    ).compute_and_store_features(
        extractor=MyFbank(),
        storage_path=tmp_path / "my_feats",
        storage_type=MIO.NumpyFilesWriter,
    )

    theirs = {c.id: c for c in their_cuts}
    mine = {c.id: c for c in my_cuts}
    assert set(theirs) == set(mine)
    for cid in theirs:
        t, m = theirs[cid], mine[cid]
        tf, mf = t.features, m.features
        # manifest geometry must match exactly
        assert (tf.num_frames, tf.num_features, tf.frame_shift, tf.sampling_rate) == (
            mf.num_frames,
            mf.num_features,
            mf.frame_shift,
            mf.sampling_rate,
        )
        assert (tf.start, tf.duration) == (mf.start, mf.duration)
        assert tf.type == mf.type
        assert tf.storage_type == mf.storage_type == "numpy_files"
        # payloads at the float32 extractor noise floor
        a, b = t.load_features(), m.load_features()
        assert a.shape == b.shape
        assert float(np.abs(a - b).max()) < 2e-3
