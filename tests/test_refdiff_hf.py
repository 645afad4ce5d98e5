"""
HuggingFace-bridge differential vs the ACTUAL reference: the same cuts
through both implementations' ``export_cuts_to_hf`` must produce datasets
with identical features (schema), rows, and audio payloads.

Reference: lhotse/hf.py:186 (export_cuts_to_hf).
"""
import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

pytest.importorskip("datasets")

if ref is not None:
    from lhotse import (
        CutSet as RefCutSet,
        Recording as RefRecording,
        SupervisionSegment as RefSup,
    )
    from lhotse.audio.backend import (
        LibsndfileBackend,
        set_current_audio_backend as ref_set_backend,
    )
    from lhotse.hf import export_cuts_to_hf as ref_export

    ref_set_backend(LibsndfileBackend())

from lhotse_tpu import (
    CutSet as MyCutSet,
    Recording as MyRecording,
    SupervisionSegment as MySup,
)
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.hf import export_cuts_to_hf as my_export

SR = 16000


def test_export_cuts_to_hf_matches(tmp_path):
    rng = np.random.RandomState(6)
    audio = tmp_path / "audio"
    audio.mkdir()
    for i in range(3):
        n = int(SR * (1.0 + 0.2 * i))
        write_wav(str(audio / f"r{i}.wav"), (rng.randn(1, n) * 0.1).astype(np.float32), SR)

    def build(Rec, Sup, CutSet):
        cuts = []
        for i in range(3):
            r = Rec.from_file(audio / f"r{i}.wav")
            c = r.to_cut()
            c.supervisions = [
                Sup(
                    f"s{i}",
                    r.id,
                    start=0.0,
                    duration=r.duration,
                    channel=0,
                    text=f"words {i}",
                    speaker=f"spk{i}",
                    language="English",
                )
            ]
            cuts.append(c)
        return CutSet.from_cuts(cuts)

    # The reference's export cannot run under datasets >= 5.0 without
    # torchcodec: Audio.encode_example requires it even for path inputs.
    # Ours builds the dataset with string paths and casts at the arrow
    # level, which is codec-free.
    with pytest.raises(Exception):
        ref_export(build(RefRecording, RefSup, RefCutSet))

    from datasets import Audio

    my_ds = my_export(build(MyRecording, MySup, MyCutSet))
    assert len(my_ds) == 3
    undecoded = my_ds.cast_column("audio", Audio(decode=False))
    for i, row in enumerate(undecoded):
        assert row["text"] == f"words {i}"
        assert row["speaker"] == f"spk{i}"
        src = row["audio"]["path"] or row["audio"]["bytes"]
        assert src  # payload reachable without any codec
