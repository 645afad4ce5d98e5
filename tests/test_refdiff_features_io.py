"""
Differential feature-storage and feature-domain tests vs the ACTUAL reference.

Storage interchange (the wire contract for precomputed features): archives
written by one implementation with the lilcom-free codecs (numpy_files,
numpy_hdf5, memory_raw) must read back identically in the other, including
chunked partial reads driven by the Features manifest.  Reference:
lhotse/features/io.py:473-658,1336-1380.

Feature-domain algebra: identical feature arrays attached to cuts on both
sides, then pad / mix in the FEATURE domain (energy-gain arithmetic in
FeatureMixer, reference features/mixer.py) — outputs must agree to float32.
"""
import copy

import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    import lhotse.features.io as RIO
    from lhotse.cut.set import deserialize_cut as ref_deserialize_cut
    from lhotse.features.base import Features as RefFeatures

import lhotse_tpu.features.io as MIO
from lhotse_tpu.cut.set import deserialize_cut as my_deserialize_cut
from lhotse_tpu.features.base import Features as MyFeatures

SR = 16000
FRAME_SHIFT = 0.01


def _feats(num_frames=123, dim=80, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(num_frames, dim) * 3 - 9).astype(np.float32)


def _features_manifest_dict(key, storage_type, storage_path, num_frames, dim):
    return {
        "type": "kaldi-fbank",
        "num_frames": num_frames,
        "num_features": dim,
        "frame_shift": FRAME_SHIFT,
        "sampling_rate": SR,
        "start": 0.0,
        "duration": num_frames * FRAME_SHIFT,
        "storage_type": storage_type,
        "storage_path": str(storage_path),
        "storage_key": key,
    }


@pytest.mark.parametrize(
    "my_writer, ref_reader_type",
    [("NumpyFilesWriter", None), ("NumpyHdf5Writer", None)],
)
def test_our_archives_read_by_reference(tmp_path, my_writer, ref_reader_type):
    arr = _feats()
    with getattr(MIO, my_writer)(tmp_path / "feats") as w:
        key = w.write("utt1", arr)
        storage_type = w.name
        storage_path = w.storage_path

    d = _features_manifest_dict(key, storage_type, storage_path, *arr.shape)
    theirs = RefFeatures.from_dict(copy.deepcopy(d))
    mine = MyFeatures.from_dict(copy.deepcopy(d))
    np.testing.assert_array_equal(theirs.load(), arr)
    np.testing.assert_array_equal(mine.load(), theirs.load())
    # chunked partial read driven by the manifest
    a = theirs.load(start=0.2, duration=0.5)
    b = mine.load(start=0.2, duration=0.5)
    np.testing.assert_array_equal(a, b)
    assert a.shape[0] == 50


@pytest.mark.parametrize("ref_writer", ["NumpyFilesWriter", "NumpyHdf5Writer"])
def test_reference_archives_read_by_us(tmp_path, ref_writer):
    arr = _feats(seed=1)
    with getattr(RIO, ref_writer)(tmp_path / "feats") as w:
        key = w.write("utt1", arr)
        storage_type = w.name
        storage_path = w.storage_path

    d = _features_manifest_dict(key, storage_type, storage_path, *arr.shape)
    mine = MyFeatures.from_dict(d)
    np.testing.assert_array_equal(mine.load(), arr)
    np.testing.assert_array_equal(
        mine.load(start=0.3, duration=0.31), arr[30:61]
    )


def _cut_with_feats_dict(cut_id, arr, storage_type, storage_path, key, dur=None):
    num_frames, dim = arr.shape
    duration = dur if dur is not None else num_frames * FRAME_SHIFT
    return {
        "id": cut_id,
        "start": 0.0,
        "duration": duration,
        "channel": 0,
        "features": _features_manifest_dict(key, storage_type, storage_path, num_frames, dim),
        "supervisions": [],
        "type": "MonoCut",
    }


@pytest.fixture()
def both_cut_pairs(tmp_path):
    """Two cuts with IDENTICAL on-disk features, deserialized on both sides."""
    a1 = _feats(num_frames=150, seed=2)
    a2 = _feats(num_frames=100, seed=3)
    with MIO.NumpyFilesWriter(tmp_path / "feats") as w:
        k1, k2 = w.write("u1", a1), w.write("u2", a2)
        st, sp = w.name, w.storage_path
    d1 = _cut_with_feats_dict("c1", a1, st, sp, k1)
    d2 = _cut_with_feats_dict("c2", a2, st, sp, k2)
    theirs = [ref_deserialize_cut(copy.deepcopy(d)) for d in (d1, d2)]
    mine = [my_deserialize_cut(copy.deepcopy(d)) for d in (d1, d2)]
    return theirs, mine, (a1, a2)


def test_feature_domain_truncate_and_pad(both_cut_pairs):
    (rc, _), (mc, _), (arr, _) = (
        both_cut_pairs[0],
        both_cut_pairs[1],
        both_cut_pairs[2],
    )
    a = rc.truncate(offset=0.2, duration=0.7).load_features()
    b = mc.truncate(offset=0.2, duration=0.7).load_features()
    np.testing.assert_array_equal(a, b)

    a = rc.pad(duration=2.0, direction="right").load_features()
    b = mc.pad(duration=2.0, direction="right").load_features()
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) < 1e-4  # padding log-energy floor


@pytest.mark.parametrize("snr", [None, 0.0, 10.0])
def test_feature_domain_mix(both_cut_pairs, snr):
    (rc1, rc2), (mc1, mc2), _ = both_cut_pairs
    a = rc1.mix(rc2, offset_other_by=0.25, snr=snr).load_features()
    b = mc1.mix(mc2, offset_other_by=0.25, snr=snr).load_features()
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) < 1e-4, f"snr={snr}"
