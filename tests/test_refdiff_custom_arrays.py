"""
Differential tests for custom Array/TemporalArray fields attached to cuts:
identical on-disk arrays through BOTH implementations' manifest arithmetic
(truncate / pad / windows over cuts carrying temporal custom fields), with
loaded payloads compared exactly.

Reference: lhotse/array.py (Array/TemporalArray), lhotse/cut/data.py custom
field propagation.
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

import lhotse_tpu.features.io as MIO
from lhotse_tpu.cut.set import deserialize_cut as my_deserialize_cut

SR = 16000
FRAME_SHIFT = 0.01


@pytest.fixture()
def cut_dicts_with_customs(tmp_path):
    """One cut dict with an embedding Array + frame-level TemporalArray,
    stored once on disk (numpy_files: interchange-proven)."""
    rng = np.random.RandomState(0)
    emb = rng.randn(256).astype(np.float32)
    frames = rng.randn(300, 4).astype(np.float32)  # 3.0 s at 10ms
    with MIO.NumpyFilesWriter(tmp_path / "arr") as w:
        k_emb = w.write("emb1", emb)
        k_frm = w.write("frm1", frames)
        st, sp = w.name, w.storage_path

    d = {
        "id": "c",
        "start": 0.0,
        "duration": 3.0,
        "channel": 0,
        "recording": {
            "id": "r",
            "sources": [{"type": "file", "channels": [0], "source": "/x/r.wav"}],
            "sampling_rate": SR,
            "num_samples": 3 * SR,
            "duration": 3.0,
        },
        "supervisions": [],
        "custom": {
            "embedding": {
                "storage_type": st,
                "storage_path": str(sp),
                "storage_key": k_emb,
                "shape": [256],
            },
            "frames": {
                "array": {
                    "storage_type": st,
                    "storage_path": str(sp),
                    "storage_key": k_frm,
                    "shape": [300, 4],
                },
                "temporal_dim": 0,
                "frame_shift": FRAME_SHIFT,
                "start": 0.0,
            },
        },
        "type": "MonoCut",
    }
    return d, emb, frames


def test_custom_array_load_matches(cut_dicts_with_customs):
    d, emb, frames = cut_dicts_with_customs
    rc = ref_deserialize_cut(copy.deepcopy(d))
    mc = my_deserialize_cut(copy.deepcopy(d))
    np.testing.assert_array_equal(rc.load_embedding(), emb)
    np.testing.assert_array_equal(mc.load_embedding(), rc.load_embedding())
    np.testing.assert_array_equal(rc.load_frames(), frames)
    np.testing.assert_array_equal(mc.load_frames(), rc.load_frames())


@pytest.mark.parametrize(
    "offset, duration",
    [(0.5, 1.0), (0.0, 2.2), (1.25, None), (0.735, 0.5)],
)
def test_truncated_temporal_array_matches(cut_dicts_with_customs, offset, duration):
    d, _, _ = cut_dicts_with_customs
    rc = ref_deserialize_cut(copy.deepcopy(d)).truncate(
        offset=offset, duration=duration, preserve_id=True
    )
    mc = my_deserialize_cut(copy.deepcopy(d)).truncate(
        offset=offset, duration=duration, preserve_id=True
    )
    a, b = rc.load_frames(), mc.load_frames()
    assert a.shape == b.shape, (offset, duration)
    np.testing.assert_array_equal(a, b)
    # non-temporal Array is untouched by truncation on both sides
    np.testing.assert_array_equal(rc.load_embedding(), mc.load_embedding())


def test_windowed_temporal_array_matches(cut_dicts_with_customs):
    d, _, _ = cut_dicts_with_customs
    rws = list(ref_deserialize_cut(copy.deepcopy(d)).cut_into_windows(duration=0.7))
    mws = list(my_deserialize_cut(copy.deepcopy(d)).cut_into_windows(duration=0.7))
    assert len(rws) == len(mws)
    for rw, mw in zip(rws, mws):
        a, b = rw.load_frames(), mw.load_frames()
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)
