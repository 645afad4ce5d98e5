"""
Array / TemporalArray manifests: store_array round trips, partial temporal
reads, (de)serialization dispatch, move_to_memory, pad_array, and custom
field attachment on cuts (reference surface: lhotse/array.py;
reference tests: test/test_feature_set.py, test/cut/test_custom_attrs.py).
"""
import numpy as np
import pytest

from lhotse_tpu.array import Array, TemporalArray, deserialize_array, pad_array, seconds_to_frames
from lhotse_tpu.features.io import LilcomChunkyWriter, NumpyFilesWriter
from lhotse_tpu.testing.dummies import dummy_cut


def test_store_array_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    value = rng.normal(size=(44, 13)).astype(np.float32)
    with NumpyFilesWriter(str(tmp_path)) as w:
        arr = w.store_array("u1", value)
    assert isinstance(arr, Array)
    assert arr.shape == [44, 13] and arr.ndim == 2
    np.testing.assert_array_equal(arr.load(), value)


def test_store_temporal_array_partial_reads(tmp_path):
    rng = np.random.default_rng(1)
    value = rng.normal(size=(250, 8)).astype(np.float32)
    with LilcomChunkyWriter(str(tmp_path / "arr")) as w:
        t = w.store_array("u1", value, frame_shift=0.01, temporal_dim=0, start=0.0)
        w.flush()
        assert isinstance(t, TemporalArray)
        assert t.num_frames == 250
        assert np.isclose(t.duration, 2.5)
        full = t.load()
        assert full.shape == (250, 8)
        part = t.load(start=0.5, duration=1.0)
        np.testing.assert_array_equal(part, full[50:150])


def test_temporal_array_nonzero_start_offsets_reads(tmp_path):
    value = np.arange(100 * 2, dtype=np.float32).reshape(100, 2)
    with NumpyFilesWriter(str(tmp_path)) as w:
        t = w.store_array("u1", value, frame_shift=0.01, temporal_dim=0, start=5.0)
    np.testing.assert_array_equal(t.load(start=5.5, duration=0.2), value[50:70])
    with pytest.raises(ValueError):
        t.load(start=4.0)


def test_serialization_dispatch_roundtrip(tmp_path):
    with NumpyFilesWriter(str(tmp_path)) as w:
        arr = w.store_array("a", np.zeros((3, 4), dtype=np.float32))
        tarr = w.store_array(
            "b", np.zeros((10, 4), dtype=np.float32), frame_shift=0.04,
            temporal_dim=0)
    arr2 = deserialize_array(arr.to_dict())
    tarr2 = deserialize_array(tarr.to_dict())
    assert isinstance(arr2, Array) and arr2 == arr
    assert isinstance(tarr2, TemporalArray) and tarr2 == tarr


def test_move_to_memory_detaches_from_disk(tmp_path):
    rng = np.random.default_rng(2)
    value = rng.normal(size=(30, 5)).astype(np.float32)
    with NumpyFilesWriter(str(tmp_path)) as w:
        t = w.store_array("u", value, frame_shift=0.01, temporal_dim=0)
    mem = t.move_to_memory()
    assert mem.is_in_memory and mem.start == 0.0
    np.testing.assert_array_equal(mem.load(), value)
    # Lossy in-memory variant stays within the lilcom quantization bound.
    mem_l = t.move_to_memory(lilcom=True)
    assert np.abs(mem_l.load() - value).max() <= 2.0**-5


def test_pad_array_extends_temporal_dim():
    value = np.ones((20, 3), dtype=np.float32)
    padded = pad_array(
        value, temporal_dim=0, frame_shift=0.01, offset=0.05, padded_duration=0.3,
        pad_value=-1.0)
    assert padded.shape == (30, 3)
    assert np.all(padded[:5] == -1.0)
    np.testing.assert_array_equal(padded[5:25], value)
    assert np.all(padded[25:] == -1.0)


def test_seconds_to_frames_half_up_rounding():
    assert seconds_to_frames(0.004999, frame_shift=0.01) == 0
    assert seconds_to_frames(0.005, frame_shift=0.01) == 1
    assert seconds_to_frames(1.0, frame_shift=0.01, max_index=50) == 50


def test_custom_array_travels_with_cut(tmp_path):
    cut = dummy_cut(0)
    rng = np.random.default_rng(3)
    embedding = rng.normal(size=(192,)).astype(np.float32)
    with NumpyFilesWriter(str(tmp_path)) as w:
        cut = cut.attach_tensor("xvector", embedding)
        alignment = rng.normal(size=(100, 4)).astype(np.float32)
        cut = cut.attach_tensor(
            "posteriors", alignment, frame_shift=0.01, temporal_dim=0)
    assert cut.has_custom("xvector")
    np.testing.assert_array_equal(cut.load_xvector(), embedding)
    loaded = cut.load_posteriors()
    assert loaded.shape[0] == 100
