"""
manipulation.py (combine / split_parallelize_combine / to_manifest) and
workarounds.py (AltGzipFile trailing-garbage tolerance, Hdf5MemoryIssueFix
counter) — previously untested directly.
"""
import gzip

import numpy as np
import pytest

from lhotse_tpu import CutSet, RecordingSet, SupervisionSet
from lhotse_tpu.manipulation import combine, split_parallelize_combine, to_manifest
from lhotse_tpu.testing.dummies import (
    DummyManifest,
    dummy_cut,
    dummy_recording,
    dummy_supervision,
)
from lhotse_tpu.workarounds import AltGzipFile, Hdf5MemoryIssueFix, gzip_open_robust


class TestCombine:
    def test_varargs(self):
        a = DummyManifest(RecordingSet, begin_id=0, end_id=3)
        b = DummyManifest(RecordingSet, begin_id=3, end_id=5)
        c = combine(a, b)
        assert len(c) == 5

    def test_single_list(self):
        parts = [DummyManifest(CutSet, begin_id=i * 2, end_id=i * 2 + 2) for i in range(3)]
        assert len(combine(parts)) == 6


def _ids_upper(cuts):
    """Module-level (picklable) transform for the process pool."""
    return cuts.modify_ids(str.upper)


class TestSplitParallelizeCombine:
    def test_roundtrip_preserves_items(self):
        cuts = DummyManifest(CutSet, begin_id=0, end_id=8)
        out = split_parallelize_combine(2, cuts, _ids_upper)
        assert len(out) == 8
        assert sorted(c.id for c in out) == sorted(c.id.upper() for c in cuts)


class TestToManifest:
    def test_builds_right_set_types(self):
        assert isinstance(to_manifest([dummy_recording(0)]), RecordingSet)
        assert isinstance(to_manifest([dummy_supervision(0)]), SupervisionSet)
        assert isinstance(to_manifest([dummy_cut(0)]), CutSet)
        assert to_manifest([]) is None

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError):
            to_manifest([object()])


class TestAltGzipFile:
    def _payload_with_garbage(self, data: bytes) -> bytes:
        return gzip.compress(data) + b"TRAILING GARBAGE BYTES"

    def test_tolerates_trailing_garbage(self, tmp_path):
        data = b"hello gzip world\n" * 100
        path = tmp_path / "x.gz"
        path.write_bytes(self._payload_with_garbage(data))
        # Plain gzip chokes on the garbage...
        with pytest.raises(Exception):
            with gzip.open(path, "rb") as f:
                f.read()
        # ...AltGzipFile returns the valid payload.
        with AltGzipFile(path, "rb") as f:
            assert f.read() == data

    def test_gzip_open_robust_text_mode(self, tmp_path):
        data = "line1\nline2\n"
        path = tmp_path / "y.gz"
        path.write_bytes(self._payload_with_garbage(data.encode()))
        with gzip_open_robust(path, "rt") as f:
            assert f.read() == data

    def test_intact_file_reads_normally(self, tmp_path):
        data = b"intact"
        path = tmp_path / "z.gz"
        path.write_bytes(gzip.compress(data))
        with AltGzipFile(path, "rb") as f:
            assert f.read() == data

    def test_real_corruption_still_raises(self, tmp_path):
        path = tmp_path / "bad.gz"
        blob = bytearray(gzip.compress(b"payload" * 50))
        blob[15] ^= 0xFF  # corrupt inside the deflate stream
        path.write_bytes(bytes(blob))
        with pytest.raises(Exception):
            with AltGzipFile(path, "rb") as f:
                f.read()


class TestHdf5MemoryIssueFix:
    def test_counter_resets_at_interval(self, monkeypatch):
        calls = []
        import lhotse_tpu.features.io as fio

        monkeypatch.setattr(fio, "close_cached_file_handles", lambda: calls.append(1))
        fix = Hdf5MemoryIssueFix(reset_interval=3)
        for _ in range(7):
            fix.update()
        assert len(calls) == 2  # at updates 4 and 7
