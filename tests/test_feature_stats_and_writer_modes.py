"""
Global feature statistics (streaming Chan/Golub/LeVeque accumulator) and
feature-writer append/overwrite modes (reference surface:
test/features/test_writer_append.py, lhotse/features/base.py:957-1032).
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank
from lhotse_tpu.features.base import StatsAccumulator, compute_global_stats
from lhotse_tpu.features.io import LilcomChunkyReader, LilcomChunkyWriter
from lhotse_tpu.testing.fixtures import RandomCutTestCase

SR = 16000


class TestStatsAccumulator:
    def test_matches_direct_computation(self):
        rng = np.random.RandomState(0)
        chunks = [rng.randn(rng.randint(50, 200), 23) * (i + 1) for i in range(7)]
        acc = StatsAccumulator(feature_dim=23)
        for c in chunks:
            acc.update(c)
        stats = acc.get()
        all_feats = np.concatenate(chunks, axis=0)
        np.testing.assert_allclose(stats["norm_means"], all_feats.mean(0), rtol=1e-10)
        np.testing.assert_allclose(stats["norm_stds"], all_feats.std(0), rtol=1e-6)

    def test_single_frame_updates(self):
        rng = np.random.RandomState(1)
        rows = rng.randn(40, 8)
        acc = StatsAccumulator(feature_dim=8)
        for r in rows:
            acc.update(r[None, :])
        stats = acc.get()
        np.testing.assert_allclose(stats["norm_means"], rows.mean(0), rtol=1e-10)
        np.testing.assert_allclose(stats["norm_stds"], rows.std(0), rtol=1e-6)


class TestGlobalStatsOverCuts(RandomCutTestCase):
    def test_cutset_global_stats(self, tmp_path):
        cuts = CutSet.from_cuts(
            [self.with_cut(sampling_rate=SR, num_samples=SR) for _ in range(3)]
        )
        stats = cuts.compute_global_feature_stats(
            storage_path=tmp_path / "stats.pkl"
        )
        assert stats["norm_means"].shape == (cuts[0].num_features,)
        assert (stats["norm_stds"] > 0).all()
        direct = np.concatenate([c.load_features() for c in cuts], axis=0)
        np.testing.assert_allclose(stats["norm_means"], direct.mean(0), atol=1e-4)
        np.testing.assert_allclose(stats["norm_stds"], direct.std(0), atol=1e-4)
        # The stats file is reloadable (pickled dict, reference semantics).
        import pickle

        loaded = pickle.loads((tmp_path / "stats.pkl").read_bytes())
        np.testing.assert_allclose(loaded["norm_means"], stats["norm_means"])

    def test_helper_matches_method(self, tmp_path):
        cuts = CutSet.from_cuts(
            [self.with_cut(sampling_rate=SR, num_samples=SR) for _ in range(2)]
        )
        a = cuts.compute_global_feature_stats()
        b = compute_global_stats(feature_manifests=(c.features for c in cuts))
        np.testing.assert_allclose(a["norm_means"], b["norm_means"], atol=1e-6)


class TestWriterModes:
    def _write(self, path, arrays, mode):
        keys = []
        with LilcomChunkyWriter(path, mode=mode) as w:
            for i, a in enumerate(arrays):
                keys.append(w.write(f"k{i}", a))
        return keys

    def test_overwrite_mode_truncates(self, tmp_path):
        rng = np.random.RandomState(2)
        path = tmp_path / "feats.lca"
        a1 = rng.randn(120, 40).astype(np.float32)
        self._write(path, [a1], "wb")
        size1 = path.stat().st_size
        a2 = rng.randn(60, 40).astype(np.float32)
        (k2,) = self._write(path, [a2], "wb")
        assert path.stat().st_size < size1
        got = LilcomChunkyReader(path).read(k2)
        np.testing.assert_allclose(got, a2, atol=2**-5)

    def test_append_mode_preserves_existing(self, tmp_path):
        rng = np.random.RandomState(3)
        path = tmp_path / "feats.lca"
        a1 = rng.randn(100, 40).astype(np.float32)
        (k1,) = self._write(path, [a1], "wb")
        a2 = rng.randn(80, 40).astype(np.float32)
        (k2,) = self._write(path, [a2], "ab")
        reader = LilcomChunkyReader(path)
        np.testing.assert_allclose(reader.read(k1), a1, atol=2**-5)
        np.testing.assert_allclose(reader.read(k2), a2, atol=2**-5)

    def test_append_keys_encode_absolute_offsets(self, tmp_path):
        rng = np.random.RandomState(4)
        path = tmp_path / "feats.lca"
        (k1,) = self._write(path, [rng.randn(50, 8).astype(np.float32)], "wb")
        (k2,) = self._write(path, [rng.randn(50, 8).astype(np.float32)], "ab")
        # Keys are comma-separated byte offsets; the appended key must start
        # past the first record's data.
        start1 = int(k1.split(",")[0])
        start2 = int(k2.split(",")[0])
        assert start1 == 0 and start2 > 0
