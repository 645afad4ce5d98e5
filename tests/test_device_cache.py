"""
DeviceSampleCache: HBM-resident audio across epochs (dataset/device_cache.py).

Covers: miss→insert→hit lifecycle, feature parity of the cached gather path
vs the plain wire path (same RNG stream), decode skipping via
CacheAwareAudioSamples, ring eviction, bucket-purity fallbacks, and the
end-to-end two-epoch loader drive.
"""
import numpy as np
import pytest

from lhotse_tpu.dataset.device_augment import CachedBatch, OnDeviceAugmenter, StagedBatch
from lhotse_tpu.dataset.device_cache import (
    CacheAwareAudioSamples,
    DeviceSampleCache,
    batch_cut_info,
)

SR = 16000
BUCKETS = [(2.0, 4), (4.0, 3)]


def make_aug(cache, seed=3, **kw):
    noise = (np.random.RandomState(1).randn(2, 5 * SR) * 0.05).astype(np.float32)
    rir = np.zeros(400, np.float32)
    rir[5] = 1.0
    rir[99] = 0.25
    defaults = dict(
        sampling_rate=SR,
        speed_factor=1.1,
        gain_range=(0.9, 1.1),
        noise_pool=noise,
        snr=(10, 20),
        mix_prob=1.0,
        rir=rir,
        wire_format="int16",
        seed=seed,
        sample_cache=cache,
    )
    defaults.update(kw)
    return OnDeviceAugmenter(BUCKETS, **defaults)


def batch(rng, n, dur_s):
    lens = rng.randint(int(0.5 * dur_s * SR), int(dur_s * SR) + 1, size=n)
    audio = np.zeros((n, lens.max()), np.float32)
    for i, l in enumerate(lens):
        audio[i, :l] = rng.randn(l) * 0.1
    return audio, lens.astype(np.int64)


class TestCacheLifecycle:
    def test_miss_then_hit(self):
        cache = DeviceSampleCache(capacity_seconds=60)
        aug = make_aug(cache)
        rng = np.random.RandomState(0)
        audio, lens = batch(rng, 3, 1.9)
        ids = ["a", "b", "c"]

        s1 = aug.stage(audio, lens, ids=ids)
        assert isinstance(s1, StagedBatch) and s1.insert_slots is not None
        aug.compute(s1)  # insert happens here
        assert cache.has_all(ids, s1.bucket_t)

        s2 = aug.stage(audio, lens, ids=ids)
        assert isinstance(s2, CachedBatch)
        assert cache.stats()["hit_rate"] > 0

    def test_cached_features_match_wire_path(self):
        """Same RNG stream + same audio: gather path == transfer path on the
        real (non-padding) rows."""
        cache = DeviceSampleCache(capacity_seconds=60)
        aug_c = make_aug(cache, seed=7)
        aug_p = make_aug(None, seed=7)
        rng = np.random.RandomState(2)
        audio, lens = batch(rng, 3, 1.8)
        ids = ["x", "y", "z"]

        # epoch 1: both augmenters see the batch (cache inserts).
        f1c, l1c = (np.asarray(a) for a in aug_c.compute(aug_c.stage(audio, lens, ids=ids)))
        f1p, l1p = (np.asarray(a) for a in aug_p.compute(aug_p.stage(audio, lens)))
        np.testing.assert_array_equal(l1c, l1p)
        np.testing.assert_allclose(f1c, f1p, atol=1e-5)

        # epoch 2: cached gather vs fresh transfer — identical draws, and the
        # pool holds the exact int16 rows the wire carried.
        staged = aug_c.stage(audio, lens, ids=ids)
        assert isinstance(staged, CachedBatch)
        f2c, l2c = (np.asarray(a) for a in aug_c.compute(staged))
        f2p, l2p = (np.asarray(a) for a in aug_p.compute(aug_p.stage(audio, lens)))
        np.testing.assert_array_equal(l2c, l2p)
        real = l2c > 0
        np.testing.assert_allclose(f2c[real], f2p[real], atol=1e-5)

    def test_cached_path_with_adpcm4_wire(self):
        """adpcm4 pools hold the NARROW wire rows (headers + packed
        nibbles), not T_b samples — gather path must still match the
        transfer path bit-for-bit on real rows."""
        cache = DeviceSampleCache(capacity_seconds=60)
        aug_c = make_aug(cache, seed=11, wire_format="adpcm4")
        aug_p = make_aug(None, seed=11, wire_format="adpcm4")
        rng = np.random.RandomState(5)
        audio, lens = batch(rng, 3, 1.8)
        ids = ["p", "q", "r"]

        aug_c.compute(aug_c.stage(audio, lens, ids=ids))  # fill
        aug_p.compute(aug_p.stage(audio, lens))  # burn the same RNG draws
        staged = aug_c.stage(audio, lens, ids=ids)
        assert isinstance(staged, CachedBatch)
        from lhotse_tpu.ops.wire import wire_row_width

        pool = cache.pool(staged.bucket_t, np.uint8)
        assert pool.shape[1] == wire_row_width(staged.bucket_t, "adpcm4")
        f2c, l2c = (np.asarray(a) for a in aug_c.compute(staged))
        f2p, l2p = (np.asarray(a) for a in aug_p.compute(aug_p.stage(audio, lens)))
        np.testing.assert_array_equal(l2c, l2p)
        real = l2c > 0
        np.testing.assert_allclose(f2c[real], f2p[real], atol=1e-5)

    def test_ring_eviction_reverts_to_miss(self):
        # Pool sized to ~4 slots for the 2 s bucket.
        cache = DeviceSampleCache(capacity_seconds=2 * 2 * 4.0, min_slots=4)
        aug = make_aug(cache)
        rng = np.random.RandomState(4)
        a1, l1 = batch(rng, 3, 1.5)
        a2, l2 = batch(rng, 3, 1.5)
        aug.compute(aug.stage(a1, l1, ids=["a", "b", "c"]))
        aug.compute(aug.stage(a2, l2, ids=["d", "e", "f"]))  # evicts a..c
        t_b = aug.bucket_shape(a1.shape[1])[0]
        assert not cache.has_all(["a", "b", "c"], t_b)
        assert cache.has_all(["d", "e", "f"], t_b)
        # Evicted ids re-stage as a miss (correctness over residency).
        assert isinstance(aug.stage(a1, l1, ids=["a", "b", "c"]), StagedBatch)

    def test_partial_residency_is_a_miss(self):
        cache = DeviceSampleCache(capacity_seconds=60)
        aug = make_aug(cache)
        rng = np.random.RandomState(5)
        audio, lens = batch(rng, 2, 1.5)
        aug.compute(aug.stage(audio, lens, ids=["p", "q"]))
        a2, len2 = batch(rng, 3, 1.5)
        staged = aug.stage(a2, len2, ids=["p", "q", "NEW"])
        assert isinstance(staged, StagedBatch)
        aug.compute(staged)
        assert cache.has_all(["p", "q", "NEW"], staged.bucket_t)

    def test_other_bucket_is_a_miss(self):
        cache = DeviceSampleCache(capacity_seconds=60)
        aug = make_aug(cache)
        rng = np.random.RandomState(6)
        audio, lens = batch(rng, 2, 1.5)  # 2 s bucket
        aug.compute(aug.stage(audio, lens, ids=["m", "n"]))
        long_audio = np.pad(audio, ((0, 0), (0, 3 * SR - audio.shape[1])))
        long_lens = np.full(2, 3 * SR, np.int64)  # 4 s bucket
        assert isinstance(
            aug.stage(long_audio, long_lens, ids=["m", "n"]), StagedBatch
        )

    def test_zero_width_placeholder_without_residency_raises(self):
        cache = DeviceSampleCache(capacity_seconds=60)
        aug = make_aug(cache)
        with pytest.raises(ValueError, match="zero-width"):
            aug.stage(
                np.zeros((2, 0), np.float32),
                np.full(2, SR, np.int64),
                ids=["nope1", "nope2"],
            )

    def test_precompile_warms_both_paths(self):
        cache = DeviceSampleCache(capacity_seconds=120)
        aug = make_aug(cache)
        aug.precompile()
        assert cache.stats()["misses"] > 0 and cache.stats()["hits"] > 0


class TestEndToEndTwoEpochs:
    def test_loader_drive_epoch2_skips_decode_and_wire(self, tmp_path):
        from lhotse_tpu import CutSet, Recording, SupervisionSegment
        from lhotse_tpu.audio.wavio import write_wav
        from lhotse_tpu.dataset.loader import DataLoader
        from lhotse_tpu.dataset.sampling.dynamic_bucketing import (
            DynamicBucketingSampler,
        )
        from lhotse_tpu.dataset.speech_recognition import (
            K2SpeechRecognitionDataset,
        )

        rng = np.random.RandomState(11)
        cuts = []
        for i in range(8):
            dur = float(rng.uniform(1.0, 3.8))
            n = int(SR * dur)
            write_wav(
                str(tmp_path / f"u{i}.wav"),
                (rng.randn(n) * 0.1).astype(np.float32),
                SR,
            )
            c = Recording.from_file(tmp_path / f"u{i}.wav").to_cut()
            c.supervisions.append(
                SupervisionSegment(
                    id=f"s{i}",
                    recording_id=c.recording_id,
                    start=0.0,
                    duration=c.duration,
                    text="t",
                )
            )
            cuts.append(c)
        cs = CutSet.from_cuts(cuts)

        cache = DeviceSampleCache(capacity_seconds=120)
        aug = make_aug(cache)
        dataset = K2SpeechRecognitionDataset(
            return_cuts=True, input_strategy=CacheAwareAudioSamples(aug)
        )

        def stage_fn(b):
            ids, lens = batch_cut_info(b)
            placeholder = b["inputs"].shape[1] == 0
            return aug.stage(b["inputs"], lens, ids=ids), placeholder

        def run_epoch():
            sampler = DynamicBucketingSampler(
                cs,
                max_duration=8.0,
                duration_bins=[2.0],
                buffer_size=16,
                shuffle=True,
                seed=0,
                world_size=1,
                rank=0,
            )
            out = []
            for staged, placeholder in DataLoader(
                sampler, dataset, prefetch_batches=2, apply_fn=stage_fn
            ):
                feats, lens = aug.compute(staged)
                out.append(
                    (placeholder, isinstance(staged, CachedBatch), np.asarray(feats))
                )
            return out

        e1 = run_epoch()
        assert all(not placeholder and not cached for placeholder, cached, _ in e1)
        e2 = run_epoch()
        assert all(placeholder and cached for placeholder, cached, _ in e2)
        assert all(np.isfinite(f).all() for _, _, f in e1 + e2)
        assert cache.stats()["resident_items"] == 8
