"""OnDeviceAugmenter: the packaged device-side augment->fbank stage."""
import numpy as np
import pytest

from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter

SR = 16000
BUCKETS = [(1.0, 4), (2.0, 3)]


def _audio(b, t, seed=0):
    rng = np.random.RandomState(seed)
    return (0.1 * rng.randn(b, t)).astype(np.float32)


class TestOnDeviceAugmenter:
    def test_bucket_selection(self):
        aug = OnDeviceAugmenter(BUCKETS, sampling_rate=SR)
        assert aug.bucket_shape(SR // 2) == (SR, 4)
        assert aug.bucket_shape(SR) == (SR, 4)
        assert aug.bucket_shape(SR + 1) == (2 * SR, 3)
        assert aug.bucket_shape(5 * SR) == (2 * SR, 3)  # overflow -> largest

    def test_fbank_only_chain(self):
        aug = OnDeviceAugmenter(BUCKETS, gain_range=None)
        feats, feat_lens = aug(_audio(3, 12000), [12000, 8000, 12000])
        feats = np.asarray(feats)
        assert feats.shape == (4, (SR + 80) // 160, 80)
        np.testing.assert_array_equal(
            np.asarray(feat_lens), [(12000 + 80) // 160, (8000 + 80) // 160,
                                    (12000 + 80) // 160, 0]
        )
        assert np.isfinite(feats).all()

    def test_full_chain_runs(self):
        rng = np.random.RandomState(1)
        noise = (0.05 * rng.randn(3, SR)).astype(np.float32)
        rir = np.exp(-np.arange(800) / 100).astype(np.float32) * 0.1
        rir[5] = 1.0
        aug = OnDeviceAugmenter(
            BUCKETS,
            speed_factor=1.1,
            noise_pool=noise,
            rir=rir,
            mix_prob=1.0,
            seed=3,
        )
        feats, feat_lens = aug(_audio(4, SR), [SR] * 4)
        feats = np.asarray(feats)
        # Speed 1.1 shortens: ceil(10/11 * 16000) samples -> frame count.
        t_p = (16000 * 10 + 10) // 11
        assert feats.shape[1] == (t_p + 80) // 160
        assert np.isfinite(feats).all()
        assert (np.asarray(feat_lens) > 0).all()

    def test_matches_plain_fbank_when_no_augment(self):
        from lhotse_tpu.features.kaldi.layers import Wav2LogFilterBank

        aug = OnDeviceAugmenter(BUCKETS, gain_range=None)
        x = _audio(2, SR, seed=5)
        feats, _ = aug(x, [SR, SR])
        direct = np.asarray(Wav2LogFilterBank(sampling_rate=SR)(x))
        # Same layer, different XLA fusion contexts: f32 noise only.
        np.testing.assert_allclose(np.asarray(feats)[:2], direct, atol=5e-4)

    def test_int16_input_accepted(self):
        aug = OnDeviceAugmenter(BUCKETS, gain_range=None)
        x = (np.clip(_audio(2, SR, seed=6), -1, 1) * 32767).astype(np.int16)
        feats, _ = aug(x, [SR, SR])
        assert np.isfinite(np.asarray(feats)).all()

    def test_precompile_covers_every_bucket(self):
        aug = OnDeviceAugmenter(BUCKETS, gain_range=(0.9, 1.1))
        aug.precompile()
        # Subsequent calls reuse the compiled programs (smoke: no errors,
        # right shapes for each bucket).
        for (ub, bsz) in BUCKETS:
            t = int(ub * SR)
            feats, _ = aug(_audio(bsz, t, seed=7), [t] * bsz)
            assert np.asarray(feats).shape[0] == bsz

    def test_mix_prob_zero_is_noise_free(self):
        rng = np.random.RandomState(8)
        noise = (10.0 * rng.randn(2, SR)).astype(np.float32)  # loud on purpose
        base = OnDeviceAugmenter(BUCKETS, gain_range=None)
        noisy = OnDeviceAugmenter(
            BUCKETS, gain_range=None, noise_pool=noise, mix_prob=0.0, seed=9
        )
        x = _audio(2, SR, seed=9)
        a, _ = base(x, [SR, SR])
        b, _ = noisy(x, [SR, SR])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
