"""
Host/device parity for the on-device augmentation ops (ops/resample.py,
ops/augment.py): every batched jittable op must match the per-cut host path
it mirrors to float32 tolerance, and the fused augment→fbank pipeline must
match the sequential host chain end to end.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lhotse_tpu.audio.mixer import AudioMixer
from lhotse_tpu.augmentation.resample import resample_array
from lhotse_tpu.ops import augment as dev
from lhotse_tpu.ops.resample import (
    resampled_num_samples,
    sinc_resample,
    speed_perturb,
)

SR = 16000


def _speechlike(rng, n, f0=120.0):
    t = np.arange(n) / SR
    sig = sum(np.sin(2 * np.pi * f0 * (h + 1) * t) / (h + 1) for h in range(4))
    return (0.2 * sig + 0.01 * rng.standard_normal(n)).astype(np.float32)


class TestSincResample:
    @pytest.mark.parametrize(
        "orig,new",
        [(16000, 8000), (8000, 16000), (17600, 16000), (14400, 16000), (22050, 16000)],
    )
    def test_matches_host_resampler(self, orig, new):
        rng = np.random.default_rng(0)
        x = np.stack([_speechlike(rng, orig), _speechlike(rng, orig, 200.0)])
        host = resample_array(x, orig, new)
        device = np.asarray(sinc_resample(jnp.asarray(x), orig, new))
        assert host.shape == device.shape
        np.testing.assert_allclose(device, host, atol=1e-4)

    def test_output_length_math(self):
        for orig, new, n in [(17600, 16000, 44100), (16000, 8000, 16001), (8000, 16000, 777)]:
            x = np.zeros((1, n), np.float32)
            out = sinc_resample(jnp.asarray(x), orig, new)
            assert out.shape[-1] == resampled_num_samples(n, orig, new)
            # Array form (as used for padded-batch lens inside jit):
            lens = np.array([n, n // 2], np.int64)
            got = resampled_num_samples(lens, orig, new)
            want = [resampled_num_samples(int(v), orig, new) for v in lens]
            np.testing.assert_array_equal(np.asarray(got), want)

    def test_speed_perturb_matches_host_speed(self):
        from lhotse_tpu.augmentation.transforms import Speed

        rng = np.random.default_rng(1)
        x = _speechlike(rng, SR)
        for factor in (0.9, 1.1):
            host = Speed(factor=factor)(x[None, :], SR)
            device = np.asarray(speed_perturb(jnp.asarray(x[None, :]), factor, SR))
            assert host.shape == device.shape
            np.testing.assert_allclose(device, host, atol=1e-4)


class TestMixNoise:
    def test_matches_host_mixer(self):
        rng = np.random.default_rng(2)
        T = SR
        audio = np.stack([_speechlike(rng, T), _speechlike(rng, T, 180.0)])
        noise = 0.05 * rng.standard_normal((2, T // 2)).astype(np.float32)
        snr = np.array([10.0, 18.0], np.float32)
        offsets = np.array([0, 1000], np.int32)

        host = []
        for b in range(2):
            mixer = AudioMixer(audio[b : b + 1], sampling_rate=SR)
            mixer.add_to_mix(
                noise[b : b + 1], snr=float(snr[b]), offset=offsets[b] / SR
            )
            host.append(mixer.mixed_audio[0, :T])
        host = np.stack(host)

        device = np.asarray(
            dev.mix_noise(
                jnp.asarray(audio),
                np.full(2, T),
                jnp.asarray(noise),
                np.full(2, T // 2),
                snr,
                offsets=offsets,
            )
        )
        np.testing.assert_allclose(device, host, atol=1e-5)

    def test_mix_mask_passthrough(self):
        rng = np.random.default_rng(3)
        audio = 0.1 * rng.standard_normal((2, 4000)).astype(np.float32)
        noise = 0.1 * rng.standard_normal((2, 4000)).astype(np.float32)
        out = np.asarray(
            dev.mix_noise(
                audio, [4000, 4000], noise, [4000, 4000],
                snr=10.0, mix_mask=np.array([1.0, 0.0]),
            )
        )
        assert not np.allclose(out[0], audio[0])
        np.testing.assert_allclose(out[1], audio[1], atol=0)

    def test_gatherfree_path_equals_offset_zero(self):
        rng = np.random.default_rng(8)
        audio = 0.1 * rng.standard_normal((3, 5000)).astype(np.float32)
        noise = 0.1 * rng.standard_normal((3, 4000)).astype(np.float32)
        lens = np.array([5000, 4500, 5000])
        nlens = np.array([4000, 3000, 2000])
        fast = np.asarray(dev.mix_noise(audio, lens, noise, nlens, snr=12.0))
        slow = np.asarray(
            dev.mix_noise(
                audio, lens, noise, nlens, snr=12.0, offsets=np.zeros(3, np.int32)
            )
        )
        np.testing.assert_allclose(fast, slow, atol=1e-7)

    def test_zero_energy_noise_gain_is_identity_scale(self):
        audio = np.ones((1, 100), np.float32)
        noise = np.zeros((1, 100), np.float32)
        out = np.asarray(dev.mix_noise(audio, [100], noise, [100], snr=5.0))
        np.testing.assert_allclose(out, audio, atol=0)


def _rir_recording(tmp_path, rng, L=3200):
    """A decaying-noise RIR written as a WAV and loaded back, so host and
    device consume identical (quantized) taps."""
    from lhotse_tpu import Recording
    from lhotse_tpu.audio.wavio import write_wav

    env = np.exp(-np.arange(L) / (L / 6.0))
    taps = (env * rng.standard_normal(L) * 0.5).astype(np.float32)
    taps[L // 50] = 1.0  # a clear peak off t=0 to exercise shift-output
    write_wav(str(tmp_path / "rir.wav"), taps, SR)
    return Recording.from_file(tmp_path / "rir.wav")


class TestReverbRIR:
    @pytest.mark.parametrize("normalize", [True, False])
    def test_matches_host_reverb(self, tmp_path, normalize):
        from lhotse_tpu.augmentation.rir import ReverbWithImpulseResponse

        rng = np.random.default_rng(4)
        rir_rec = _rir_recording(tmp_path, rng)
        taps = rir_rec.load_audio()[0]

        audio = np.stack([_speechlike(rng, SR), _speechlike(rng, SR, 160.0)])
        tfm = ReverbWithImpulseResponse(rir=rir_rec, normalize_output=normalize)
        host = np.stack([tfm(audio[b : b + 1], SR)[0] for b in range(2)])

        device = np.asarray(
            dev.reverb_rir(jnp.asarray(audio), jnp.asarray(taps), normalize=normalize)
        )
        assert host.shape == device.shape
        np.testing.assert_allclose(device, host, atol=2e-5)

    def test_static_peak_path_equals_dynamic(self, tmp_path):
        """Concrete shared numpy RIR (static slice) vs traced RIR (gather)."""
        rng = np.random.default_rng(9)
        taps = _rir_recording(tmp_path, rng, L=1600).load_audio()[0]
        audio = 0.1 * rng.standard_normal((2, 8000)).astype(np.float32)
        static = np.asarray(dev.reverb_rir(audio, taps))
        dynamic = np.asarray(dev.reverb_rir(audio, jnp.asarray(taps)))
        np.testing.assert_allclose(static, dynamic, atol=1e-7)

    def test_batched_rirs_and_lens(self, tmp_path):
        """Per-item RIRs with padding masked by rir_lens must equal two
        independent shared-RIR calls."""
        rng = np.random.default_rng(5)
        r1 = _rir_recording(tmp_path, rng, L=1600).load_audio()[0]
        r2 = _rir_recording(tmp_path, rng, L=800).load_audio()[0]
        audio = 0.1 * rng.standard_normal((2, 8000)).astype(np.float32)

        L = max(len(r1), len(r2))
        rir_batch = np.zeros((2, L), np.float32)
        rir_batch[0, : len(r1)] = r1
        rir_batch[1, : len(r2)] = r2
        batched = np.asarray(
            dev.reverb_rir(audio, rir_batch, rir_lens=[len(r1), len(r2)])
        )
        solo0 = np.asarray(dev.reverb_rir(audio[:1], r1))
        solo1 = np.asarray(dev.reverb_rir(audio[1:], r2))
        np.testing.assert_allclose(batched[0], solo0[0], atol=1e-6)
        np.testing.assert_allclose(batched[1], solo1[0], atol=1e-6)


class TestFusedPipeline:
    def test_matches_sequential_host_chain(self, tmp_path):
        """speed perturb → gain → SNR mix → RIR → fbank, device vs host."""
        from lhotse_tpu.augmentation.rir import ReverbWithImpulseResponse
        from lhotse_tpu.features.kaldi.extractors import Fbank, FbankConfig

        rng = np.random.default_rng(6)
        B, T = 3, SR
        factor = 1.1
        audio = np.stack([_speechlike(rng, T, 100.0 + 40 * b) for b in range(B)])
        gains = rng.uniform(0.8, 1.2, B).astype(np.float32)
        rir_rec = _rir_recording(tmp_path, rng)
        taps = rir_rec.load_audio()[0]
        snr = np.array([8.0, 12.0, 20.0], np.float32)

        Tp = resampled_num_samples(T, round(SR * factor), SR)
        noise = 0.05 * rng.standard_normal((B, Tp)).astype(np.float32)

        # Host chain, per item.
        host_fbank = Fbank(FbankConfig(device="cpu"))
        host_feats = []
        tfm = ReverbWithImpulseResponse(rir=rir_rec, normalize_output=True)
        for b in range(B):
            x = resample_array(audio[b : b + 1], round(SR * factor), SR)
            x = x * gains[b]
            mixer = AudioMixer(x, sampling_rate=SR)
            mixer.add_to_mix(noise[b : b + 1], snr=float(snr[b]))
            x = mixer.mixed_audio[:, : x.shape[1]]
            x = tfm(x, SR)
            host_feats.append(host_fbank.extract(x[0], SR))
        host_feats = np.stack(host_feats)

        # Device chain, one fused program.
        pipe = dev.make_augment_fbank_pipeline(
            sampling_rate=SR, speed_factor=factor
        )
        feats, feat_lens = pipe(
            jnp.asarray(audio),
            np.full(B, T),
            gains=gains,
            noise=jnp.asarray(noise),
            noise_lens=np.full(B, Tp),
            snr=snr,
            rir=jnp.asarray(taps),
        )
        feats = np.asarray(feats)
        assert feats.shape == host_feats.shape, (feats.shape, host_feats.shape)
        np.testing.assert_array_equal(
            np.asarray(feat_lens), np.full(B, host_feats.shape[1])
        )
        diff = np.abs(feats - host_feats)
        assert np.median(diff) < 1e-4
        assert diff.max() < 5e-3, diff.max()

    def test_runs_sharded_over_data_axis(self):
        """The fused program must execute with batch sharded over the 8-device
        CPU mesh (the multichip contract for on-device augmentation)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = np.array(jax.devices()[:8])
        mesh = Mesh(devices.reshape(8), axis_names=("data",))
        B, T = 8, 8000
        rng = np.random.default_rng(7)
        audio = 0.1 * rng.standard_normal((B, T)).astype(np.float32)
        noise = 0.1 * rng.standard_normal((B, T)).astype(np.float32)
        sh = NamedSharding(mesh, P("data"))

        pipe = dev.make_augment_fbank_pipeline(sampling_rate=SR)
        feats, feat_lens = pipe(
            jax.device_put(audio, sh),
            jax.device_put(np.full(B, T), sh),
            gains=jax.device_put(np.ones(B, np.float32), sh),
            noise=jax.device_put(noise, sh),
            noise_lens=jax.device_put(np.full(B, T), sh),
            snr=jax.device_put(np.full(B, 15.0, np.float32), sh),
        )
        assert feats.shape == (B, (T + 80) // 160, 80)
        assert np.isfinite(np.asarray(feats)).all()


class TestDeviceSpecAugment:
    def test_augmenter_specaugment_matches_host_apply(self):
        """OnDeviceAugmenter(specaugment=...) == plain pipeline + host
        apply_specaugment with identically-drawn randomness."""
        from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter
        from lhotse_tpu.dataset.signal_transforms import SpecAugment

        B, UB = 3, 2.0
        T = int(UB * SR)
        rng = np.random.default_rng(11)
        audio = 0.1 * rng.standard_normal((B, T)).astype(np.float32)
        lens = np.full(B, T, np.int64)

        def make(sp):
            return OnDeviceAugmenter(
                [(UB, B)],
                sampling_rate=SR,
                speed_factor=None,
                gain_range=None,
                wire_format="float32",
                seed=0,
                specaugment=sp,
            )

        plain = make(None)
        feats_plain, feat_lens = plain(audio, lens)
        feats_plain = np.asarray(feats_plain)

        # The augmenter draws over the bucket's analytic frame grid with a
        # counter-keyed generator (batch 0 -> batch_rng(0)); replay the
        # identical draw through the same key, then apply on host.
        sp_aug = make(SpecAugment(seed=123))
        feats_dev = np.asarray(sp_aug(audio, lens)[0])

        n_frames = (T + 80) // 160
        warp_src, tmask, fmask = SpecAugment(seed=123).draw_batch(
            B, n_frames, 80, rng=sp_aug.batch_rng(0)
        )
        T_f = feats_plain.shape[1]
        feats_host = dev.apply_specaugment(
            feats_plain, warp_src[:, :T_f].astype(np.float32),
            tmask[:, :T_f], fmask,
        )
        np.testing.assert_allclose(feats_dev, feats_host, rtol=1e-4, atol=1e-4)
        # the masks actually did something
        assert np.abs(feats_dev - feats_plain).max() > 1e-3

    def test_host_transform_unchanged_rng_stream(self):
        """SpecAugment.__call__ draws through draw_batch — same stream as
        before the refactor (warp differs from identity, masks non-empty)."""
        from lhotse_tpu.dataset.signal_transforms import SpecAugment

        rng = np.random.default_rng(5)
        feats = rng.standard_normal((2, 300, 80)).astype(np.float32)
        sp = SpecAugment(seed=7, p=1.0)
        out = np.asarray(sp(feats))
        assert out.shape == feats.shape
        assert np.abs(out - feats).max() > 1e-3
