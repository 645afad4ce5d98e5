"""Wire formats for host->device audio transfer (ops/wire.py)."""
import numpy as np
import pytest

from lhotse_tpu.ops.wire import (
    ADPCM_BLOCK as ADPCM_BLOCK_LEN,
    WIRE_FORMATS,
    decode_wire,
    encode_wire,
    wire_bytes_per_sample,
)

SR = 16000


def _speech(seconds=1.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * seconds)) / SR
    x = 0.4 * np.sin(2 * np.pi * 180 * t) * (1 + 0.4 * np.sin(2 * np.pi * 2 * t))
    return (x + 0.01 * rng.randn(len(t))).astype(np.float32)


def _snr_db(clean, noisy):
    err = clean - noisy
    return 10 * np.log10(np.sum(clean**2) / max(np.sum(err**2), 1e-20))


class TestWireRoundtrip:
    def test_float32_is_lossless(self):
        x = _speech()
        y = np.asarray(decode_wire(encode_wire(x, "float32"), "float32"))
        np.testing.assert_array_equal(x, y)

    def test_int16_snr(self):
        x = _speech()
        enc = encode_wire(x, "int16")
        assert enc.dtype == np.int16
        y = np.asarray(decode_wire(enc, "int16"))
        assert _snr_db(x, y) > 80.0

    def test_mulaw_snr_and_dtype(self):
        x = _speech()
        enc = encode_wire(x, "mulaw")
        assert enc.dtype == np.uint8
        y = np.asarray(decode_wire(enc, "mulaw"))
        snr = _snr_db(x, y)
        assert 30.0 < snr, snr  # G.711-class companding on speech

    def test_mulaw_zero_maps_near_zero(self):
        z = np.zeros(16, np.float32)
        y = np.asarray(decode_wire(encode_wire(z, "mulaw"), "mulaw"))
        assert np.abs(y).max() < 1e-2

    def test_mulaw_clips_out_of_range(self):
        x = np.array([-2.0, 2.0], np.float32)
        y = np.asarray(decode_wire(encode_wire(x, "mulaw"), "mulaw"))
        np.testing.assert_allclose(y, [-1.0, 1.0], atol=1e-2)

    def test_adpcm4_snr_and_dtype(self):
        x = _speech()  # 16000 samples = 250 blocks
        enc = encode_wire(x, "adpcm4")
        assert enc.dtype == np.uint8
        assert enc.shape[-1] == 16000 // 2 + 250 * 4
        y = np.asarray(decode_wire(enc, "adpcm4"))
        assert y.shape == x.shape
        snr = _snr_db(x, y)
        assert 25.0 < snr, snr  # 4-bit ADPCM class on speech

    def test_adpcm4_device_decode_matches_host_mirror_exactly(self):
        import jax

        from lhotse_tpu.ops.wire import adpcm4_decode_np

        x = np.stack([_speech(seed=7), _speech(seed=8) * 0.05])
        enc = encode_wire(x, "adpcm4")
        dev = np.asarray(jax.jit(lambda w: decode_wire(w, "adpcm4"))(enc))
        host = adpcm4_decode_np(enc)
        # Pure int32 arithmetic on both sides: bit-exact, not just close.
        np.testing.assert_array_equal(dev, host)

    def test_adpcm4_blocks_are_independent(self):
        # Corrupting one block must not affect any other block's samples.
        from lhotse_tpu.ops.wire import ADPCM_BLOCK, adpcm4_decode_np

        x = _speech()
        enc = encode_wire(x, "adpcm4")
        bad = enc.copy()
        nb = len(x) // ADPCM_BLOCK
        # Smash block 10's header and nibbles.
        bad[10 * 4 : 11 * 4] = 0xFF
        start = nb * 4 + 10 * ADPCM_BLOCK // 2
        bad[start : start + ADPCM_BLOCK // 2] = 0xAA
        good = adpcm4_decode_np(enc)
        corrupted = adpcm4_decode_np(bad)
        sl = slice(10 * ADPCM_BLOCK, 11 * ADPCM_BLOCK)
        assert not np.array_equal(good[sl], corrupted[sl])
        mask = np.ones(len(x), bool)
        mask[sl] = False
        np.testing.assert_array_equal(good[mask], corrupted[mask])

    def test_adpcm4_zero_stays_quiet(self):
        z = np.zeros(ADPCM_BLOCK_LEN * 2, np.float32)
        y = np.asarray(decode_wire(encode_wire(z, "adpcm4"), "adpcm4"))
        assert np.abs(y).max() < 1e-3  # min step leakage only

    def test_adpcm4_requires_block_multiple(self):
        with pytest.raises(ValueError, match="block"):
            encode_wire(np.zeros(100, np.float32), "adpcm4")

    def test_bytes_per_sample(self):
        assert [wire_bytes_per_sample(f) for f in WIRE_FORMATS] == [
            4, 2, 1, 0.5625,
        ]

    def test_row_width(self):
        from lhotse_tpu.ops.wire import wire_row_width

        assert wire_row_width(16000, "int16") == 16000
        assert wire_row_width(16000, "mulaw") == 16000
        assert wire_row_width(16000, "adpcm4") == 9000

    def test_unknown_format_raises(self):
        with pytest.raises(ValueError):
            encode_wire(np.zeros(4, np.float32), "int8")
        with pytest.raises(ValueError):
            decode_wire(np.zeros(4, np.float32), "int8")


class TestAugmenterWireFormats:
    @pytest.mark.parametrize("fmt", ["float32", "int16", "mulaw", "adpcm4"])
    def test_pipeline_runs_all_formats(self, fmt):
        from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter

        aug = OnDeviceAugmenter(
            [(1.0, 2)], gain_range=None, wire_format=fmt
        )
        x = np.stack([_speech(seed=1), _speech(seed=2)])
        feats, lens = aug(x, [SR, SR])
        assert np.isfinite(np.asarray(feats)).all()

    def test_int16_wire_fbank_close_to_float32(self):
        from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter

        x = np.stack([_speech(seed=3), _speech(seed=4)])
        f32 = OnDeviceAugmenter([(1.0, 2)], gain_range=None, wire_format="float32")
        i16 = OnDeviceAugmenter([(1.0, 2)], gain_range=None, wire_format="int16")
        a, _ = f32(x, [SR, SR])
        b, _ = i16(x, [SR, SR])
        # int16 quantization noise sits ~-96 dBFS: log amplifies it only in
        # near-silent frames (max ~0.04); typical frames are untouched.
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert np.median(diff) < 1e-3
        assert diff.max() < 0.1

    def test_mulaw_wire_is_lossy_but_sane(self):
        from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter

        x = np.stack([_speech(seed=5), _speech(seed=6)])
        f32 = OnDeviceAugmenter([(1.0, 2)], gain_range=None, wire_format="float32")
        mu = OnDeviceAugmenter([(1.0, 2)], gain_range=None, wire_format="mulaw")
        a = np.asarray(f32(x, [SR, SR])[0])
        b = np.asarray(mu(x, [SR, SR])[0])
        diff = np.abs(a - b)
        assert diff.max() > 1e-2  # genuinely lossy...
        assert np.median(diff) < 0.5  # ...but the features stay in class

    def test_invalid_wire_format_rejected(self):
        from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter

        with pytest.raises(ValueError, match="wire_format"):
            OnDeviceAugmenter([(1.0, 2)], wire_format="pcm24")
