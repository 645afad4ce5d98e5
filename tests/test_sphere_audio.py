"""Native NIST SPHERE codec tests (lhotse_tpu/audio/sphio.py).

Uses the reference test fixture `/root/reference/test/fixtures/stereo.sph`
(plain 16-bit PCM, same audio as stereo.wav) as a real-world oracle, plus
round-trip tests for the ulaw/alaw codings. The reference framework can only
open these through the external ``sph2pipe`` binary (absent in this env);
here they decode natively.
"""
import io
from pathlib import Path

import numpy as np
import pytest

from lhotse_tpu import Recording
from lhotse_tpu.audio.backend import SphereBackend
from lhotse_tpu.audio.sphio import (
    SphereFormatError,
    SphereShortenError,
    _alaw_encode,
    _ulaw_encode,
    _ALAW_TABLE,
    _ULAW_TABLE,
    info_sph,
    read_sph,
    write_sph,
)
from lhotse_tpu.audio.wavio import read_wav

FIXTURES = Path("/root/reference/test/fixtures")
STEREO_SPH = FIXTURES / "stereo.sph"
STEREO_WAV = FIXTURES / "stereo.wav"

pytestmark = pytest.mark.skipif(
    not STEREO_SPH.exists(), reason="reference fixtures not mounted")


class TestRealFixture:
    def test_info(self):
        hdr = info_sph(STEREO_SPH)
        assert hdr.num_channels == 2
        assert hdr.sampling_rate == 8000
        assert hdr.sample_count == 8000
        assert hdr.coding == "pcm"
        assert hdr.duration == pytest.approx(1.0)

    def test_decode_matches_wav_twin(self):
        sph, sr_s = read_sph(STEREO_SPH)
        with open(STEREO_WAV, "rb") as f:
            wav, sr_w = read_wav(f)
        assert sr_s == sr_w
        assert sph.shape == wav.shape == (2, 8000)
        np.testing.assert_array_equal(sph, wav)

    def test_partial_read_matches_slice(self):
        full, sr = read_sph(STEREO_SPH)
        part, _ = read_sph(STEREO_SPH, frame_offset=1000, num_frames=2000)
        np.testing.assert_array_equal(part, full[:, 1000:3000])

    def test_partial_read_clamps_at_end(self):
        part, _ = read_sph(STEREO_SPH, frame_offset=7000, num_frames=5000)
        assert part.shape == (2, 1000)

    def test_file_object_input(self):
        with open(STEREO_SPH, "rb") as f:
            data = f.read()
        samples, sr = read_sph(io.BytesIO(data))
        assert samples.shape == (2, 8000)

    def test_recording_from_sph(self):
        r = Recording.from_file(STEREO_SPH)
        assert r.num_channels == 2
        assert r.sampling_rate == 8000
        assert r.duration == pytest.approx(1.0)
        audio = r.load_audio()
        assert audio.shape == (2, 8000)
        chunk = r.load_audio(offset=0.25, duration=0.5)
        np.testing.assert_array_equal(chunk, audio[:, 2000:6000])


class TestWriteReadRoundtrip:
    @pytest.mark.parametrize("channels", [1, 2])
    def test_pcm16(self, tmp_path, channels):
        rng = np.random.default_rng(0)
        x = np.clip(0.3 * rng.standard_normal((channels, 4000)), -0.99, 0.99).astype(np.float32)
        p = tmp_path / "t.sph"
        write_sph(p, x, 16000)
        y, sr = read_sph(p)
        assert sr == 16000
        np.testing.assert_allclose(y, x, atol=1.0 / 32768)

    def test_pcm16_big_endian(self, tmp_path):
        rng = np.random.default_rng(1)
        x = np.clip(0.3 * rng.standard_normal((1, 1000)), -0.99, 0.99).astype(np.float32)
        p = tmp_path / "be.sph"
        write_sph(p, x, 8000, big_endian=True)
        hdr = info_sph(p)
        assert hdr.big_endian
        y, _ = read_sph(p)
        np.testing.assert_allclose(y, x, atol=1.0 / 32768)

    @pytest.mark.parametrize("coding,tol", [("ulaw", 0.033), ("alaw", 0.033)])
    def test_companded(self, tmp_path, coding, tol):
        # G.711 is logarithmic: relative error ~3-4%, tiny absolute error
        # near zero. A moderate-level sine keeps both bounded.
        t = np.arange(8000, dtype=np.float32) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)[None, :]
        p = tmp_path / f"{coding}.sph"
        write_sph(p, x, 8000, coding=coding)
        hdr = info_sph(p)
        assert hdr.coding == coding and hdr.sample_n_bytes == 1
        y, _ = read_sph(p)
        assert y.shape == x.shape
        assert np.max(np.abs(y - x)) < tol
        # SNR sanity: companded speech-band audio should stay above ~30 dB.
        snr = 10 * np.log10(np.sum(x**2) / np.sum((y - x) ** 2))
        assert snr > 30.0

    def test_partial_read_of_ulaw(self, tmp_path):
        rng = np.random.default_rng(2)
        x = (0.3 * rng.standard_normal((2, 3000))).astype(np.float32)
        p = tmp_path / "u.sph"
        write_sph(p, x, 8000, coding="ulaw")
        full, _ = read_sph(p)
        part, _ = read_sph(p, frame_offset=500, num_frames=1000)
        np.testing.assert_array_equal(part, full[:, 500:1500])


class TestCompandingTables:
    def test_ulaw_codec_is_exact_inverse_on_table(self):
        # Encoding each decoded table value must reproduce the code.
        codes = np.arange(256, dtype=np.uint8)
        recoded = _ulaw_encode(_ULAW_TABLE[codes])
        # 0x7F/0xFF both decode to 0 -> re-encode maps to the +0 code.
        ambiguous = np.isin(codes, [0x7F, 0xFF])
        np.testing.assert_array_equal(recoded[~ambiguous], codes[~ambiguous])

    def test_ulaw_extremes(self):
        # 16-bit-scale table (same convention as sph2pipe/sox): full-scale
        # code 0x00 is the negative extreme, 0x80 the positive; 0x7F and
        # 0xFF both decode to digital zero.
        assert _ULAW_TABLE[0x00] == -32124
        assert _ULAW_TABLE[0x80] == 32124
        assert _ULAW_TABLE[0x7F] == 0
        assert _ULAW_TABLE[0xFF] == 0

    def test_alaw_monotone_by_segment(self):
        # Within each positive-sign chord the decoded magnitudes increase.
        vals = _ALAW_TABLE[np.array([0xD5 ^ 0x80, 0xD5, 0x55])]
        assert vals[1] != vals[0]


class TestErrorPaths:
    def test_not_a_sphere_file(self, tmp_path):
        p = tmp_path / "x.sph"
        p.write_bytes(b"RIFF" + b"\x00" * 100)
        with pytest.raises(SphereFormatError):
            info_sph(p)

    def test_shorten_raises_targeted_error(self, tmp_path):
        header = (
            b"NIST_1A\n   1024\n"
            b"sample_count -i 100\nchannel_count -i 1\nsample_rate -i 8000\n"
            b"sample_n_bytes -i 2\nsample_coding -s26 pcm,embedded-shorten-v2.00\n"
            b"end_head\n")
        p = tmp_path / "sh.sph"
        p.write_bytes(header + b"\x00" * (1024 - len(header)) + b"ajkg" + b"\x00" * 50)
        with pytest.raises(SphereShortenError):
            read_sph(p)

    def test_truncated_payload(self, tmp_path):
        x = np.zeros((1, 1000), dtype=np.float32)
        p = tmp_path / "t.sph"
        write_sph(p, x, 8000)
        data = p.read_bytes()[: 1024 + 500]
        p.write_bytes(data)
        with pytest.raises(SphereFormatError, match="truncated"):
            read_sph(p)

    def test_mislabeled_riff_behind_sph_suffix(self, tmp_path):
        # A RIFF file named .sph must not be claimed by the SPHERE backend.
        from lhotse_tpu.audio.wavio import write_wav

        p = tmp_path / "fake.sph"
        write_wav(p, np.zeros((1, 800), dtype=np.float32), 8000)
        assert not SphereBackend().handles_special_case(p)
        r = Recording.from_file(p)
        assert r.load_audio().shape == (1, 800)


class TestSecondsBasedCompatWrapper:
    """`lhotse_tpu.audio.read_sph(sph_path, offset, duration)` — the
    reference's sph2pipe-contract wrapper (audio/backend.py:1603) over the
    native frame-based decoder."""

    def test_offset_duration_seconds(self, tmp_path):
        from lhotse_tpu.audio import read_sph as read_sph_seconds

        x = (np.sin(np.arange(16000) / 30.0) * 0.4).astype(np.float32)[None, :]
        p = tmp_path / "a.sph"
        write_sph(p, x, 8000)
        full, sr = read_sph_seconds(p)
        assert sr == 8000 and full.shape == (1, 16000)
        part, _ = read_sph_seconds(p, offset=0.5, duration=1.0)
        np.testing.assert_array_equal(part, full[:, 4000:12000])
        tail, _ = read_sph_seconds(p, offset=1.5)
        np.testing.assert_array_equal(tail, full[:, 12000:])
