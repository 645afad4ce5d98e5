"""Native FLAC codec tests: bit-exact decode (MD5-verified against the
standard encoder's embedded PCM hash), lossless roundtrip, backend wiring."""
import hashlib
import io
from pathlib import Path

import numpy as np
import pytest

from lhotse_tpu.audio import flacio

FIXTURE = Path("/root/reference/test/fixtures/mix_cut_test/audio/storage/2412-153948-0000.flac")

pytestmark = pytest.mark.skipif(
    not flacio.is_available(), reason="native FLAC codec unavailable (no C compiler)")


def _streaminfo_md5(data: bytes) -> bytes:
    pos = 4
    while True:
        last = data[pos] >> 7
        typ = data[pos] & 0x7F
        ln = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4
        if typ == 0:
            return data[pos + 18 : pos + 34]
        pos += ln
        if last:
            raise ValueError("No STREAMINFO found")


@pytest.mark.skipif(not FIXTURE.exists(), reason="reference fixture unavailable")
class TestDecodeRealFlac:
    def test_info(self):
        info = flacio.info_flac(FIXTURE)
        assert info.num_channels == 1
        assert info.sampling_rate == 16000
        assert info.bits_per_sample == 16
        assert info.num_frames == 186560

    def test_bit_exact_decode_via_md5(self):
        """The PCM MD5 embedded by the standard encoder must match our decode."""
        data = FIXTURE.read_bytes()
        samples, sr = flacio.read_flac(data)
        pcm = np.rint(samples * 32768).clip(-32768, 32767).astype("<i2")
        assert hashlib.md5(pcm.T.tobytes()).digest() == _streaminfo_md5(data)


class TestRoundtrip:
    def test_mono_lossless(self):
        rng = np.random.RandomState(0)
        x = (rng.randn(1, 50000) * 0.3).clip(-0.999, 0.999).astype(np.float32)
        buf = io.BytesIO()
        flacio.write_flac(buf, x, 16000)
        y, sr = flacio.read_flac(buf.getvalue())
        assert sr == 16000
        np.testing.assert_array_equal(np.rint(x * 32768).clip(-32768, 32767), np.rint(y * 32768))

    def test_stereo_lossless_and_compresses(self):
        t = np.arange(30000) / 16000
        x = (
            np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)])
            .astype(np.float32)
            * 0.5
        )
        buf = io.BytesIO()
        flacio.write_flac(buf, x, 16000)
        assert len(buf.getvalue()) < x.size * 2  # beats raw PCM
        y, _ = flacio.read_flac(buf.getvalue())
        np.testing.assert_array_equal(np.rint(x * 32768).clip(-32768, 32767), np.rint(y * 32768))

    def test_own_md5_is_valid(self):
        rng = np.random.RandomState(1)
        x = (rng.randn(1, 10000) * 0.2).astype(np.float32)
        buf = io.BytesIO()
        flacio.write_flac(buf, x, 16000)
        data = buf.getvalue()
        samples, _ = flacio.read_flac(data)
        pcm = np.rint(samples * 32768).clip(-32768, 32767).astype("<i2")
        assert hashlib.md5(pcm.T.tobytes()).digest() == _streaminfo_md5(data)


class TestBackendIntegration:
    def test_recording_from_flac(self, tmp_path):
        from lhotse_tpu import Recording

        rng = np.random.RandomState(2)
        x = (rng.randn(1, 32000) * 0.2).astype(np.float32)
        p = tmp_path / "test.flac"
        flacio.write_flac(p, x, 16000)
        rec = Recording.from_file(p)
        assert rec.sampling_rate == 16000
        assert rec.num_samples == 32000
        audio = rec.load_audio()
        np.testing.assert_allclose(audio, x, atol=1.0 / 32768)
        # Partial read
        part = rec.load_audio(offset=0.5, duration=1.0)
        np.testing.assert_allclose(part, x[:, 8000:24000], atol=1.0 / 32768)

    def test_shar_flac_export(self, tmp_path):
        from lhotse_tpu import CutSet, Recording
        from lhotse_tpu.audio.wavio import write_wav

        rng = np.random.RandomState(3)
        x = (rng.randn(16000) * 0.2).astype(np.float32)
        write_wav(str(tmp_path / "a.wav"), x, 16000)
        cuts = CutSet.from_cuts([Recording.from_file(tmp_path / "a.wav").to_cut()])
        cuts.to_shar(tmp_path / "shar", fields={"recording": "flac"})
        back = list(CutSet.from_shar(in_dir=tmp_path / "shar"))
        np.testing.assert_allclose(back[0].load_audio()[0], x, atol=1.0 / 32768)
