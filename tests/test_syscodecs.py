"""
System-library lossy codecs (lhotse_tpu/audio/syscodecs.py): MP3 via
libmpg123/libmp3lame, Ogg/Vorbis via libvorbisfile(+enc), Ogg/Opus via
libogg+libopus — the in-process equivalents of the reference's
libsndfile/ffmpeg/torchaudio lossy coverage
(/root/reference/lhotse/audio/backend.py:260-296,1494).

Verification is round-trip (our encoder -> our decoder -> correlation with
the source + exact sample counts) plus direct decodes of the reference
repo's real media fixtures, and the full Recording/CutSet integration.
"""
import numpy as np
import pytest

from lhotse_tpu import Recording
from lhotse_tpu.audio import syscodecs as sc

REF_FIXTURES = "/root/reference/test/fixtures"


def _sine(sr=16000, seconds=2.0, f0=440.0, ch=1):
    t = np.arange(int(sr * seconds)) / sr
    x = 0.5 * np.sin(2 * np.pi * f0 * t).astype(np.float32)
    if ch == 2:
        x = np.stack([x, 0.25 * np.sin(2 * np.pi * 2 * f0 * t).astype(np.float32)])
    return x


def _corr(a, b):
    n = min(a.shape[-1], b.shape[-1])
    a, b = a[..., :n].ravel(), b[..., :n].ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


# ---------------------------------------------------------------- MP3


@pytest.mark.skipif(
    not (sc.mp3_available() and sc.mp3_encode_available()),
    reason="libmpg123/libmp3lame not present",
)
class TestMp3:
    def test_roundtrip_exact_length_mono(self):
        x = _sine()
        y, sr = sc.mp3_decode(sc.mp3_encode(x, 16000))
        assert sr == 16000 and y.shape == (1, x.shape[-1])
        assert _corr(x, y[0]) > 0.99

    def test_roundtrip_stereo(self):
        x = _sine(ch=2)
        y, sr = sc.mp3_decode(sc.mp3_encode(x, 16000))
        assert y.shape == x.shape
        assert _corr(x, y) > 0.98

    def test_info_matches_decode(self):
        data = sc.mp3_encode(_sine(seconds=1.3), 16000)
        sr, ch, n = sc.mp3_info(data)
        y, _ = sc.mp3_decode(data)
        assert (sr, ch, n) == (16000, 1, y.shape[-1])

    def test_reference_fixture_stereo(self):
        y, sr = sc.mp3_decode(f"{REF_FIXTURES}/stereo.mp3")
        assert sr == 8000 and y.shape[0] == 2
        assert abs(y.shape[1] / sr - 1.0) < 0.01
        assert np.isfinite(y).all() and np.abs(y).max() > 0.01

    def test_reference_fixture_commonvoice(self):
        p = f"{REF_FIXTURES}/common_voice_en_651325.mp3"
        sr, ch, n = sc.mp3_info(p)
        y, dsr = sc.mp3_decode(p)
        assert (dsr, y.shape[0], y.shape[1]) == (sr, ch, n)
        assert sr == 48000 and np.isfinite(y).all()

    def test_path_seek_matches_memory_slice(self, tmp_path):
        data = sc.mp3_encode(_sine(seconds=2.0), 16000)
        p = tmp_path / "x.mp3"
        p.write_bytes(data)
        full, _ = sc.mp3_decode(data)
        ranged, _ = sc.mp3_decode(str(p), offset_samples=8000, num_samples=4000)
        np.testing.assert_allclose(ranged, full[:, 8000:12000], atol=1e-4)


# ------------------------------------------------------------- Vorbis


@pytest.mark.skipif(
    not (sc.vorbis_available() and sc.vorbis_encode_available()),
    reason="libvorbisfile/libvorbisenc not present",
)
class TestVorbis:
    def test_roundtrip_exact_length(self):
        x = _sine()
        y, sr = sc.vorbis_decode(sc.vorbis_encode(x, 16000))
        assert sr == 16000 and y.shape == (1, x.shape[-1])
        assert _corr(x, y[0]) > 0.99

    def test_roundtrip_stereo_441(self):
        x = _sine(sr=44100, ch=2)
        y, sr = sc.vorbis_decode(sc.vorbis_encode(x, 44100))
        assert sr == 44100 and y.shape == x.shape
        assert _corr(x, y) > 0.98

    def test_seek_read(self):
        x = _sine(seconds=2.0)
        data = sc.vorbis_encode(x, 16000)
        full, _ = sc.vorbis_decode(data)
        part, _ = sc.vorbis_decode(data, offset_samples=16000, num_samples=4000)
        np.testing.assert_allclose(part, full[:, 16000:20000], atol=1e-5)

    def test_quality_orders_size(self):
        x = _sine(seconds=3.0)
        small = sc.vorbis_encode(x, 16000, quality=-0.1)
        big = sc.vorbis_encode(x, 16000, quality=0.9)
        assert len(small) < len(big)


# --------------------------------------------------------------- Opus


@pytest.mark.skipif(not sc.opus_available(), reason="libopus/libogg not present")
class TestOpus:
    def test_roundtrip_16k_exact_length(self):
        x = _sine()
        y, sr = sc.opus_decode(sc.opus_encode(x, 16000), force_sampling_rate=16000)
        assert sr == 16000 and y.shape == (1, x.shape[-1])
        assert _corr(x, y[0]) > 0.97

    def test_decodes_at_48k_by_default(self):
        x = _sine()
        y, sr = sc.opus_decode(sc.opus_encode(x, 16000))
        assert sr == 48000 and y.shape[-1] == 3 * x.shape[-1]

    def test_force_nonnative_rate_resamples(self):
        x = _sine()
        y, sr = sc.opus_decode(sc.opus_encode(x, 16000), force_sampling_rate=22050)
        assert sr == 22050
        assert abs(y.shape[-1] - round(x.shape[-1] * 22050 / 16000)) <= 2

    def test_info_agrees_with_decode(self):
        data = sc.opus_encode(_sine(seconds=0.73), 16000)
        sr, ch, n = sc.opus_info(data, force_sampling_rate=16000)
        y, _ = sc.opus_decode(data, force_sampling_rate=16000)
        assert (sr, ch, n) == (16000, 1, y.shape[-1])

    def test_stereo(self):
        x = _sine(ch=2)
        y, sr = sc.opus_decode(sc.opus_encode(x, 16000), force_sampling_rate=16000)
        assert y.shape == x.shape and _corr(x, y) > 0.95

    @pytest.mark.parametrize("f", ["stereo.opus", "mono_c0.opus"])
    def test_reference_fixtures(self, f):
        y, sr = sc.opus_decode(f"{REF_FIXTURES}/{f}")
        assert sr == 48000 and np.isfinite(y).all() and np.abs(y).max() > 0.001
        assert y.shape[0] == (2 if f.startswith("stereo") else 1)

    def test_encode_rejects_bad_rate(self):
        with pytest.raises(ValueError):
            sc.opus_encode(_sine(sr=22050), 22050)


# -------------------------------------------- Recording/backend integration


@pytest.mark.skipif(not sc.mp3_available(), reason="libmpg123 not present")
def test_recording_from_mp3_fixture_full_chain():
    r = Recording.from_file(f"{REF_FIXTURES}/common_voice_en_651325.mp3")
    assert r.sampling_rate == 48000 and r.num_channels == 1
    a = r.load_audio()
    assert a.shape == (1, r.num_samples)
    part = r.load_audio(offset=0.5, duration=0.25)
    assert part.shape[1] == 12000
    np.testing.assert_allclose(part, a[:, 24000:36000], atol=1e-4)
    # downstream: resample + fbank through the cut API
    cut = r.to_cut().resample(16000)
    feats = None
    from lhotse_tpu import Fbank

    feats = cut.compute_features(Fbank(config=None))
    assert feats.shape[1] == 80 and np.isfinite(feats).all()


@pytest.mark.skipif(not sc.opus_available(), reason="libopus not present")
def test_recording_opus_force_sampling_rate(tmp_path):
    x = _sine(seconds=1.0)
    (tmp_path / "a.opus").write_bytes(sc.opus_encode(x, 16000))
    from lhotse_tpu.audio.backend import info, read_audio

    meta = info(tmp_path / "a.opus", force_opus_sampling_rate=16000)
    assert meta.samplerate == 16000 and meta.frames == x.shape[-1]
    audio, sr = read_audio(tmp_path / "a.opus", force_opus_sampling_rate=16000)
    assert sr == 16000 and audio.shape[-1] == x.shape[-1]


@pytest.mark.skipif(
    not (sc.vorbis_available() and sc.opus_available()),
    reason="system codecs missing",
)
def test_ogg_suffix_sniffs_codec(tmp_path):
    """.ogg can carry vorbis OR opus: the registry must dispatch by the
    first page's packet magic, not the extension."""
    x = _sine(seconds=0.5)
    (tmp_path / "v.ogg").write_bytes(sc.vorbis_encode(x, 16000))
    (tmp_path / "o.ogg").write_bytes(sc.opus_encode(x, 16000))
    rv = Recording.from_file(tmp_path / "v.ogg")
    ro = Recording.from_file(tmp_path / "o.ogg")
    assert rv.sampling_rate == 16000
    assert ro.sampling_rate == 48000  # opus decodes at 48k by default
    assert rv.load_audio().shape[0] == 1 and ro.load_audio().shape[0] == 1


@pytest.mark.skipif(
    not (sc.mp3_available() and sc.mp3_encode_available()),
    reason="mp3 codecs missing",
)
def test_compress_transform_uses_syscodecs():
    from lhotse_tpu.augmentation.compress import Compress

    x = _sine(seconds=0.8)
    for codec in ["mp3", "vorbis", "opus"]:
        out = Compress(codec=codec, compression_level=0.6)(x, 16000)
        assert out.shape == np.atleast_2d(x).shape
        assert _corr(np.atleast_2d(x), out) > 0.9, codec


@pytest.mark.skipif(not sc.opus_available(), reason="libopus not present")
def test_shar_opus_format_roundtrip(tmp_path):
    """SharWriter(fields={'recording': 'opus'}) writes opus payloads the
    shar reader decodes in memory (reference shar/writers/audio.py)."""
    from lhotse_tpu import CutSet
    from lhotse_tpu.audio.wavio import write_wav
    from lhotse_tpu.shar import SharWriter

    x = _sine(sr=16000, seconds=1.0)
    write_wav(str(tmp_path / "a.wav"), x, 16000)
    cut = Recording.from_file(tmp_path / "a.wav").to_cut()
    with SharWriter(
        tmp_path / "shar", fields={"recording": "opus"}, shard_size=10
    ) as w:
        w.write(cut)
    restored = list(CutSet.from_shar(in_dir=tmp_path / "shar"))
    assert len(restored) == 1
    audio = restored[0].load_audio()
    assert np.isfinite(audio).all()
    # opus re-encodes at 48k; content must still correlate with the source
    from lhotse_tpu.augmentation.resample import resample_array

    back = resample_array(audio, restored[0].sampling_rate, 16000)
    assert _corr(x, back) > 0.9
