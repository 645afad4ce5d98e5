"""
Property-based round trips through the native audio codec stack: random
shapes, rates, channel counts, and subtypes through WAV/FLAC/AIFF/SPHERE
writers, read back via Recording.from_file with full and windowed reads.
"""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lhotse_tpu import Recording
from lhotse_tpu.audio.aiffio import write_aiff
from lhotse_tpu.audio.flacio import write_flac
from lhotse_tpu.audio.sphio import write_sph
from lhotse_tpu.audio.wavio import write_wav

MAX_EXAMPLES = 30


@st.composite
def audio_cases(draw):
    sr = draw(st.sampled_from([8000, 16000, 22050, 44100]))
    channels = draw(st.integers(1, 2))
    frames = draw(st.integers(200, 4000))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    data = (0.4 * rng.randn(channels, frames)).clip(-0.99, 0.99).astype(np.float32)
    return sr, data


def _roundtrip(tmp_path_factory, fmt, writer, data, sr, tol):
    d = tmp_path_factory.mktemp("codec")
    path = d / f"x.{fmt}"
    writer(str(path), data, sr)
    rec = Recording.from_file(path)
    assert rec.sampling_rate == sr
    assert rec.num_samples == data.shape[1]
    assert rec.num_channels == data.shape[0]
    full = rec.load_audio()
    assert full.shape == data.shape
    np.testing.assert_allclose(full, data, atol=tol)

    # Windowed read agrees with slicing the full decode.
    if data.shape[1] > 400:
        offset = 100 / sr
        duration = 200 / sr
        window = rec.load_audio(offset=offset, duration=duration)
        np.testing.assert_allclose(window, full[:, 100:300], atol=1e-7)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(case=audio_cases(), subtype=st.sampled_from(["pcm16", "pcm24", "pcm32", "float32"]))
def test_wav_roundtrip(tmp_path_factory, case, subtype):
    sr, data = case
    tol = {"pcm16": 2 / 2**15, "pcm24": 2 / 2**23, "pcm32": 2 / 2**31, "float32": 1e-7}[subtype]
    d = tmp_path_factory.mktemp("codec")
    path = d / "x.wav"
    write_wav(str(path), data, sr, subtype=subtype)
    rec = Recording.from_file(path)
    full = rec.load_audio()
    assert full.shape == data.shape
    np.testing.assert_allclose(full, data, atol=tol)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(case=audio_cases())
def test_flac_roundtrip(tmp_path_factory, case):
    sr, data = case
    _roundtrip(tmp_path_factory, "flac", write_flac, data, sr, tol=2 / 2**15)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(case=audio_cases())
def test_aiff_roundtrip(tmp_path_factory, case):
    sr, data = case
    _roundtrip(tmp_path_factory, "aiff", write_aiff, data, sr, tol=2 / 2**15)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(case=audio_cases())
def test_sphere_roundtrip(tmp_path_factory, case):
    sr, data = case
    _roundtrip(tmp_path_factory, "sph", write_sph, data, sr, tol=2 / 2**15)


@settings(max_examples=10, deadline=None)
@given(case=audio_cases())
def test_cross_format_consistency(tmp_path_factory, case):
    # The same signal through every container decodes to the same samples.
    sr, data = case
    d = tmp_path_factory.mktemp("codec")
    decoded = {}
    for fmt, writer in (
        ("wav", write_wav),
        ("flac", write_flac),
        ("aiff", write_aiff),
        ("sph", write_sph),
    ):
        p = d / f"x.{fmt}"
        writer(str(p), data, sr)
        decoded[fmt] = Recording.from_file(p).load_audio()
    for fmt, audio in decoded.items():
        np.testing.assert_allclose(
            audio, decoded["wav"], atol=3 / 2**15, err_msg=fmt
        )
