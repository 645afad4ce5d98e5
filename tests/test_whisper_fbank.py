"""WhisperFbank parity with the torch STFT formulation + resampling backends."""
import numpy as np
import pytest

from lhotse_tpu import WhisperFbank, WhisperFbankConfig
from lhotse_tpu.audio.resampling_backend import (
    available_resampling_backends, get_current_resampling_backend, resampling_backend,
    set_current_resampling_backend)
from lhotse_tpu.features.base import create_default_feature_extractor
from lhotse_tpu.features.whisper import slaney_mel_filters


@pytest.fixture
def audio():
    rng = np.random.RandomState(0)
    return (rng.randn(16000 * 2 + 137) * 0.1).astype(np.float32)


def test_whisper_fbank_matches_torch_stft_golden(audio):
    torch = pytest.importorskip("torch")
    filters = torch.from_numpy(slaney_mel_filters(16000, 400, 80))
    window = torch.hann_window(400)
    stft = torch.stft(torch.from_numpy(audio), 400, 160, window=window, return_complex=True)
    mag = stft[..., :-1].abs() ** 2
    mel = filters @ mag
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    golden = ((log_spec + 4.0) / 4.0).transpose(0, 1).numpy()

    mine = WhisperFbank().extract(audio, 16000)
    # Reference pads to the rounded frame count after the golden computation
    # (whisper_fbank.py:72-81): (32137 + 80) // 160 = 201 vs golden's 200.
    assert mine.shape == (201, 80)
    np.testing.assert_allclose(mine[: len(golden)], golden, atol=1e-4)
    assert np.all(mine[len(golden) :] == 0)


def test_whisper_fbank_basics(audio):
    fb = WhisperFbank(WhisperFbankConfig(num_filters=128))
    assert fb.feature_dim(16000) == 128
    assert fb.frame_shift == pytest.approx(0.01)
    out = fb.extract(audio, 16000)
    assert out.shape[1] == 128 and out.dtype == np.float32
    with pytest.raises(AssertionError):
        fb.extract(audio, 8000)
    with pytest.raises(ValueError):
        fb.extract(np.zeros((2, 16000), dtype=np.float32), 16000)
    with pytest.raises(ValueError):
        WhisperFbank.mix(out, out, 1.0)


def test_whisper_fbank_registered():
    fb = create_default_feature_extractor("whisper-fbank")
    assert isinstance(fb, WhisperFbank)
    rt = WhisperFbank.from_dict(fb.to_dict())
    assert rt.config == fb.config


def test_slaney_filters_properties():
    F = slaney_mel_filters(16000, 400, 80)
    assert F.shape == (80, 201)
    assert F.min() >= 0
    # Triangles overlap so that interior FFT bins are covered.
    coverage = F.sum(axis=0)
    assert (coverage[5:-5] > 0).all()
    # Slaney norm: each row integrates (over Hz) to ~1 after enorm.
    hz_per_bin = 8000.0 / 200.0
    areas = F.sum(axis=1) * hz_per_bin
    assert np.abs(areas - 1.0).max() < 0.25


def test_resampling_backend_registry():
    assert "default" in available_resampling_backends()
    assert get_current_resampling_backend() == "default"
    with pytest.raises(ValueError):
        set_current_resampling_backend("nonexistent")
    if "sox" in available_resampling_backends():
        with resampling_backend("sox"):
            assert get_current_resampling_backend() == "sox"
        assert get_current_resampling_backend() == "default"


def test_resample_transform_backend_dispatch(audio):
    from lhotse_tpu.augmentation import Resample

    tfm = Resample(source_sampling_rate=16000, target_sampling_rate=8000)
    default_out = tfm(audio)
    assert default_out.shape[-1] == 16069  # ceil(32137 / 2)
    if "sox" in available_resampling_backends():
        with resampling_backend("sox"):
            sox_out = tfm(audio)
        assert sox_out.shape[-1] == pytest.approx(default_out.shape[-1], abs=2)
