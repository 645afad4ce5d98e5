"""
TTS-style log-mel fbank (librosa semantics), implemented natively.

Parity target: `/root/reference/lhotse/features/librosa_fbank.py:66-210`
(``logmelfilterbank`` as used by ParallelWaveGAN-family TTS projects):
centered magnitude STFT (reflect padding, periodic Hann), Slaney-scale/
Slaney-normalized mel projection over fmin..fmax, ``log10`` with an epsilon
floor, padded/truncated to the canonical frame count. The reference requires
librosa; here the mel filters come from
:func:`lhotse_tpu.features.whisper.slaney_mel_filters` (same math) and the
STFT is a real-DFT GEMM, so the extractor is dependency-free.
"""
from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Any, Dict, Optional

import numpy as np

from lhotse_tpu.features.base import FeatureExtractor, register_extractor
from lhotse_tpu.features.whisper import slaney_mel_filters
from lhotse_tpu.utils import EPSILON, LOG_EPSILON, Seconds, compute_num_frames


@dataclass
class LibrosaFbankConfig:
    """Defaults consistent with popular TTS projects (e.g. ParallelWaveGAN).
    Reference: librosa_fbank.py:16-40."""

    sampling_rate: int = 22050
    fft_size: int = 1024
    hop_size: int = 256
    win_length: Optional[int] = None
    window: str = "hann"
    num_mel_bins: int = 80
    fmin: int = 80
    fmax: int = 7600

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "LibrosaFbankConfig":
        return LibrosaFbankConfig(**data)


def pad_or_truncate_features(
    feats: np.ndarray, expected_num_frames: int, abs_tol: int = 1, pad_value: float = LOG_EPSILON,
) -> np.ndarray:
    """Reference: librosa_fbank.py:43-63 — tolerate ±1 frame drift between
    the STFT hop count and the canonical duration-based frame count."""
    frames_diff = feats.shape[0] - expected_num_frames
    if 0 < frames_diff <= abs_tol:
        feats = feats[:expected_num_frames]
    elif -abs_tol <= frames_diff < 0:
        feats = np.pad(
            feats, ((0, -frames_diff), (0, 0)), mode="constant", constant_values=pad_value)
    elif abs(frames_diff) > abs_tol:
        raise ValueError(
            f"Expected {expected_num_frames} feature frames; "
            f"feats.shape[0] = {feats.shape[0]}"
        )
    return feats


def logmelfilterbank(
    audio: np.ndarray, sampling_rate: int, fft_size: int = 1024, hop_size: int = 256,
    win_length: Optional[int] = None, window: str = "hann", num_mel_bins: int = 80, fmin: int = 80,
    fmax: int = 7600, eps: float = EPSILON) -> np.ndarray:
    """Log-mel feature matrix (num_frames, num_mel_bins); see module docs."""
    assert window == "hann", "Only the hann window is supported."
    audio = np.asarray(audio)
    if audio.ndim == 2:
        assert audio.shape[0] == 1, (
            f"LibrosaFbank works only with single-channel recordings "
            f"(shape: {audio.shape})"
        )
        audio = audio[0]
    assert audio.ndim == 1

    if win_length is None:
        win_length = fft_size
    n = np.arange(win_length, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)  # periodic hann
    # librosa centers the window inside the FFT buffer when win_length < n_fft.
    pad_left = (fft_size - win_length) // 2
    window_full = np.zeros(fft_size)
    window_full[pad_left : pad_left + win_length] = win
    window_full = window_full.astype(np.float32)

    x = np.pad(audio.astype(np.float32, copy=False), (fft_size // 2,) * 2, "reflect")
    num_frames = 1 + (len(audio)) // hop_size
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(num_frames, fft_size), strides=(hop_size * x.strides[0], x.strides[0]))
    frames = frames * window_full[None, :]

    from lhotse_tpu.ops.fbank import raw_dft_matrices

    C, S = raw_dft_matrices(fft_size, fft_size)
    re = frames @ C
    im = frames @ S
    spc = np.sqrt(re * re + im * im)  # magnitude, not power (librosa_fbank.py:120)

    fmin = 0 if fmin is None else fmin
    fmax = sampling_rate / 2 if fmax is None else fmax
    mel_basis = slaney_mel_filters(
        sampling_rate, fft_size, num_mel_bins, fmin=float(fmin), fmax=float(fmax))
    feats = np.log10(np.maximum(eps, spc @ mel_basis.T))

    expected_num_frames = compute_num_frames(
        duration=len(audio) / sampling_rate, frame_shift=hop_size / sampling_rate,
        sampling_rate=sampling_rate)
    return pad_or_truncate_features(feats, expected_num_frames).astype(np.float32)


@register_extractor
class LibrosaFbank(FeatureExtractor):
    """Reference: librosa_fbank.py:138-210."""

    name = "librosa-fbank"
    config_type = LibrosaFbankConfig

    @property
    def frame_shift(self) -> Seconds:
        return self.config.hop_size / self.config.sampling_rate

    def feature_dim(self, sampling_rate: int) -> int:
        return self.config.num_mel_bins

    def extract(self, samples: np.ndarray, sampling_rate: int) -> np.ndarray:
        assert sampling_rate == self.config.sampling_rate
        return logmelfilterbank(samples, **asdict(self.config))

    @staticmethod
    def mix(features_a, features_b, energy_scaling_factor_b):
        return np.log(
            np.maximum(
                EPSILON,
                np.exp(features_a) + energy_scaling_factor_b * np.exp(features_b),
            )
        )

    @staticmethod
    def compute_energy(features: np.ndarray) -> float:
        return float(np.sum(np.exp(features)))

    @staticmethod
    def scale(features: np.ndarray, energy_scaling_factor: float) -> np.ndarray:
        return features + np.log(energy_scaling_factor)
