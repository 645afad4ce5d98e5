"""
Whisper-style log-Mel filterbank extractor.

Parity target: `/root/reference/lhotse/features/whisper_fbank.py:17-101`
(itself OpenAI Whisper's ``log_mel_spectrogram``). The reference needs torch
(STFT) and librosa (mel filters); this implementation is self-contained:

- the Slaney-scale/Slaney-normalized mel filterbank (librosa's defaults for
  ``librosa.filters.mel(sr, n_fft, n_mels)``) is computed in
  :func:`slaney_mel_filters` in float64 numpy;
- the centered STFT (reflect padding, periodic Hann, hop 160, n_fft 400,
  last frame dropped) is evaluated as a real-DFT GEMM over a hop-strided
  frame view — the same MXU-friendly formulation the Kaldi-compatible
  extractors use (:func:`lhotse_tpu.ops.fbank.raw_dft_matrices`).

Whisper's normalization is data-dependent (``max(log_spec, max-8)``), so the
output depends on the whole utterance: feature-domain mixing is not defined
for this extractor (same as the reference, whisper_fbank.py:166-186 raises).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Any, Dict, Optional

import numpy as np

from lhotse_tpu.features.base import FeatureExtractor, register_extractor
from lhotse_tpu.utils import (Seconds, asdict_nonull, compute_num_frames_from_samples)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney auditory-toolbox mel scale (librosa's default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mels = f / f_sp
    above = f >= min_log_hz
    mels = np.where(
        above, min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = m * f_sp
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=None)
def slaney_mel_filters(
    sampling_rate: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: Optional[float] = None,
) -> np.ndarray:
    """
    Triangular mel filterbank matching ``librosa.filters.mel`` defaults
    (htk=False, norm="slaney"); shape (n_mels, n_fft//2+1).
    """
    if fmax is None:
        fmax = sampling_rate / 2.0
    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(float(fmin)), _hz_to_mel_slaney(float(fmax)), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney-style energy normalization: each filter integrates to ~2/bandwidth.
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@dataclass
class WhisperFbankConfig:
    """Reference: whisper_fbank.py:87-99."""

    num_filters: int = 80
    device: str = "cpu"

    def to_dict(self) -> Dict[str, Any]:
        return asdict_nonull(self)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "WhisperFbankConfig":
        return WhisperFbankConfig(**data)


@register_extractor
class WhisperFbank(FeatureExtractor):
    """
    Log-Mel features exactly as Whisper computes them: centered power STFT,
    Slaney mel projection, ``log10`` clamped at 1e-10, floored at the
    utterance max minus 8, then mapped through ``(x + 4) / 4``.

    Reference: whisper_fbank.py:101-186.
    """

    name = "whisper-fbank"
    config_type = WhisperFbankConfig

    def __init__(self, config=None):
        super().__init__(config=config)
        self.sampling_rate = 16000
        self.hop_length = 160
        self.n_fft = 400
        self.num_filters = self.config.num_filters
        self.filters = slaney_mel_filters(self.sampling_rate, self.n_fft, self.num_filters)
        # Periodic Hann, like torch.hann_window(n_fft).
        n = np.arange(self.n_fft, dtype=np.float64)
        self.window = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / self.n_fft)).astype(np.float32)

    @property
    def device(self) -> str:
        return self.config.device

    @property
    def frame_shift(self) -> Seconds:
        return self.hop_length / self.sampling_rate

    def to(self, device: str) -> None:
        self.config.device = device

    def feature_dim(self, sampling_rate: int) -> int:
        return self.num_filters

    def extract(self, samples: np.ndarray, sampling_rate: int) -> np.ndarray:
        assert sampling_rate == self.sampling_rate, (
            f"WhisperFbank was instantiated for sampling_rate "
            f"{self.sampling_rate}, but sampling_rate={sampling_rate} was "
            f"passed to extract(). Note you can use CutSet/RecordingSet."
            f"resample() to change the audio sampling rate."
        )
        samples = np.asarray(samples)
        if samples.ndim == 2:
            if samples.shape[0] > 1:
                raise ValueError("Whisper Fbank works only with single-channel recordings.")
            samples = samples[0]
        x = samples.astype(np.float32, copy=False)
        num_samples = len(x)

        # Centered STFT: reflect-pad n_fft//2 on both sides, then frames at
        # t*hop; torch.stft yields 1 + len//hop frames and Whisper drops the
        # last one (whisper_fbank.py:63-64).
        pad = self.n_fft // 2
        x = np.pad(x, (pad, pad), mode="reflect")
        num_frames = max(num_samples // self.hop_length, 0)
        if num_frames > 0:
            frames = np.lib.stride_tricks.as_strided(
                x, shape=(num_frames, self.n_fft),
                strides=(self.hop_length * x.strides[0], x.strides[0]))
            frames = frames * self.window[None, :]
            from lhotse_tpu.ops.fbank import raw_dft_matrices

            C, S = raw_dft_matrices(self.n_fft, self.n_fft)
            re = frames @ C
            im = frames @ S
            magnitudes = re * re + im * im
            mel_spec = magnitudes @ self.filters.T  # (T, n_mels)
            log_spec = np.log10(np.maximum(mel_spec, 1e-10))
            log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
            log_spec = (log_spec + 4.0) / 4.0
        else:
            log_spec = np.zeros((0, self.num_filters), dtype=np.float32)

        # Whisper zero-pads to the rounded frame count for short inputs
        # (whisper_fbank.py:72-81).
        target = compute_num_frames_from_samples(
            num_samples=num_samples, frame_shift=self.frame_shift, sampling_rate=self.sampling_rate)
        if target > log_spec.shape[0]:
            log_spec = np.pad(log_spec, ((0, target - log_spec.shape[0]), (0, 0)))
        return log_spec.astype(np.float32)

    @staticmethod
    def mix(
        features_a: np.ndarray, features_b: np.ndarray, energy_scaling_factor_b: float,
    ) -> np.ndarray:
        raise ValueError(
            "Mixing is not defined for Whisper filter-bank features: its "
            "per-utterance max normalization makes the transform non-linear."
        )

    @staticmethod
    def compute_energy(features: np.ndarray) -> float:
        raise ValueError("Energy is not defined for Whisper filter-bank features.")


def log_mel_spectrogram(
    audio: np.ndarray,
    filters: Optional[np.ndarray] = None,
    n_mels: int = 80,
    n_fft: int = 400,
    window: Optional[np.ndarray] = None,
    hop_length: int = 160,
    sampling_rate: int = 16000,
    device=None,
) -> np.ndarray:
    """
    Functional Whisper log-Mel spectrogram, returning ``(n_mels, T)``.

    Parity: reference ``lhotse/features/whisper_fbank.py:17`` (itself OpenAI
    Whisper's ``audio.log_mel_spectrogram``); torch-free here. ``filters`` /
    ``window`` override the Slaney mel bank / periodic Hann window when given;
    ``device`` is accepted for signature compatibility and ignored.
    """
    fb = WhisperFbank(WhisperFbankConfig(num_filters=n_mels))
    fb.n_fft = n_fft
    fb.hop_length = hop_length
    fb.sampling_rate = sampling_rate
    if filters is not None:
        fb.filters = np.asarray(filters, dtype=np.float32)
    else:
        fb.filters = slaney_mel_filters(sampling_rate, n_fft, n_mels)
    if window is not None:
        fb.window = np.asarray(window, dtype=np.float32)
    else:
        n = np.arange(n_fft, dtype=np.float64)
        fb.window = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)).astype(np.float32)
    return fb.extract(np.asarray(audio), sampling_rate).T
