"""
Kaldi-compatible feature extraction as jitted JAX ops (the hot DSP path).

Parity contract (constants + math from the reference torch implementation at
`/root/reference/lhotse/features/kaldi/layers.py`, see SURVEY.md §2.5):
- framing: snip_edges=False ⇒ ``num_frames = (num_samples + shift//2) // shift``
  with symmetric padding of ``(frame_length - frame_shift)//2`` on the left
  (layers.py:727-772 pads with flipped edges — i.e. numpy 'symmetric' mode);
- per-frame: remove DC offset → (optional raw log-energy, floor 1e-15 +
  energy_floor) → pre-emphasis 0.97 with replicate pad → povey window
  (hann^0.85) → zero-pad to ``next_power_of_2(frame_samples)`` → rFFT →
  |X|^2 (or |X|) → mel filterbank (torchaudio-compatible construction,
  mel = 1127 ln(1 + f/700), layers.py:960) → ``max(., float32_eps).log()``;
- MFCC adds the orthogonal DCT-II matrix (layers.py:698) and sin lifter Q=22.

TPU-first design: everything after framing is *linear* until the squared
magnitude, so the chain DC-removal → preemphasis → window → DFT folds into two
precomputed matrices ``Mc``/``Ms`` of shape (frame_samples, num_bins):
``powspec = (F @ Mc)^2 + (F @ Ms)^2`` — two MXU GEMMs per batch instead of a
scalar FFT pipeline (the GEMM-native NDFT formulation; cf. MelT, PAPERS.md).
An explicit-rFFT path is retained for cross-validation, and a fused Pallas
kernel for the GEMM path lives in :mod:`lhotse_tpu.ops.fbank_pallas`.

All matrices are built in float64 and cast to float32; matmuls run with
``precision=HIGHEST`` so float32 parity with the CPU reference holds at 1e-4.
"""
from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import List, Optional, Tuple

import numpy as np

EPSILON = 1e-10
FLT_EPS = float(np.finfo(np.float32).eps)

HAMMING = "hamming"
HANNING = "hanning"
POVEY = "povey"
RECTANGULAR = "rectangular"
BLACKMAN = "blackman"


def available_windows() -> List[str]:
    return [HAMMING, HANNING, POVEY, RECTANGULAR, BLACKMAN]


def next_power_of_2(x: int) -> int:
    return 1 if x == 0 else 2 ** (x - 1).bit_length()


def lin2mel(x):
    return 1127.0 * np.log(1 + np.asarray(x, dtype=np.float64) / 700)


def mel2lin(x):
    return 700 * (np.exp(np.asarray(x, dtype=np.float64) / 1127.0) - 1)


def create_frame_window(window_size: int, window_type: str = POVEY, blackman_coeff=0.42) -> np.ndarray:
    """Window function of the given type/size (float64). The 'povey' window is
    hann^0.85; all windows are periodic=False (symmetric)."""
    n = np.arange(window_size, dtype=np.float64)
    if window_type == HANNING:
        return 0.5 - 0.5 * np.cos(2 * np.pi * n / (window_size - 1))
    if window_type == HAMMING:
        return 0.54 - 0.46 * np.cos(2 * np.pi * n / (window_size - 1))
    if window_type == POVEY:
        return (0.5 - 0.5 * np.cos(2 * np.pi * n / (window_size - 1))) ** 0.85
    if window_type == RECTANGULAR:
        return np.ones(window_size, dtype=np.float64)
    if window_type == BLACKMAN:
        a = 2 * np.pi / window_size
        return (blackman_coeff - 0.5 * np.cos(a * n) + (0.5 - blackman_coeff) * np.cos(2 * a * n))
    raise ValueError(f"Invalid window type: {window_type}")


def get_mel_banks(
    num_bins: int, window_length_padded: int, sample_freq: float, low_freq: float, high_freq: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """
    Kaldi/torchaudio-compatible triangular mel filterbank of shape
    (num_bins, num_fft_bins) where num_fft_bins = window_length_padded / 2
    (the nyquist bin is excluded and later zero-padded).
    """
    assert num_bins > 3, "Must have at least 3 mel bins"
    assert window_length_padded % 2 == 0
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq += nyquist
    assert (
        (0.0 <= low_freq < nyquist) and (0.0 < high_freq <= nyquist) and (low_freq < high_freq)
    ), f"Bad frequency range: low={low_freq} high={high_freq} nyquist={nyquist}"

    fft_bin_width = sample_freq / window_length_padded
    mel_low = lin2mel(low_freq)
    mel_high = lin2mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = mel_low + (bin_idx + 1.0) * mel_delta
    right_mel = mel_low + (bin_idx + 2.0) * mel_delta
    center_freqs = mel2lin(center_mel)

    mel = lin2mel(fft_bin_width * np.arange(num_fft_bins, dtype=np.float64))[None, :]
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    bins = np.maximum(0.0, np.minimum(up_slope, down_slope))
    return bins, center_freqs.squeeze(-1)


def create_mel_scale(
    num_filters: int, fft_length: int, sampling_rate: int, low_freq: float = 0,
    high_freq: Optional[float] = None, norm_filters: bool = True) -> np.ndarray:
    """Alternative (non-torchaudio) mel bank of shape (fft_bins+1, num_filters)
    (reference: layers.py:874)."""
    if high_freq is None or high_freq == 0:
        high_freq = sampling_rate / 2
    if high_freq < 0:
        high_freq = sampling_rate / 2 + high_freq
    mel_low = lin2mel(low_freq)
    mel_high = lin2mel(high_freq)
    melfc = np.linspace(mel_low, mel_high, num_filters + 2)
    mels = lin2mel(np.linspace(0, sampling_rate, fft_length))
    B = np.zeros((fft_length // 2 + 1, num_filters), dtype=np.float64)
    for k in range(num_filters):
        left_mel, center_mel, right_mel = melfc[k], melfc[k + 1], melfc[k + 2]
        for j in range(fft_length // 2):
            mel_j = mels[j]
            if left_mel < mel_j < right_mel:
                if mel_j <= center_mel:
                    B[j, k] = (mel_j - left_mel) / (center_mel - left_mel)
                else:
                    B[j, k] = (right_mel - mel_j) / (right_mel - center_mel)
    if norm_filters:
        B = B / np.sum(B, axis=0, keepdims=True)
    return B


def make_dct_matrix(num_ceps: int, num_filters: int) -> np.ndarray:
    """Orthogonal DCT-II matrix (num_filters, num_ceps) — reference layers.py:698."""
    n = np.arange(float(num_filters))[:, None]
    k = np.arange(float(num_ceps))[None, :]
    dct = np.cos(math.pi / float(num_filters) * (n + 0.5) * k)
    dct[:, 0] *= 1.0 / math.sqrt(2.0)
    dct *= math.sqrt(2.0 / float(num_filters))
    return dct


def make_lifter(num_ceps: int, Q: int) -> np.ndarray:
    """Sin lifter vector (reference layers.py:682)."""
    if Q == 0:
        return np.ones(num_ceps, dtype=np.float64)
    return 1 + 0.5 * Q * np.sin(math.pi * np.arange(num_ceps, dtype=np.float64) / Q)


def frame_preprocessing_matrix(
    frame_samples: int, remove_dc_offset: bool = True, preemph_coeff: float = 0.97,
    window: Optional[np.ndarray] = None) -> np.ndarray:
    """
    The per-frame linear preprocessing as one (frame_samples, frame_samples)
    matrix L such that ``processed_frame = frame @ L``:
    DC removal (I - 11^T/N), pre-emphasis with replicate left pad
    (y[n] = x[n] - c*x[n-1], y[0] = x[0] - c*x[0]), and windowing diag(w).
    """
    N = frame_samples
    L = np.eye(N, dtype=np.float64)
    if remove_dc_offset:
        L = L - np.full((N, N), 1.0 / N)
    if preemph_coeff != 0.0:
        P = np.eye(N, dtype=np.float64)
        P[0, 0] = 1.0 - preemph_coeff
        idx = np.arange(1, N)
        Pm = np.zeros((N, N), dtype=np.float64)
        Pm[idx - 1, idx] = -preemph_coeff
        P = np.eye(N, dtype=np.float64) + Pm
        P[0, 0] = 1.0 - preemph_coeff
        L = L @ P
    if window is not None:
        L = L * window[None, :]
    return L


@lru_cache(maxsize=32)
def dft_analysis_matrices(
    frame_samples: int, fft_length: int, window_type: str = POVEY, remove_dc_offset: bool = True,
    preemph_coeff: float = 0.97) -> Tuple[np.ndarray, np.ndarray]:
    """
    Precompute Mc, Ms of shape (frame_samples, fft_length//2 + 1) folding the
    full linear frame chain with the real DFT:
    ``X_re = F @ Mc``, ``X_im = F @ Ms`` for raw frames F.
    """
    window = create_frame_window(frame_samples, window_type=window_type)
    L = frame_preprocessing_matrix(
        frame_samples, remove_dc_offset=remove_dc_offset, preemph_coeff=preemph_coeff,
        window=window)
    n = np.arange(frame_samples, dtype=np.float64)[:, None]
    k = np.arange(fft_length // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / fft_length
    C = np.cos(ang)
    S = -np.sin(ang)
    Mc = (L @ C).astype(np.float32)
    Ms = (L @ S).astype(np.float32)
    return Mc, Ms


@lru_cache(maxsize=None)
def raw_dft_matrices(frame_samples: int, fft_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """
    Plain real-DFT analysis matrices (no preprocessing folded), for frames
    that were already DC-removed/pre-emphasized/windowed (and possibly
    zero-padded) on the host or in an earlier op:
    ``X_re = F @ C``, ``X_im = F @ S`` with shapes
    (frame_samples, fft_length//2 + 1). On TPU this GEMM formulation of the
    DFT runs on the MXU and is several times faster than ``jnp.fft.rfft``.
    """
    n = np.arange(frame_samples, dtype=np.float64)[:, None]
    k = np.arange(fft_length // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / fft_length
    C = np.cos(ang).astype(np.float32)
    S = (-np.sin(ang)).astype(np.float32)
    return C, S


def compute_num_frames_snip(num_samples: int, length: int, shift: int) -> int:
    if num_samples < length:
        return 0
    return 1 + (num_samples - length) // shift


def compute_num_frames_pad(num_samples: int, shift: int) -> int:
    return (num_samples + shift // 2) // shift


#################################################
# JAX compute functions
#################################################


def _jnp():
    import jax.numpy as jnp

    return jnp


def frame_signal(x, frame_samples: int, frame_shift_samples: int, snip_edges: bool = False):
    """
    Partition (B, N) waveforms into overlapping frames (B, T, frame_samples).
    snip_edges=False applies symmetric padding matching the reference
    (layers.py:744-764: flipped-edge concatenation).
    """
    import jax.numpy as jnp

    B, N = x.shape
    if snip_edges:
        num_frames = compute_num_frames_snip(N, frame_samples, frame_shift_samples)
        padded = x
    else:
        num_frames = compute_num_frames_pad(N, frame_shift_samples)
        new_num_samples = (num_frames - 1) * frame_shift_samples + frame_samples
        npad = new_num_samples - N
        npad_left = (frame_samples - frame_shift_samples) // 2
        npad_right = npad - npad_left
        if npad_right >= 0:
            padded = jnp.pad(x, ((0, 0), (npad_left, npad_right)), mode="symmetric")
        else:
            padded = jnp.pad(x, ((0, 0), (npad_left, 0)), mode="symmetric")
            padded = padded[:, :new_num_samples]
    starts = jnp.arange(num_frames) * frame_shift_samples
    idx = starts[:, None] + jnp.arange(frame_samples)[None, :]
    return padded[:, idx]


def frame_log_energy(frames, energy_floor: float = EPSILON):
    """Raw log energy per frame (after DC removal): log(sum(x^2) + 1e-15),
    floored at log(energy_floor) (reference layers.py:859)."""
    import jax.numpy as jnp

    log_energy = jnp.log(jnp.sum(frames**2, axis=-1) + 1e-15)
    if energy_floor > 0.0:
        log_energy = jnp.maximum(log_energy, math.log(energy_floor))
    return log_energy


def _highest():
    from jax import lax

    return lax.Precision.HIGHEST


def power_spectrum_gemm(frames, Mc, Ms, use_fft_mag: bool = False):
    """Power (or magnitude) spectrum via the folded-GEMM NDFT formulation."""
    import jax.numpy as jnp

    re = jnp.matmul(frames, Mc, precision=_highest())
    im = jnp.matmul(frames, Ms, precision=_highest())
    pow_spec = re * re + im * im
    if use_fft_mag:
        pow_spec = jnp.sqrt(pow_spec)
    return pow_spec


def power_spectrum_rfft(
    frames, fft_length: int, window, remove_dc_offset: bool = True, preemph_coeff: float = 0.97,
    use_fft_mag: bool = False):
    """Reference-style explicit path: per-frame ops + rFFT (for validation and
    platforms where FFT wins)."""
    import jax.numpy as jnp

    x = frames
    if remove_dc_offset:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
    if preemph_coeff != 0.0:
        prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
        x = x - preemph_coeff * prev
    x = x * window
    X = jnp.fft.rfft(x, n=fft_length, axis=-1)
    pow_spec = jnp.abs(X) ** 2 if not use_fft_mag else jnp.abs(X)
    return pow_spec


def mel_fbank_from_power(pow_spec, fb):
    """Mel GEMM + eps-floored log."""
    import jax.numpy as jnp

    out = jnp.matmul(pow_spec, fb, precision=_highest())
    return jnp.log(jnp.maximum(out, FLT_EPS))


def mfcc_from_logmel(logmel, dct, lifter):
    import jax.numpy as jnp

    out = jnp.matmul(logmel, dct, precision=_highest())
    if lifter is not None:
        out = out * lifter
    return out
