"""
Kaldi-compatible feature extraction layers (JAX-backed, batch-first).

API mirrors the reference torch modules
(`/root/reference/lhotse/features/kaldi/layers.py`): ``Wav2Win`` (:59),
``Wav2FFT`` (:227), ``Wav2Spec``/``Wav2LogSpec`` (:336,405),
``Wav2LogFilterBank`` (:476), ``Wav2MFCC`` (:581), incl. the streaming
``online_inference`` API with waveform remainder passing (:199,775).
Instances are plain callables on numpy/JAX arrays of shape
``(batch, num_samples)``; the compute is jitted per input shape and to bound
recompilation, callers should use the shape-bucketed entry points in
:class:`lhotse_tpu.features.kaldi.extractors.Fbank` etc.

The heavy math lives in :mod:`lhotse_tpu.ops.fbank` (folded-GEMM NDFT
formulation mapping onto the TPU MXU) and optionally the fused Pallas kernel
in :mod:`lhotse_tpu.ops.fbank_pallas`.
"""
from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

from lhotse_tpu.ops import fbank as ops
from lhotse_tpu.ops.fbank import (
    EPSILON, available_windows, create_frame_window, create_mel_scale, get_mel_banks, lin2mel,
    mel2lin, next_power_of_2)
from lhotse_tpu.utils import Seconds

__all__ = [
    "Wav2Win", "Wav2FFT", "Wav2Spec", "Wav2LogSpec", "Wav2LogFilterBank", "Wav2MFCC",
    "available_windows", "create_frame_window", "create_mel_scale", "get_mel_banks", "lin2mel",
    "mel2lin", "next_power_of_2"]


def _as_jax_batch(x):
    import jax.numpy as jnp

    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    return x


def _get_strided_batch_streaming(
    waveform: np.ndarray, window_shift: int, window_length: int,
    prev_remainder: Optional[np.ndarray] = None, snip_edges: bool = False):
    """
    Streaming framing: accepts optional leftover samples from the previous
    call, returns (frames, remainder). Reference: layers.py:775-856.
    """
    assert window_shift <= window_length
    assert waveform.ndim == 2
    batch_size = waveform.shape[0]
    if prev_remainder is None:
        if not snip_edges:
            npad_left = (window_length - window_shift) // 2
            pad_left = waveform[:, :npad_left][:, ::-1]
            waveform = np.concatenate([pad_left, waveform], axis=1)
    else:
        assert prev_remainder.ndim == 2
        assert prev_remainder.shape[0] == batch_size
        waveform = np.concatenate([prev_remainder, waveform], axis=1)

    num_samples = waveform.shape[-1]
    if snip_edges:
        if num_samples < window_length:
            return np.empty((batch_size, 0, 0), dtype=waveform.dtype), waveform
        num_frames = 1 + (num_samples - window_length) // window_shift
    else:
        window_remainder = window_length - window_shift
        num_frames = (num_samples - window_remainder) // window_shift
    remainder = waveform[:, num_frames * window_shift :]
    starts = np.arange(num_frames) * window_shift
    idx = starts[:, None] + np.arange(window_length)[None, :]
    return waveform[:, idx], remainder


class Wav2Win:
    """
    Dithering, DC-offset removal, pre-emphasis, windowing, and partitioning
    into overlapping frames of audio samples — output is still time-domain,
    shape ``(batch, num_frames, window_length)`` (+ optional log-energy).
    """

    def __init__(
        self, sampling_rate: int = 16000, frame_length: Seconds = 0.025,
        frame_shift: Seconds = 0.01, pad_length: Optional[int] = None,
        remove_dc_offset: bool = True, preemph_coeff: float = 0.97, window_type: str = "povey",
        dither: float = 0.0, snip_edges: bool = False, energy_floor: float = EPSILON,
        raw_energy: bool = True, return_log_energy: bool = False) -> None:
        self.sampling_rate = sampling_rate
        self.frame_length = frame_length
        self.frame_shift = frame_shift
        self.remove_dc_offset = remove_dc_offset
        self.preemph_coeff = preemph_coeff
        self.window_type = window_type
        self.dither = dither
        self.snip_edges = snip_edges
        self.energy_floor = energy_floor
        self.raw_energy = raw_energy
        self.return_log_energy = return_log_energy
        if snip_edges:
            import warnings

            warnings.warn(
                "Setting snip_edges=True is generally incompatible with this library "
                "-- you might experience mismatched duration/num_frames errors."
            )
        N = int(math.floor(frame_length * sampling_rate))
        self._length = N
        self._shift = int(math.floor(frame_shift * sampling_rate))
        self._window = create_frame_window(N, window_type=window_type).astype(np.float32)
        self.pad_length = N if pad_length is None else pad_length
        assert self.pad_length >= N, (
            f"pad_length (or fft_length) = {pad_length} cannot be smaller than N = {N}"
        )

    def __repr__(self):
        return (
            f"{type(self).__name__}(sampling_rate={self.sampling_rate}, "
            f"frame_length={self.frame_length}, frame_shift={self.frame_shift}, "
            f"pad_length={self.pad_length}, remove_dc_offset={self.remove_dc_offset}, "
            f"preemph_coeff={self.preemph_coeff}, window_type={self.window_type} "
            f"dither={self.dither}, snip_edges={self.snip_edges}, "
            f"energy_floor={self.energy_floor}, raw_energy={self.raw_energy}, "
            f"return_log_energy={self.return_log_energy})"
        )

    def _maybe_dither(self, x):
        if self.dither != 0.0:
            import jax

            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
            return x + self.dither * jax.random.normal(key, x.shape, dtype=x.dtype)
        return x

    def _forward_strided(self, x_strided):
        import jax.numpy as jnp

        if self.remove_dc_offset:
            mu = jnp.mean(x_strided, axis=2, keepdims=True)
            x_strided = x_strided - mu
        log_energy = None
        if self.return_log_energy and self.raw_energy:
            log_energy = ops.frame_log_energy(x_strided, self.energy_floor)
        if self.preemph_coeff != 0.0:
            prev = jnp.concatenate([x_strided[..., :1], x_strided[..., :-1]], axis=-1)
            x_strided = x_strided - self.preemph_coeff * prev
        x_strided = x_strided * self._window
        if self.pad_length != self._length:
            pad = self.pad_length - self._length
            x_strided = jnp.pad(x_strided, ((0, 0), (0, 0), (0, pad)))
        if self.return_log_energy and not self.raw_energy:
            log_energy = ops.frame_log_energy(x_strided, self.energy_floor)
        return x_strided, log_energy

    def forward(self, x):
        x = _as_jax_batch(x)
        x = self._maybe_dither(x)
        x_strided = ops.frame_signal(x, self._length, self._shift, self.snip_edges)
        return self._forward_strided(x_strided)

    __call__ = forward

    def online_inference(self, x, context=None):
        """Streaming variant: returns ``((frames, log_energy), remainder)``."""
        x = np.asarray(x, dtype=np.float32)
        if self.dither != 0.0:
            x = x + self.dither * np.random.randn(*x.shape).astype(np.float32)
        x_strided, remainder = _get_strided_batch_streaming(
            x, window_shift=self._shift, window_length=self._length, prev_remainder=context,
            snip_edges=self.snip_edges)
        import jax.numpy as jnp

        x_strided, log_energy = self._forward_strided(jnp.asarray(x_strided))
        return (x_strided, log_energy), remainder


class Wav2FFT:
    """
    Preprocess waveforms and compute their STFT; output is complex64 of shape
    ``(batch, num_frames, num_fft_bins)``. When ``use_energy``, bin 0 is
    replaced with the frame log-energy.
    """

    def __init__(
        self, sampling_rate: int = 16000, frame_length: Seconds = 0.025,
        frame_shift: Seconds = 0.01, round_to_power_of_two: bool = True,
        remove_dc_offset: bool = True, preemph_coeff: float = 0.97, window_type: str = "povey",
        dither: float = 0.0, snip_edges: bool = False, energy_floor: float = EPSILON,
        raw_energy: bool = True, use_energy: bool = True) -> None:
        self.use_energy = use_energy
        N = int(math.floor(frame_length * sampling_rate))
        self.fft_length = next_power_of_2(N) if round_to_power_of_two else N
        self.wav2win = Wav2Win(
            sampling_rate, frame_length, frame_shift, pad_length=self.fft_length,
            remove_dc_offset=remove_dc_offset, preemph_coeff=preemph_coeff, window_type=window_type,
            dither=dither, snip_edges=snip_edges, energy_floor=energy_floor, raw_energy=raw_energy,
            return_log_energy=use_energy)

    @property
    def sampling_rate(self) -> int:
        return self.wav2win.sampling_rate

    @property
    def frame_length(self) -> Seconds:
        return self.wav2win.frame_length

    @property
    def frame_shift(self) -> Seconds:
        return self.wav2win.frame_shift

    @property
    def remove_dc_offset(self) -> bool:
        return self.wav2win.remove_dc_offset

    @property
    def preemph_coeff(self) -> float:
        return self.wav2win.preemph_coeff

    @property
    def window_type(self) -> str:
        return self.wav2win.window_type

    @property
    def dither(self) -> float:
        return self.wav2win.dither

    def _forward_strided(self, x_strided, log_e):
        import jax.numpy as jnp

        X = jnp.fft.rfft(x_strided, axis=-1)
        if self.use_energy and log_e is not None:
            X = X.at[:, :, 0].set(log_e)
        return X

    def forward(self, x):
        x_strided, log_e = self.wav2win(x)
        return self._forward_strided(x_strided, log_e)

    __call__ = forward

    def online_inference(self, x, context=None):
        (x_strided, log_e), remainder = self.wav2win.online_inference(x, context=context)
        return self._forward_strided(x_strided, log_e), remainder


class Wav2Spec(Wav2FFT):
    """STFT magnitude (``use_fft_mag=True``) or power spectrum."""

    def __init__(
        self, sampling_rate: int = 16000, frame_length: Seconds = 0.025,
        frame_shift: Seconds = 0.01, round_to_power_of_two: bool = True,
        remove_dc_offset: bool = True, preemph_coeff: float = 0.97, window_type: str = "povey",
        dither: float = 0.0, snip_edges: bool = False, energy_floor: float = EPSILON,
        raw_energy: bool = True, use_energy: bool = True, use_fft_mag: bool = False) -> None:
        super().__init__(
            sampling_rate, frame_length, frame_shift, round_to_power_of_two=round_to_power_of_two,
            remove_dc_offset=remove_dc_offset, preemph_coeff=preemph_coeff, window_type=window_type,
            dither=dither, snip_edges=snip_edges, energy_floor=energy_floor, raw_energy=raw_energy,
            use_energy=use_energy)
        self.use_fft_mag = use_fft_mag

    def _forward_strided(self, x_strided, log_e):
        import jax.numpy as jnp

        # DFT-as-GEMM (MXU path): frames are already preprocessed + padded to
        # fft_length, so the plain cos/sin matrices apply.
        C, S = ops.raw_dft_matrices(self.fft_length, self.fft_length)
        pow_spec = ops.power_spectrum_gemm(
            x_strided, jnp.asarray(C), jnp.asarray(S), use_fft_mag=self.use_fft_mag)
        if self.use_energy and log_e is not None:
            pow_spec = pow_spec.at[:, :, 0].set(log_e)
        return pow_spec


class Wav2LogSpec(Wav2Spec):
    """Log-magnitude or log-power spectrum (log(spec + 1e-15))."""

    def _forward_strided(self, x_strided, log_e):
        import jax.numpy as jnp

        C, S = ops.raw_dft_matrices(self.fft_length, self.fft_length)
        pow_spec = ops.power_spectrum_gemm(
            x_strided, jnp.asarray(C), jnp.asarray(S), use_fft_mag=self.use_fft_mag)
        pow_spec = jnp.log(pow_spec + 1e-15)
        if self.use_energy and log_e is not None:
            pow_spec = pow_spec.at[:, :, 0].set(log_e)
        return pow_spec


class _MelBase(Wav2FFT):
    """Shared mel-filterbank construction for fbank/MFCC layers."""

    def _build_fb(
        self, num_filters: int, sampling_rate: int, low_freq: float, high_freq: float,
        norm_filters: bool, torchaudio_compatible_mel_scale: bool) -> np.ndarray:
        if torchaudio_compatible_mel_scale:
            fb, _ = get_mel_banks(
                num_bins=num_filters, window_length_padded=self.fft_length,
                sample_freq=sampling_rate, low_freq=low_freq, high_freq=high_freq)
            # Zero-pad the nyquist bin column and transpose to (bins, filters).
            fb = np.pad(fb, ((0, 0), (0, 1))).T
        else:
            fb = create_mel_scale(
                num_filters=num_filters, fft_length=self.fft_length, sampling_rate=sampling_rate,
                low_freq=low_freq, high_freq=high_freq, norm_filters=norm_filters)
        return fb.astype(np.float32)


    def _fused_matrices(self):
        """(Mc, Ms, fb_lane_padded, n_mels) for the fused Pallas TPU kernel
        when this layer's configuration maps onto it, else None; cached.
        ``fb`` is zero-padded to a 128-multiple of output lanes (narrow
        kernel output blocks compile pathologically in Mosaic); callers
        slice the log-mel back to ``n_mels`` columns."""
        if not hasattr(self, "_fused_cache"):
            mats = None
            w = self.wav2win
            fb = np.asarray(self._fb, dtype=np.float32)
            if (
                w._length == 400
                and w._shift == 160
                and self.fft_length == 512
                and not self.use_energy
                and not self.use_fft_mag
                and fb.shape[0] == 257
                and not fb[256].any()
            ):
                Mc, Ms = ops.dft_analysis_matrices(
                    w._length, self.fft_length, window_type=w.window_type,
                    remove_dc_offset=w.remove_dc_offset, preemph_coeff=w.preemph_coeff)
                n_mels = fb.shape[1]
                if n_mels % 128 not in (0, 80):  # 80 is a known-good width
                    fb = np.pad(fb, ((0, 0), (0, 128 - n_mels % 128)))
                mats = (Mc, Ms, fb, n_mels)
            self._fused_cache = mats
        return self._fused_cache

    def _fused_logmel(self, x):
        """Log-mel via the fused Pallas kernel, or None when the config does
        not map onto it or the kernel cannot lower on this backend (callers
        fall back to the GEMM path)."""
        from lhotse_tpu.ops.fbank_pallas import fbank_fused_padded, use_pallas_default

        mats = self._fused_matrices() if use_pallas_default() else None
        if mats is None:
            return None
        Mc, Ms, fb, n_mels = mats
        # Dithering applies to the raw waveform exactly as in Wav2Win.forward;
        # DC-removal/pre-emphasis/window are folded into the analysis matrices.
        dithered = self.wav2win._maybe_dither(x)
        try:
            logmel = fbank_fused_padded(
                dithered, Mc, Ms, fb, snip_edges=self.wav2win.snip_edges)
        except Exception:
            return None  # e.g. Mosaic lowering unavailable on this toolchain
        return logmel[..., :n_mels] if logmel.shape[-1] != n_mels else logmel


class Wav2LogFilterBank(_MelBase):
    """
    Log-Mel filterbank energies ("fbank"): shape (batch, num_frames,
    num_filters); with ``use_energy`` the log-energy is prepended as an extra
    first column.
    """

    def __init__(
        self, sampling_rate: int = 16000, frame_length: Seconds = 0.025,
        frame_shift: Seconds = 0.01, round_to_power_of_two: bool = True,
        remove_dc_offset: bool = True, preemph_coeff: float = 0.97, window_type: str = "povey",
        dither: float = 0.0, snip_edges: bool = False, energy_floor: float = EPSILON,
        raw_energy: bool = True, use_energy: bool = False, use_fft_mag: bool = False,
        low_freq: float = 20.0, high_freq: float = -400.0, num_filters: int = 80,
        norm_filters: bool = False, torchaudio_compatible_mel_scale: bool = True):
        super().__init__(
            sampling_rate, frame_length, frame_shift, round_to_power_of_two=round_to_power_of_two,
            remove_dc_offset=remove_dc_offset, preemph_coeff=preemph_coeff, window_type=window_type,
            dither=dither, snip_edges=snip_edges, energy_floor=energy_floor, raw_energy=raw_energy,
            use_energy=use_energy)
        self.use_fft_mag = use_fft_mag
        self.low_freq = low_freq
        self.high_freq = high_freq
        self.num_filters = num_filters
        self.norm_filters = norm_filters
        self._fb = self._build_fb(
            num_filters, sampling_rate, low_freq, high_freq, norm_filters,
            torchaudio_compatible_mel_scale)

    def _forward_strided(self, x_strided, log_e):
        import jax.numpy as jnp

        C, S = ops.raw_dft_matrices(self.fft_length, self.fft_length)
        pow_spec = ops.power_spectrum_gemm(
            x_strided, jnp.asarray(C), jnp.asarray(S), use_fft_mag=self.use_fft_mag)
        pow_spec = ops.mel_fbank_from_power(pow_spec, jnp.asarray(self._fb))
        if self.use_energy and log_e is not None:
            pow_spec = jnp.concatenate([log_e[..., None], pow_spec], axis=-1)
        return pow_spec

    def forward(self, x):
        x = _as_jax_batch(x)
        logmel = self._fused_logmel(x)
        return logmel if logmel is not None else super().forward(x)

    __call__ = forward


class Wav2MFCC(_MelBase):
    """Mel-frequency cepstral coefficients: (batch, num_frames, num_ceps)."""

    def __init__(
        self, sampling_rate: int = 16000, frame_length: Seconds = 0.025,
        frame_shift: Seconds = 0.01, round_to_power_of_two: bool = True,
        remove_dc_offset: bool = True, preemph_coeff: float = 0.97, window_type: str = "povey",
        dither: float = 0.0, snip_edges: bool = False, energy_floor: float = EPSILON,
        raw_energy: bool = True, use_energy: bool = False, use_fft_mag: bool = False,
        low_freq: float = 20.0, high_freq: float = -400.0, num_filters: int = 23,
        norm_filters: bool = False, num_ceps: int = 13, cepstral_lifter: int = 22,
        torchaudio_compatible_mel_scale: bool = True):
        super().__init__(
            sampling_rate, frame_length, frame_shift, round_to_power_of_two=round_to_power_of_two,
            remove_dc_offset=remove_dc_offset, preemph_coeff=preemph_coeff, window_type=window_type,
            dither=dither, snip_edges=snip_edges, energy_floor=energy_floor, raw_energy=raw_energy,
            use_energy=use_energy)
        self.use_fft_mag = use_fft_mag
        self.low_freq = low_freq
        self.high_freq = high_freq
        self.num_filters = num_filters
        self.norm_filters = norm_filters
        self.num_ceps = num_ceps
        self.cepstral_lifter = cepstral_lifter
        self._fb = self._build_fb(
            num_filters, sampling_rate, low_freq, high_freq, norm_filters,
            torchaudio_compatible_mel_scale)
        self._dct = ops.make_dct_matrix(num_ceps, num_filters).astype(np.float32)
        self._lifter = (
            ops.make_lifter(num_ceps, cepstral_lifter).astype(np.float32)
            if cepstral_lifter > 0
            else None
        )

    @staticmethod
    def make_lifter(N: int, Q: int):
        return ops.make_lifter(N, Q)

    @staticmethod
    def make_dct_matrix(num_ceps: int, num_filters: int):
        return ops.make_dct_matrix(num_ceps, num_filters)

    def _forward_strided(self, x_strided, log_e):
        import jax.numpy as jnp

        C, S = ops.raw_dft_matrices(self.fft_length, self.fft_length)
        pow_spec = ops.power_spectrum_gemm(
            x_strided, jnp.asarray(C), jnp.asarray(S), use_fft_mag=self.use_fft_mag)
        logmel = ops.mel_fbank_from_power(pow_spec, jnp.asarray(self._fb))
        mfcc = ops.mfcc_from_logmel(
            logmel, jnp.asarray(self._dct),
            jnp.asarray(self._lifter) if self._lifter is not None else None)
        if self.use_energy and log_e is not None:
            mfcc = mfcc.at[..., 0].set(log_e)
        return mfcc

    def forward(self, x):
        import jax.numpy as jnp

        x = _as_jax_batch(x)
        logmel = self._fused_logmel(x)
        if logmel is None:
            return super().forward(x)
        # Fused Pallas log-mel, then the tiny DCT + lifter matmuls in XLA.
        return ops.mfcc_from_logmel(
            logmel, jnp.asarray(self._dct),
            jnp.asarray(self._lifter) if self._lifter is not None else None)

    __call__ = forward
