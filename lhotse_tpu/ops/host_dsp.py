"""
ctypes bindings for the fused host-side DSP kernels
(`native/dsp/dsp_kernels.c`), compiled on first use like the FLAC codec.

These back the pure-numpy extractor path on CPU workers: `frame_prep` fuses
framing + DC removal + pre-emphasis + windowing + f32->f64 widening into one
pass (semantics: reference lhotse/features/kaldi/layers.py:727-772), and
`scale_i32_to_f32` normalizes decoder PCM output in one pass. Both are
optional accelerations — callers keep a numpy fallback for environments
without a C compiler.
"""
from __future__ import annotations

import ctypes
import math
import threading
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_FAILED = False
_LIB_LOCK = threading.Lock()


def _get_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            from lhotse_tpu.native_build import build_native

            lib = build_native("dsp", "dsp_kernels.c", extra_link=["-lm"])
        except Exception:
            _LIB_FAILED = True  # no compiler in this env: callers fall back
            return None
        lib.frame_prep.restype = None
        lib.frame_prep.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
            ctypes.c_int, ctypes.c_longlong, ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        lib.scale_i32_to_f32.restype = None
        lib.scale_i32_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float)]
        lib.power_spectrum_c128.restype = None
        lib.power_spectrum_c128.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double)]
        lib.magnitude_c128.restype = None
        lib.magnitude_c128.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double)]
        lib.frame_prep_f32.restype = None
        lib.frame_prep_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
            ctypes.c_int, ctypes.c_longlong, ctypes.POINTER(ctypes.c_float),
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        lib.power_spectrum_c64.restype = None
        lib.power_spectrum_c64.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float)]
        lib.magnitude_c64.restype = None
        lib.magnitude_c64.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float)]
        lib.sinc_resample_f32.restype = None
        lib.sinc_resample_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        try:
            lib.fbank_fused_f32.restype = ctypes.c_int
            lib.fbank_fused_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_float),
                ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_float,
                ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_double)]
        except AttributeError:
            # Stale cached .so predating the fused kernel: binding absent,
            # fbank_fused() reports unavailable and callers fall back.
            lib.fbank_fused_f32 = None
        try:
            lib.adpcm4_encode_f32.restype = None
            lib.adpcm4_encode_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_ubyte)]
            lib.mulaw_encode_lut_f32.restype = None
            lib.mulaw_encode_lut_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte)]
        except AttributeError:
            lib.adpcm4_encode_f32 = None
            lib.mulaw_encode_lut_f32 = None
        _LIB = lib
        return _LIB


def is_available() -> bool:
    return _get_lib() is not None


def frame_prep(
    x: np.ndarray,
    length: int,
    shift: int,
    n_frames: int,
    window: np.ndarray,
    fft_length: int,
    preemph_coeff: float = 0.0,
    remove_dc: bool = False,
    want_energy: bool = False,
    energy_floor: float = 0.0,
    dtype=np.float64,
    out: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """
    Fused framing for one item: float32 samples -> (n_frames, fft_length)
    windowed frames in ``dtype`` (float64 or float32; zero-padded past
    ``length``) plus optional per-frame log energies (always float64).
    ``out`` may supply a preallocated C-contiguous destination (e.g. a row
    block of a batch buffer). Returns None when the native library is
    unavailable (caller must fall back to numpy).
    """
    lib = _get_lib()
    if lib is None:
        return None
    dtype = np.dtype(dtype)
    x = np.ascontiguousarray(x, dtype=np.float32)
    window = np.ascontiguousarray(window, dtype=dtype)
    assert window.shape[0] == length and fft_length >= length
    assert x.shape[-1] >= (n_frames - 1) * shift + length
    if out is None:
        out = np.empty((n_frames, fft_length), dtype=dtype)
    else:
        assert (
            out.dtype == dtype
            and out.flags.c_contiguous
            and out.shape == (n_frames, fft_length)
        )
    log_e = np.empty(n_frames, dtype=np.float64) if want_energy else None
    floor_log = math.log(energy_floor) if energy_floor > 0.0 else -math.inf
    fn = lib.frame_prep if dtype == np.float64 else lib.frame_prep_f32
    ptr_t = ctypes.c_double if dtype == np.float64 else ctypes.c_float
    fn(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[-1], length, shift, n_frames,
        window.ctypes.data_as(ctypes.POINTER(ptr_t)),
        float(preemph_coeff), int(remove_dc), int(want_energy), floor_log,
        out.ctypes.data_as(ctypes.POINTER(ptr_t)), fft_length,
        log_e.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if want_energy
        else ctypes.POINTER(ctypes.c_double)(),
    )
    return out, log_e


def power_spectrum(spec: np.ndarray, magnitude: bool = False) -> Optional[np.ndarray]:
    """``|spec|^2`` (or ``|spec|``) of a complex128/complex64 array in one
    fused pass. Returns None when the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    if spec.dtype == np.complex64:
        spec = np.ascontiguousarray(spec)
        out = np.empty(spec.shape, dtype=np.float32)
        fn = lib.magnitude_c64 if magnitude else lib.power_spectrum_c64
        fn(spec.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), spec.size,
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    spec = np.ascontiguousarray(spec, dtype=np.complex128)
    out = np.empty(spec.shape, dtype=np.float64)
    fn = lib.magnitude_c128 if magnitude else lib.power_spectrum_c128
    fn(spec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), spec.size,
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def sinc_resample(
    padded: np.ndarray, num_blocks: int, kernel: np.ndarray, orig: int
) -> Optional[np.ndarray]:
    """
    Polyphase resample of one already-padded float32 waveform with a
    (phases, K) float32 kernel; returns the raw (num_blocks * phases,)
    output (caller trims), or None when the native library is unavailable.
    """
    lib = _get_lib()
    if lib is None:
        return None
    padded = np.ascontiguousarray(padded, dtype=np.float32)
    kernel = np.ascontiguousarray(kernel, dtype=np.float32)
    phases, K = kernel.shape
    assert padded.shape[-1] >= (num_blocks - 1) * orig + K
    out = np.empty(num_blocks * phases, dtype=np.float32)
    lib.sinc_resample_f32(
        padded.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_blocks,
        kernel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), phases, K, orig,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def fbank_fused(
    prepared: np.ndarray,
    length: int,
    shift: int,
    n_frames: int,
    window: np.ndarray,
    preemph_coeff: float,
    remove_dc: bool,
    fft_length: int,
    use_mag: bool,
    mel_t: np.ndarray,
    mel_lo: np.ndarray,
    mel_hi: np.ndarray,
    log_floor: float,
    want_energy: bool = False,
    energy_floor: float = 0.0,
    pad_left: int = 0,
    out: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """
    One-call log-mel filterbank for a single float32 waveform: fused framing
    + DC/pre-emphasis/window + SIMD real FFT + power/magnitude + sparse mel
    + clamp + log (native kernel ``fbank_fused_f32``). ``mel_t`` is the
    (n_mels, n_bins) transposed mel matrix with per-row support bounds
    ``mel_lo``/``mel_hi``. With ``pad_left == 0`` the input is framed as-is
    (already edge-padded, or snip-edges); with ``pad_left > 0`` the kernel
    applies the snip_edges=False symmetric reflect padding VIRTUALLY —
    boundary frames read through the reflect map, interior frames read the
    raw buffer directly, and the caller skips materializing a padded copy.
    ``out`` may supply a preallocated C-contiguous (n_frames, n_mels) f32
    destination (e.g. a row block of a padded batch buffer) so the kernel
    writes features in place with no intermediate allocation.
    Returns ``(logmel (n_frames, n_mels) f32, log_energy or None)``, or
    None when the native kernel is unavailable or the configuration falls
    outside its envelope (caller must fall back).
    """
    lib = _get_lib()
    if lib is None or getattr(lib, "fbank_fused_f32", None) is None:
        return None
    x = np.ascontiguousarray(prepared, dtype=np.float32)
    window = np.ascontiguousarray(window, dtype=np.float32)
    mel_t = np.ascontiguousarray(mel_t, dtype=np.float32)
    mel_lo = np.ascontiguousarray(mel_lo, dtype=np.int32)
    mel_hi = np.ascontiguousarray(mel_hi, dtype=np.int32)
    n_mels = mel_t.shape[0]
    assert mel_t.shape[1] == fft_length // 2 + 1
    assert window.shape[0] == length
    if pad_left == 0:
        assert x.shape[-1] >= (n_frames - 1) * shift + length
    if out is None:
        out = np.empty((n_frames, n_mels), dtype=np.float32)
    else:
        assert (
            out.dtype == np.float32
            and out.flags.c_contiguous
            and out.shape == (n_frames, n_mels)
        )
    log_e = np.empty(n_frames, dtype=np.float64) if want_energy else None
    floor_log = math.log(energy_floor) if energy_floor > 0.0 else -math.inf
    rc = lib.fbank_fused_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[-1],
        int(pad_left), length, shift, n_frames,
        window.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        float(preemph_coeff), int(remove_dc), int(fft_length), int(use_mag),
        mel_t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mel_lo.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mel_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_mels, float(log_floor), int(want_energy), floor_log,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        log_e.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if want_energy
        else ctypes.POINTER(ctypes.c_double)(),
    )
    if rc != 0:
        return None
    return out, log_e


def adpcm4_encode(x: np.ndarray, num_samples: int, width: int) -> Optional[np.ndarray]:
    """Native 4-bit block-ADPCM encode of float32 ``(N, T)`` rows into
    ``(N, width)`` uint8 wire rows (bit-exact vs the numpy reference encoder
    in ops/wire.py). None when the native library is unavailable."""
    lib = _get_lib()
    if lib is None or getattr(lib, "adpcm4_encode_f32", None) is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    out = np.empty((*x.shape[:-1], width), dtype=np.uint8)
    lib.adpcm4_encode_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_rows,
        num_samples, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out


def mulaw_encode_lut(x: np.ndarray, lut: np.ndarray) -> Optional[np.ndarray]:
    """Native one-pass mu-law encode via a caller-built 65536-entry LUT.
    None when the native library is unavailable."""
    lib = _get_lib()
    if lib is None or getattr(lib, "mulaw_encode_lut_f32", None) is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    lut = np.ascontiguousarray(lut, dtype=np.uint8)
    assert lut.size == 65536
    out = np.empty(x.shape, dtype=np.uint8)
    lib.mulaw_encode_lut_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size,
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out


def scale_i32_to_f32(pcm: np.ndarray, scale: float) -> Optional[np.ndarray]:
    """One-pass ``pcm.astype(f32) * scale``; None if the library is missing."""
    lib = _get_lib()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, dtype=np.int32)
    out = np.empty(pcm.shape, dtype=np.float32)
    lib.scale_i32_to_f32(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), pcm.size,
        float(scale), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
