"""
Kaldi-compatible feature extractors: Fbank, Mfcc, Spectrogram, LogSpectrogram.

API + configs mirror the reference (`/root/reference/lhotse/features/kaldi/
extractors.py`): FbankConfig defaults (:24-44) — 16 kHz, 25 ms / 10 ms,
dither 0, snip_edges False, 80 filters; feature-domain mix for Fbank is
``log(max(EPS, e^a + k*e^b))`` (:130-147); true batched ``extract_batch``
(pad → one forward → slice per-item frame counts, :485-554).

TPU-first implementation: the batched path pads inputs into shape buckets
(bounded XLA recompilation), frames on-device, and computes the spectrum via
the folded-GEMM NDFT formulation (:mod:`lhotse_tpu.ops.fbank`) — two MXU
GEMMs + mel GEMM + log, optionally as one fused Pallas kernel
(:mod:`lhotse_tpu.ops.fbank_pallas`, enabled via ``use_pallas=True`` or the
``LHOTSE_TPU_FBANK_PALLAS=1`` env var on TPU backends).
"""
from __future__ import annotations

import math
import os
import warnings
from dataclasses import asdict, dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

try:  # pocketfft via scipy is ~4x numpy.fft for batched float32 rffts
    from scipy.fft import rfft as _host_rfft
except ImportError:  # pragma: no cover
    _host_rfft = np.fft.rfft

from lhotse_tpu.features.base import FeatureExtractor, register_extractor
from lhotse_tpu.features.kaldi.layers import (Wav2LogFilterBank, Wav2LogSpec, Wav2MFCC, Wav2Spec)
from lhotse_tpu.ops import fbank as ops
from lhotse_tpu.ops import host_dsp
from lhotse_tpu.utils import (EPSILON, Seconds, asdict_nonull, compute_num_frames_from_samples)

# Pad waveform lengths up to multiples of this many frames' worth of samples
# so that each (batch_bucket, length_bucket) pair compiles exactly once.
LENGTH_BUCKET_FRAMES = 100


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def _host_fft_dtype():
    """float32 (default) or float64 via LHOTSE_TPU_HOST_FFT_DTYPE."""
    import os

    return (
        np.float64
        if os.environ.get("LHOTSE_TPU_HOST_FFT_DTYPE") == "float64"
        else np.float32
    )


def _batch_bucket(b: int) -> int:
    return 1 << (b - 1).bit_length() if b > 1 else 1


from lhotse_tpu.ops.fbank_pallas import use_pallas_default  # noqa: E402


class _KaldiExtractorBase(FeatureExtractor):
    """
    Shared fast path: jitted, shape-bucketed batched extraction using the
    GEMM-NDFT spectrum. Subclasses provide ``_postprocess`` (mel/log/DCT) and
    the layer object used for the reference-parity single-item path.

    Bucketed padding is parity-safe: the snip_edges=False symmetric edge
    padding is applied per item on the host *before* zero-padding to the
    shape bucket, and the device kernel then frames with snip-edges
    semantics — so the frames covering real audio are bit-identical with
    the unpadded computation, and garbage frames are sliced off.
    """

    def __init__(self, config=None):
        super().__init__(config=config)
        self._jit_cache = {}

    # ---- config plumbing ----

    @property
    def device(self) -> str:
        return getattr(self.config, "device", "cpu")

    @property
    def frame_shift(self) -> Seconds:
        return self.config.frame_shift

    @property
    def _frame_samples(self) -> int:
        return int(math.floor(self.config.frame_length * self.config.sampling_rate))

    @property
    def _shift_samples(self) -> int:
        return int(math.floor(self.config.frame_shift * self.config.sampling_rate))

    @property
    def _fft_length(self) -> int:
        n = self._frame_samples
        return ops.next_power_of_2(n) if self.config.round_to_power_of_two else n

    # ---- core batched compute ----

    def _analysis_matrices(self):
        return ops.dft_analysis_matrices(
            self._frame_samples, self._fft_length, window_type=self.config.window_type,
            remove_dc_offset=self.config.remove_dc_offset, preemph_coeff=self.config.preemph_coeff)

    def _pallas_matrices(self):
        """
        Subclass hook: return (Mc, Ms, mel_fb) when the fused Pallas TPU
        kernel (:mod:`lhotse_tpu.ops.fbank_pallas`) covers this extractor's
        configuration, else None (default). ``mel_fb`` may be zero-padded to
        a 128-multiple of columns for Mosaic-friendly output blocks;
        :meth:`_pallas_postprocess` receives the full kernel output.
        """
        return None

    def _pallas_postprocess(self, logmel):
        """Subclass hook: transform the fused kernel's log-mel output into
        this extractor's features (identity for fbank)."""
        return logmel

    def _forward_padded_batch(self, samples: np.ndarray):
        """
        One jitted forward over a padded (B, N) float32 batch; returns a jax
        array (B, T, F). The input is expected to already carry the
        snip_edges=False symmetric padding per item (see
        :meth:`_prepare_item`), so framing here is always snip-edges style.

        On TPU backends (see :func:`use_pallas_default`), Fbank-style
        configurations route through the fused Pallas kernel (~2x the XLA
        GEMM path on-chip: the frames matrix never round-trips HBM); the
        first call falls back to the XLA path if the kernel cannot lower on
        the current toolchain.
        """
        import jax

        fn = self._jit_cache.get("fn")
        if fn is None:
            Mc, Ms = self._analysis_matrices()
            consts = self._postprocess_constants()

            def _run(x):
                frames = ops.frame_signal(
                    x, self._frame_samples, self._shift_samples, snip_edges=True)
                log_e = None
                if getattr(self.config, "use_energy", False):
                    import jax.numpy as jnp

                    centered = frames - jnp.mean(frames, axis=-1, keepdims=True)
                    log_e = ops.frame_log_energy(centered, self.config.energy_floor)
                pow_spec = ops.power_spectrum_gemm(
                    frames, Mc, Ms, use_fft_mag=self.config.use_fft_mag)
                return self._postprocess(pow_spec, log_e, consts)

            fn = jax.jit(_run)
            mats = self._pallas_matrices() if use_pallas_default() else None
            if mats is not None:
                from lhotse_tpu.ops.fbank_pallas import fbank_fused_padded

                pMc, pMs, pfb = mats

                def _run_pallas(x):
                    # The batch already carries the per-item symmetric edge
                    # padding -> snip-edges framing semantics.
                    return self._pallas_postprocess(
                        fbank_fused_padded(x, pMc, pMs, pfb, snip_edges=True))

                pal = jax.jit(_run_pallas)

                def _with_fallback(x, _pal=pal, _xla=fn, _cache=self._jit_cache):
                    try:
                        out = _pal(x)
                        _cache["fn"] = _pal
                        return out
                    except Exception:
                        _cache["fn"] = _xla
                        return _xla(x)

                fn = _with_fallback
            self._jit_cache["fn"] = fn
        return fn(samples)

    # ---- pure-numpy host path ----
    #
    # The jitted GEMM-NDFT path above is built for accelerator backends:
    # folded matrices feed the MXU and shapes are bucketed to bound
    # recompilation. On the *host* (data-pipeline workers decoding and
    # featurizing on CPU) that design inverts: every shape bucket costs an
    # XLA compile per worker process, the padded batch wastes FLOPs, and the
    # folded NDFT does ~10x the arithmetic of an rFFT. So with
    # config.device == "cpu" (the default for ETL) extraction runs this
    # numpy path instead: natural shapes, pocketfft, zero compiles. Parity
    # with the GEMM path is float32-noise only (both implement reference
    # layers.py:727-772 semantics) and is pinned by the golden tests.

    def _numpy_window(self, dtype=np.float64) -> np.ndarray:
        key = f"np_window_{np.dtype(dtype).name}"
        w = self._jit_cache.get(key)
        if w is None:
            w = ops.create_frame_window(
                self._frame_samples, self.config.window_type).astype(dtype)
            self._jit_cache[key] = w
        return w

    def _forward_numpy_item(self, prepared: np.ndarray) -> np.ndarray:
        """(num_samples,) float32 (already edge-padded) -> (T, F) float32."""
        length, shift = self._frame_samples, self._shift_samples
        n_frames = ops.compute_num_frames_snip(prepared.shape[-1], length, shift)
        if n_frames <= 0:
            return np.zeros(
                (0, self.feature_dim(self.config.sampling_rate)), dtype=np.float32)
        fused = self._fused_native_item(prepared, n_frames)
        if fused is not None:
            return fused
        # float32 by default: the (T, n_fft) frame buffer is the dominant
        # memory traffic of this path and the f32 pocketfft rFFT runs 2-6x
        # the f64 one, while the added noise sits at the (float32)
        # reference's own floor — goldens stay within the 2.5e-4 budget.
        # ``LHOTSE_TPU_HOST_FFT_DTYPE=float64`` restores the f64 chain (whose
        # only advantage is suppressing near-cancellation FFT noise, visible
        # in unsmoothed log-spectrograms). The fused native kernel (one pass)
        # is preferred, with an in-place numpy fallback.
        dtype = _host_fft_dtype()
        frames = np.empty((n_frames, self._fft_length), dtype=dtype)
        log_e = self._fill_frames_numpy(prepared, frames, dtype)
        return self._spectrum_and_postprocess(frames, log_e)

    def _fill_frames_numpy(self, prepared, frames, dtype):
        """Frame one padded waveform into the preallocated ``frames`` block
        (native fused kernel, or numpy in-place fallback); returns the
        per-frame log energies when the config wants them."""
        length, shift = self._frame_samples, self._shift_samples
        n_frames = frames.shape[0]
        want_energy = bool(getattr(self.config, "use_energy", False))
        coeff = self.config.preemph_coeff
        native = host_dsp.frame_prep(
            prepared, length, shift, n_frames, self._numpy_window(dtype),
            self._fft_length, preemph_coeff=coeff,
            remove_dc=self.config.remove_dc_offset, want_energy=want_energy,
            energy_floor=self.config.energy_floor if want_energy else 0.0,
            dtype=dtype, out=frames)
        if native is not None:
            return native[1]
        view = np.lib.stride_tricks.sliding_window_view(prepared, length)[
            :: shift
        ][:n_frames]
        frames[:, length:] = 0.0
        work = frames[:, :length]
        work[:] = view  # single pass: f32 gather + widen + zero-pad
        # DC estimate always accumulates in f64 (the native kernel does
        # the same) — an f32 running mean drifts on long frames.
        means = work.mean(axis=-1, dtype=np.float64, keepdims=True).astype(dtype)
        log_e = None
        if want_energy:
            centered = work - means
            log_e = np.log(np.einsum("ij,ij->i", centered, centered) + 1e-15)
            if self.config.energy_floor > 0.0:
                log_e = np.maximum(log_e, math.log(self.config.energy_floor))
        if self.config.remove_dc_offset:
            work -= means
        if coeff != 0.0:
            # x[i] -= c * x[i-1] (x[0] against itself). The rhs temp is
            # materialized before the in-place subtract, so aliasing is
            # safe.
            prev = coeff * work[:, :-1]
            work[:, 1:] -= prev
            work[:, 0] -= coeff * work[:, 0]
        work *= self._numpy_window(dtype)
        return log_e

    def _fused_native_item(self, prepared, n_frames):
        """
        Subclass hook: run the whole item through one native fused kernel
        (framing -> FFT -> spectrum -> projection -> log) and return the
        (n_frames, F) float32 features, or None to use the staged numpy
        path. Default: unsupported.
        """
        return None

    def _fused_native_raw(self, item, n_frames, out=None):
        """
        Like :meth:`_fused_native_item` but takes the RAW (un-edge-padded)
        waveform; the kernel applies the snip_edges=False reflect padding
        virtually, skipping the padded-copy allocation. ``out`` may supply
        a preallocated (n_frames, F) f32 destination. Default: unsupported.
        """
        return None

    def _numpy_item_features(self, item: np.ndarray, out=None) -> np.ndarray:
        """Full host path for one raw waveform: fused native kernel when
        available, else edge-pad + staged numpy pipeline. When ``out`` is a
        preallocated C-contiguous (n_frames, F) f32 view, the fused kernel
        writes in place (the staged fallback copies into it)."""
        n_frames = self._num_frames(item.shape[-1])
        if n_frames <= 0:
            return np.zeros(
                (0, self.feature_dim(self.config.sampling_rate)), dtype=np.float32
            )
        fused = self._fused_native_raw(item, n_frames, out=out)
        if fused is not None:
            return fused
        res = self._forward_numpy_item(self._prepare_item(item))[:n_frames]
        if out is not None and res.shape == out.shape:
            out[...] = res
            return out
        return res

    def _apply_dither(self, samples: np.ndarray) -> np.ndarray:
        """
        Host-side dither: additive Gaussian noise scaled by ``config.dither``
        applied to the waveform before framing (reference semantics:
        lhotse/features/kaldi/layers.py Wav2Win dither-before-frame; drawn
        from the ambient numpy RNG like the layer path's seeding). No-op for
        the default ``dither == 0``.
        """
        d = float(getattr(self.config, "dither", 0.0) or 0.0)
        if d == 0.0:
            return samples
        noise = np.random.standard_normal(samples.shape).astype(np.float32)
        return samples + d * noise

    def _spectrum_and_postprocess(self, frames, log_e):
        spec = _host_rfft(frames, n=self._fft_length, axis=-1)
        pow_spec = host_dsp.power_spectrum(spec, magnitude=self.config.use_fft_mag)
        if pow_spec is None:
            if self.config.use_fft_mag:
                pow_spec = np.abs(spec)
            else:
                pow_spec = spec.real**2 + spec.imag**2
        return self._postprocess_numpy(pow_spec, log_e)


    def _postprocess_numpy(self, pow_spec: np.ndarray, log_e) -> np.ndarray:
        raise NotImplementedError

    def _use_numpy_path(self) -> bool:
        return self.device == "cpu"

    def _num_frames(self, num_samples: int) -> int:
        if self.config.snip_edges:
            return ops.compute_num_frames_snip(
                num_samples, self._frame_samples, self._shift_samples)
        return ops.compute_num_frames_pad(num_samples, self._shift_samples)

    def _prepare_item(self, x: np.ndarray) -> np.ndarray:
        """
        Host-side per-item preparation: apply the snip_edges=False symmetric
        edge padding (reference layers.py:744-764) so the padded batch can be
        framed with snip-edges semantics on device. With snip_edges=True the
        item is returned as-is.
        """
        if self.config.snip_edges:
            return x
        length, shift = self._frame_samples, self._shift_samples
        n = x.shape[-1]
        num_frames = ops.compute_num_frames_pad(n, shift)
        new_num_samples = (num_frames - 1) * shift + length
        npad = new_num_samples - n
        npad_left = (length - shift) // 2
        npad_right = npad - npad_left
        pad_left = x[:npad_left][::-1]
        if npad_right >= 0:
            pad_right = x[n - npad_right :][::-1] if npad_right > 0 else x[:0]
            return np.concatenate([pad_left, x, pad_right])
        return np.concatenate([pad_left, x])[:new_num_samples]

    def _postprocess_constants(self):
        return ()

    def _postprocess(self, pow_spec, log_e, consts):
        raise NotImplementedError

    # ---- public API ----

    def extract(self, samples: np.ndarray, sampling_rate: int) -> np.ndarray:
        assert sampling_rate == self.config.sampling_rate, (
            f"{type(self).__name__} was instantiated for sampling_rate "
            f"{self.config.sampling_rate}, but sampling_rate={sampling_rate} was "
            f"passed to extract(). Use .resample() to change the audio sampling rate."
        )
        samples = np.asarray(samples, dtype=np.float32)
        squeeze = samples.ndim == 1
        if squeeze:
            samples = samples[None, :]
        samples = self._apply_dither(samples)
        num_frames = self._num_frames(samples.shape[1])
        if self._use_numpy_path():
            out = np.stack([self._numpy_item_features(row) for row in samples])
            return out[0] if squeeze or out.shape[0] == 1 else out
        prepared = [self._prepare_item(row) for row in samples]
        n = max(p.shape[-1] for p in prepared)
        padded_n = _round_up(
            max(n, self._frame_samples), self._shift_samples * LENGTH_BUCKET_FRAMES)
        batch = np.zeros((len(prepared), padded_n), dtype=np.float32)
        for i, p in enumerate(prepared):
            batch[i, : p.shape[-1]] = p
        out = np.asarray(self._forward_padded_batch(batch))[:, :num_frames]
        return out[0] if squeeze or out.shape[0] == 1 else out

    def extract_batch(
        self, samples: Union[np.ndarray, Sequence[np.ndarray]], sampling_rate: int,
        lengths: Optional[np.ndarray] = None) -> Union[np.ndarray, List[np.ndarray]]:
        """
        True batched extraction: collate variable-length inputs into one
        padded, shape-bucketed batch, run a single jitted forward, and slice
        per-item frame counts (reference semantics of extractors.py:485-554).
        """
        assert sampling_rate == self.config.sampling_rate
        input_is_list = isinstance(samples, list)
        if lengths is not None:
            items = [np.asarray(s, dtype=np.float32)[: int(l)] for s, l in zip(samples, lengths)]
            item_lengths = [int(l) for l in lengths]
        else:
            if input_is_list or getattr(samples, "ndim", 1) > 1:
                items = [np.asarray(s, dtype=np.float32).reshape(-1) for s in samples]
            else:
                items = [np.asarray(samples, dtype=np.float32).reshape(-1)]
            item_lengths = [len(s) for s in items]
        from lhotse_tpu.tracing import add_work, is_tracing_enabled, trace_span

        if is_tracing_enabled():
            with trace_span(f"{type(self).__name__}.extract_batch"):
                add_work(sum(item_lengths) / sampling_rate)
                return self._extract_batch_impl(items, item_lengths, input_is_list, sampling_rate)
        return self._extract_batch_impl(items, item_lengths, input_is_list, sampling_rate)

    def _extract_batch_impl(self, items, item_lengths, input_is_list, sampling_rate):
        items = [self._apply_dither(s) for s in items]
        feat_lens = [
            compute_num_frames_from_samples(l, self.frame_shift, sampling_rate)
            for l in item_lengths
        ]
        if self._use_numpy_path():
            # Per-item processing is deliberate: each item's (T_i, n_fft)
            # frame block stays cache-resident through frame->FFT->|X|^2->
            # mel, which measures ~1.7x faster than one fused
            # (sum_T, n_fft) pass that spills to DRAM between stages.
            result = [
                self._numpy_item_features(s)[:n] for s, n in zip(items, feat_lens)
            ]
        else:
            prepared = [self._prepare_item(s) for s in items]
            max_len = max(p.shape[-1] for p in prepared)
            padded_len = _round_up(
                max(max_len, self._frame_samples),
                self._shift_samples * LENGTH_BUCKET_FRAMES)
            Bp = _batch_bucket(len(prepared))
            batch = np.zeros((Bp, padded_len), dtype=np.float32)
            for i, p in enumerate(prepared):
                batch[i, : p.shape[-1]] = p
            feats = np.asarray(self._forward_padded_batch(batch))
            result = [feats[i, : feat_lens[i]] for i in range(len(item_lengths))]
        if len(result) == 1:
            return result if input_is_list else result[0]
        if all(r.shape == result[0].shape for r in result[1:]):
            return np.stack(result, axis=0)
        return result

    def extract_batch_collated(
        self,
        samples: Sequence[np.ndarray],
        sampling_rate: int,
        lengths: Optional[np.ndarray] = None,
        pad_value: float = 0.0,
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """
        Batched extraction straight into one padded ``(B, T_max, F)`` buffer:
        each item's features are written IN PLACE by the fused native kernel
        (no per-item allocation, no second collate copy — this is the
        host hot path behind ``OnTheFlyFeatures``). Semantically identical to
        ``extract_batch`` + ``collate_matrices(pad_value)``.

        Returns ``(batch (B, T_max, F) f32, feat_lens (B,) int64)``, or None
        when this extractor can't take the in-place path (device extractor,
        energy column, or empty input) — callers fall back to
        ``extract_batch``.
        """
        if not self._use_numpy_path() or getattr(self.config, "use_energy", False):
            return None
        if lengths is not None:
            items = [
                np.asarray(s, dtype=np.float32).reshape(-1)[: int(l)]
                for s, l in zip(samples, lengths)
            ]
        else:
            items = [np.asarray(s, dtype=np.float32).reshape(-1) for s in samples]
        if not items:
            return None
        from lhotse_tpu.tracing import add_work, is_tracing_enabled, trace_span

        def impl():
            prepped = [self._apply_dither(s) for s in items]
            feat_lens = [
                compute_num_frames_from_samples(
                    s.shape[-1], self.frame_shift, sampling_rate
                )
                for s in prepped
            ]
            F = self.feature_dim(sampling_rate)
            T = max(feat_lens)
            batch = np.empty((len(prepped), T, F), dtype=np.float32)
            for i, (s, n) in enumerate(zip(prepped, feat_lens)):
                if n > 0:
                    row = batch[i, :n]  # C-contiguous row block
                    got = self._numpy_item_features(s, out=row)
                    if got is not row:
                        row[...] = got
                if n < T:
                    batch[i, n:] = pad_value
            return batch, np.asarray(feat_lens, dtype=np.int64)

        if is_tracing_enabled():
            with trace_span(f"{type(self).__name__}.extract_batch"):
                add_work(sum(s.shape[-1] for s in items) / sampling_rate)
                return impl()
        return impl()


@dataclass
class FbankConfig:
    sampling_rate: int = 16000
    frame_length: Seconds = 0.025
    frame_shift: Seconds = 0.01
    round_to_power_of_two: bool = True
    remove_dc_offset: bool = True
    preemph_coeff: float = 0.97
    window_type: str = "povey"
    dither: float = 0.0
    snip_edges: bool = False
    energy_floor: float = EPSILON
    raw_energy: bool = True
    use_energy: bool = False
    use_fft_mag: bool = False
    low_freq: float = 20.0
    high_freq: float = -400.0
    num_filters: int = 80
    num_mel_bins: Optional[int] = None  # do not use
    norm_filters: bool = False
    torchaudio_compatible_mel_scale: bool = True
    device: str = "cpu"

    def __post_init__(self):
        if self.num_mel_bins is not None:
            self.num_filters = self.num_mel_bins
            self.num_mel_bins = None
        if self.snip_edges:
            warnings.warn(
                "`snip_edges` is set to True, which may cause issues in duration "
                "to num-frames conversion."
            )

    def to_dict(self) -> Dict[str, Any]:
        return asdict_nonull(self)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "FbankConfig":
        return FbankConfig(**data)


@register_extractor
class Fbank(_KaldiExtractorBase):
    name = "kaldi-fbank"
    config_type = FbankConfig

    def __init__(self, config: Optional[FbankConfig] = None):
        super().__init__(config=config)
        config_dict = self.config.to_dict()
        config_dict.pop("device", None)
        self.extractor = Wav2LogFilterBank(**config_dict)

    def to(self, device: str):
        self.config.device = device

    def feature_dim(self, sampling_rate: int) -> int:
        return self.config.num_filters

    def _postprocess_constants(self):
        return (self.extractor._fb,)

    def _pallas_matrices(self):
        cfg = self.config
        if (
            self._frame_samples != 400
            or self._shift_samples != 160
            or self._fft_length != 512
            or getattr(cfg, "use_energy", False)
            or getattr(cfg, "use_fft_mag", False)
        ):
            return None
        fb = np.asarray(self.extractor._fb, dtype=np.float32)
        if fb.shape[0] != 257 or fb[256].any():
            return None
        Mc, Ms = self._analysis_matrices()
        return Mc, Ms, fb

    def _postprocess(self, pow_spec, log_e, consts):
        import jax.numpy as jnp

        (fb,) = consts
        out = ops.mel_fbank_from_power(pow_spec, jnp.asarray(fb))
        if self.config.use_energy and log_e is not None:
            out = jnp.concatenate([log_e[..., None], out], axis=-1)
        return out

    def _postprocess_numpy(self, pow_spec, log_e):
        # f32 sgemm for the mel projection: 2x the f64 dgemm throughput, and
        # the extra log-domain noise it adds (~1e-6, linear-domain rounding
        # on strictly positive sums) sits far below the 5e-4 parity budget.
        # The f64 chain up to the power spectrum is what parity needs — the
        # FFT's near-cancellation bins, not the mel accumulation.
        fb = np.asarray(self.extractor._fb, dtype=np.float32)
        out = np.log(np.maximum(pow_spec.astype(np.float32) @ fb, ops.FLT_EPS))
        if self.config.use_energy and log_e is not None:
            out = np.concatenate([log_e[:, None].astype(np.float32), out], axis=-1)
        return out.astype(np.float32, copy=False)

    def _fused_plan(self):
        """(mel_t, mel_lo, mel_hi) for the native fused kernel, or None when
        the configuration falls outside its envelope (non-pow2 FFT, f64
        host-FFT override). Cached per extractor."""
        plan = self._jit_cache.get("fused_plan", "unset")
        if plan == "unset":
            plan = None
            fft = self._fft_length
            if (
                _host_fft_dtype() == np.float32
                and fft >= 8
                and fft <= 4096
                and (fft & (fft - 1)) == 0
            ):
                fb = np.asarray(self.extractor._fb, dtype=np.float32)
                if fb.shape[0] == fft // 2 + 1:
                    mel_t = np.ascontiguousarray(fb.T)
                    nz = mel_t != 0.0
                    any_nz = nz.any(axis=1)
                    lo = np.argmax(nz, axis=1).astype(np.int32)
                    hi = (mel_t.shape[1] - np.argmax(nz[:, ::-1], axis=1)).astype(
                        np.int32
                    )
                    lo[~any_nz] = 0
                    hi[~any_nz] = 0
                    plan = (mel_t, lo, hi)
            self._jit_cache["fused_plan"] = plan
        return plan

    def _fused_call(self, samples, n_frames, pad_left, out=None):
        plan = self._fused_plan()
        if plan is None:
            return None
        cfg = self.config
        mel_t, lo, hi = plan
        res = host_dsp.fbank_fused(
            samples,
            self._frame_samples,
            self._shift_samples,
            n_frames,
            self._numpy_window(np.float32),
            cfg.preemph_coeff,
            cfg.remove_dc_offset,
            self._fft_length,
            cfg.use_fft_mag,
            mel_t,
            lo,
            hi,
            log_floor=ops.FLT_EPS,
            want_energy=cfg.use_energy,
            energy_floor=cfg.energy_floor if cfg.use_energy else 0.0,
            pad_left=pad_left,
            # In-place write only when no energy column follows (the concat
            # below reallocates anyway).
            out=out if not cfg.use_energy else None,
        )
        if res is None:
            return None
        out_mel, log_e = res
        if cfg.use_energy and log_e is not None:
            out_mel = np.concatenate(
                [log_e[:, None].astype(np.float32), out_mel], axis=-1
            )
            if out is not None and out_mel.shape == out.shape:
                out[...] = out_mel
                return out
        return out_mel

    def _fused_native_item(self, prepared, n_frames):
        return self._fused_call(prepared, n_frames, pad_left=0)

    def _fused_native_raw(self, item, n_frames, out=None):
        length, shift = self._frame_samples, self._shift_samples
        if self.config.snip_edges:
            return self._fused_call(item, n_frames, pad_left=0, out=out)
        pad_left = (length - shift) // 2
        if item.shape[-1] < length or pad_left >= item.shape[-1]:
            return None  # too short for virtual padding: use the copy path
        return self._fused_call(item, n_frames, pad_left=pad_left, out=out)

    @staticmethod
    def mix(
        features_a: np.ndarray, features_b: np.ndarray, energy_scaling_factor_b: float,
    ) -> np.ndarray:
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


@dataclass
class MfccConfig:
    sampling_rate: int = 16000
    frame_length: Seconds = 0.025
    frame_shift: Seconds = 0.01
    round_to_power_of_two: bool = True
    remove_dc_offset: bool = True
    preemph_coeff: float = 0.97
    window_type: str = "povey"
    dither: float = 0.0
    snip_edges: bool = False
    energy_floor: float = EPSILON
    raw_energy: bool = True
    use_energy: bool = False
    use_fft_mag: bool = False
    low_freq: float = 20.0
    high_freq: float = -400.0
    num_filters: int = 23
    num_mel_bins: Optional[int] = None  # do not use
    norm_filters: bool = False
    num_ceps: int = 13
    cepstral_lifter: int = 22
    torchaudio_compatible_mel_scale: bool = True
    device: str = "cpu"

    def __post_init__(self):
        if self.num_mel_bins is not None:
            self.num_filters = self.num_mel_bins
            self.num_mel_bins = None

    def to_dict(self) -> Dict[str, Any]:
        return asdict_nonull(self)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "MfccConfig":
        return MfccConfig(**data)


@register_extractor
class Mfcc(_KaldiExtractorBase):
    name = "kaldi-mfcc"
    config_type = MfccConfig

    def __init__(self, config: Optional[MfccConfig] = None):
        super().__init__(config=config)
        config_dict = self.config.to_dict()
        config_dict.pop("device", None)
        self.extractor = Wav2MFCC(**config_dict)

    def to(self, device: str):
        self.config.device = device

    def feature_dim(self, sampling_rate: int) -> int:
        return self.config.num_ceps

    def _postprocess_constants(self):
        return (self.extractor._fb, self.extractor._dct, self.extractor._lifter)

    def _postprocess(self, pow_spec, log_e, consts):
        import jax.numpy as jnp

        fb, dct, lifter = consts
        logmel = ops.mel_fbank_from_power(pow_spec, jnp.asarray(fb))
        mfcc = ops.mfcc_from_logmel(
            logmel, jnp.asarray(dct), jnp.asarray(lifter) if lifter is not None else None)
        if self.config.use_energy and log_e is not None:
            mfcc = mfcc.at[..., 0].set(log_e)
        return mfcc

    def _postprocess_numpy(self, pow_spec, log_e):
        fb = np.asarray(self.extractor._fb, dtype=np.float32)
        dct = np.asarray(self.extractor._dct, dtype=np.float32)
        lifter = self.extractor._lifter
        logmel = np.log(np.maximum(pow_spec @ fb, ops.FLT_EPS))
        mfcc = logmel @ dct
        if lifter is not None:
            mfcc = mfcc * np.asarray(lifter, dtype=np.float32)
        if self.config.use_energy and log_e is not None:
            mfcc[:, 0] = log_e
        return mfcc.astype(np.float32)

    def _pallas_matrices(self):
        mats = self.extractor._fused_matrices()
        if mats is None:
            return None
        Mc, Ms, fb_padded, self._pallas_n_mels = mats
        return Mc, Ms, fb_padded

    def _pallas_postprocess(self, logmel):
        import jax.numpy as jnp

        logmel = logmel[..., : self._pallas_n_mels]
        return ops.mfcc_from_logmel(
            logmel, jnp.asarray(self.extractor._dct),
            jnp.asarray(self.extractor._lifter)
            if self.extractor._lifter is not None
            else None)


@dataclass
class SpectrogramConfig:
    sampling_rate: int = 16000
    frame_length: Seconds = 0.025
    frame_shift: Seconds = 0.01
    round_to_power_of_two: bool = True
    remove_dc_offset: bool = True
    preemph_coeff: float = 0.97
    window_type: str = "povey"
    dither: float = 0.0
    snip_edges: bool = False
    energy_floor: float = EPSILON
    raw_energy: bool = True
    use_energy: bool = False
    use_fft_mag: bool = False
    device: str = "cpu"

    def to_dict(self) -> Dict[str, Any]:
        return asdict_nonull(self)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "SpectrogramConfig":
        return SpectrogramConfig(**data)


@register_extractor
class Spectrogram(_KaldiExtractorBase):
    name = "kaldi-spectrogram"
    config_type = SpectrogramConfig

    def __init__(self, config: Optional[SpectrogramConfig] = None):
        super().__init__(config=config)
        config_dict = self.config.to_dict()
        config_dict.pop("device", None)
        self.extractor = Wav2Spec(**config_dict)

    def to(self, device: str):
        self.config.device = device

    def feature_dim(self, sampling_rate: int) -> int:
        return self._fft_length // 2 + 1

    def _postprocess(self, pow_spec, log_e, consts):
        if self.config.use_energy and log_e is not None:
            pow_spec = pow_spec.at[..., 0].set(log_e)
        return pow_spec

    def _postprocess_numpy(self, pow_spec, log_e):
        if self.config.use_energy and log_e is not None:
            pow_spec[:, 0] = log_e
        return pow_spec.astype(np.float32)

    @staticmethod
    def mix(
        features_a: np.ndarray, features_b: np.ndarray, energy_scaling_factor_b: float,
    ) -> np.ndarray:
        return features_a + energy_scaling_factor_b * features_b

    @staticmethod
    def compute_energy(features: np.ndarray) -> float:
        return float(np.sum(features))

    @staticmethod
    def scale(features: np.ndarray, energy_scaling_factor: float) -> np.ndarray:
        return features * energy_scaling_factor


@dataclass
class LogSpectrogramConfig:
    sampling_rate: int = 16000
    frame_length: Seconds = 0.025
    frame_shift: Seconds = 0.01
    round_to_power_of_two: bool = True
    remove_dc_offset: bool = True
    preemph_coeff: float = 0.97
    window_type: str = "povey"
    dither: float = 0.0
    snip_edges: bool = False
    energy_floor: float = EPSILON
    raw_energy: bool = True
    use_energy: bool = False
    use_fft_mag: bool = False
    device: str = "cpu"

    def to_dict(self) -> Dict[str, Any]:
        return asdict_nonull(self)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "LogSpectrogramConfig":
        return LogSpectrogramConfig(**data)


@register_extractor
class LogSpectrogram(_KaldiExtractorBase):
    name = "kaldi-log-spectrogram"
    config_type = LogSpectrogramConfig

    def __init__(self, config: Optional[LogSpectrogramConfig] = None):
        super().__init__(config=config)
        config_dict = self.config.to_dict()
        config_dict.pop("device", None)
        self.extractor = Wav2LogSpec(**config_dict)

    def to(self, device: str):
        self.config.device = device

    def feature_dim(self, sampling_rate: int) -> int:
        return self._fft_length // 2 + 1

    def _postprocess(self, pow_spec, log_e, consts):
        import jax.numpy as jnp

        out = jnp.log(pow_spec + 1e-15)
        if self.config.use_energy and log_e is not None:
            out = out.at[..., 0].set(log_e)
        return out

    def _postprocess_numpy(self, pow_spec, log_e):
        out = np.log(pow_spec + 1e-15)
        if self.config.use_energy and log_e is not None:
            out[:, 0] = log_e
        return out.astype(np.float32)

    @staticmethod
    def mix(
        features_a: np.ndarray, features_b: np.ndarray, energy_scaling_factor_b: float,
    ) -> np.ndarray:
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
