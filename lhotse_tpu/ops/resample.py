"""
Batched on-device sinc resampler — the jittable counterpart of
:mod:`lhotse_tpu.augmentation.resample` (host path).

Same polyphase windowed-sinc math as the host resampler (reference spec:
`/root/reference/lhotse/augmentation/resample.py:186-315`): the
``(n_phases, K)`` kernel built (and cached) by the host module is reused
verbatim, and the host's strided frame-gather + GEMM becomes a single
``jax.lax.conv_general_dilated`` with stride ``orig_freq`` — on TPU this is
an MXU contraction over ``K`` taps with all ``n_phases`` output channels
produced at once, so a whole ``(B, T)`` bucket resamples in one fused
program.  Host and device outputs agree to float32 tolerance (tested in
``tests/test_ops_augment.py``).
"""
from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from lhotse_tpu.augmentation.resample import get_sinc_resample_kernel


def resampled_num_samples(num_samples, orig_freq: int, new_freq: int):
    """
    Output length of :func:`sinc_resample` for an input of ``num_samples``:
    ``ceil(new * n / orig)`` after gcd reduction.  Works on Python ints and
    on (possibly traced) integer arrays, so it can compute per-item lens of
    a padded batch inside jit.
    """
    gcd = math.gcd(int(orig_freq), int(new_freq))
    o = int(orig_freq) // gcd
    n = int(new_freq) // gcd
    if isinstance(num_samples, (int, np.integer)):
        return int(math.ceil(n * num_samples / o))
    return (num_samples * n + o - 1) // o


@lru_cache(maxsize=None)
def _jitted_resample(orig_freq: int, new_freq: int, lowpass_filter_width: int, rolloff: float):
    import jax
    import jax.numpy as jnp

    gcd = math.gcd(orig_freq, new_freq)
    o = orig_freq // gcd
    kernel_np, width = get_sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )

    def fn(waveform):
        kernel = jnp.asarray(kernel_np)  # (n_phases, K)
        shape = waveform.shape
        length = shape[-1]
        x = waveform.reshape(-1, length).astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (width, width + o)))
        # out[b, p, j] = sum_k x[b, j*o + k] * kernel[p, k]  — identical to
        # the host path's as_strided frames @ kernel.T.
        out = jax.lax.conv_general_dilated(
            x[:, None, :],
            kernel[:, None, :],
            window_strides=(o,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )
        out = jnp.swapaxes(out, 1, 2).reshape(x.shape[0], -1)
        target = resampled_num_samples(length, orig_freq, new_freq)
        return out[:, :target].reshape(shape[:-1] + (target,))

    return jax.jit(fn)


def sinc_resample(
    waveform,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
):
    """
    Resample ``waveform`` of shape ``(..., time)`` from ``orig_freq`` to
    ``new_freq`` on device.  Jittable (safe to call inside an outer jit);
    one compiled program per (input length, rate pair).  For padded batches,
    per-item output lengths are ``resampled_num_samples(lens, orig, new)`` —
    samples beyond an item's valid length are garbage-in/garbage-out exactly
    like the padding itself.
    """
    if int(orig_freq) == int(new_freq):
        return waveform
    return _jitted_resample(
        int(orig_freq), int(new_freq), int(lowpass_filter_width), float(rolloff)
    )(waveform)


def speed_perturb(waveform, factor: float, sampling_rate: int = 16000):
    """
    Batched on-device speed perturbation (sox ``speed`` semantics, matching
    the host :class:`~lhotse_tpu.augmentation.transforms.Speed`): reinterpret
    the signal at ``rate * factor`` and resample back to ``rate``, shortening
    (factor > 1) or stretching (factor < 1) both duration and pitch.
    Returns the resampled ``(..., new_time)`` array.
    """
    return sinc_resample(
        waveform, orig_freq=round(sampling_rate * factor), new_freq=sampling_rate
    )
