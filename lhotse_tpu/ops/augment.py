"""
On-device, batched augmentation ops and the fused augment→fbank pipeline.

These are the jittable device counterparts of the per-cut host paths, sharing
their constants and math so host and device agree to float32 tolerance
(tested in ``tests/test_ops_augment.py``):

- SNR noise-mix gain ``sqrt(E_ref * 10^(-snr/10) / E_noise)`` — host
  :class:`lhotse_tpu.audio.mixer.AudioMixer` (reference spec:
  `/root/reference/lhotse/audio/mixer.py:129-162`);
- RIR reverberation by FFT convolution with Kaldi shift-output semantics
  (output aligned at the RIR peak, length == input) and energy
  normalization — host :class:`lhotse_tpu.augmentation.rir
  .ReverbWithImpulseResponse` (reference specs:
  `/root/reference/lhotse/augmentation/utils.py:49`,
  `/root/reference/lhotse/augmentation/rir.py:13-166`);
- speed/volume perturbation — :func:`lhotse_tpu.ops.resample.speed_perturb`
  (sinc polyphase, reference spec:
  `/root/reference/lhotse/augmentation/resample.py:186-315`).

TPU-first design: every op consumes a fixed-shape ``(B, T)`` bucket with a
``lens`` vector instead of ragged per-cut arrays, so the whole augmentation
chain (speed perturb → volume gain → SNR noise mix → RIR reverb → fbank)
compiles into ONE XLA program per bucket shape — convolutions and the fbank
GEMMs ride the MXU, elementwise gain/mask work fuses into them, and nothing
falls back to per-item host loops.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

RIR_SCALING_FACTOR = 0.5**15  # host parity: augmentation/rir.py


def valid_mask(lens, num_samples: int):
    """(B,) lens → (B, num_samples) float32 0/1 mask."""
    import jax.numpy as jnp

    return (
        jnp.arange(num_samples)[None, :] < jnp.asarray(lens)[:, None]
    ).astype(jnp.float32)


def masked_energy(audio, lens=None):
    """
    Per-item mean power over the valid samples — the batched analog of
    ``audio_energy`` (mean of x^2).  With ``lens=None`` the full last axis
    counts.
    """
    import jax.numpy as jnp

    audio = jnp.asarray(audio)
    if lens is None:
        return jnp.mean(audio * audio, axis=-1)
    mask = valid_mask(lens, audio.shape[-1])
    denom = jnp.maximum(jnp.asarray(lens).astype(jnp.float32), 1.0)
    return jnp.sum(audio * audio * mask, axis=-1) / denom


def snr_mix_gain(ref_energy, noise_energy, snr):
    """
    Batched SNR gain: ``sqrt(E_ref * 10^(-snr/10) / E_noise)``, falling back
    to 1.0 when either energy is non-positive (host AudioMixer._snr_gain
    semantics).
    """
    import jax.numpy as jnp

    ref_energy = jnp.asarray(ref_energy, jnp.float32)
    noise_energy = jnp.asarray(noise_energy, jnp.float32)
    snr = jnp.asarray(snr, jnp.float32)
    target = ref_energy * 10.0 ** (-snr / 10.0)
    gain = jnp.sqrt(target / jnp.maximum(noise_energy, 1e-20))
    return jnp.where((ref_energy > 0) & (noise_energy > 0), gain, 1.0)


def place_at_offsets(noise, noise_lens, offsets, num_samples: int):
    """
    Shift each noise row so it starts at ``offsets[b]`` samples within a
    ``num_samples``-long frame, zero outside ``[offset, offset+len)`` —
    the batched analog of the host mixer's per-track zero-padding.
    """
    import jax.numpy as jnp

    noise = jnp.asarray(noise)
    offsets = jnp.asarray(offsets)
    idx = jnp.arange(num_samples)[None, :] - offsets[:, None]
    ok = (idx >= 0) & (idx < jnp.asarray(noise_lens)[:, None])
    gathered = jnp.take_along_axis(
        noise, jnp.clip(idx, 0, noise.shape[-1] - 1), axis=-1
    )
    return jnp.where(ok, gathered, 0.0)


def mix_noise(
    audio,
    audio_lens,
    noise,
    noise_lens=None,
    snr=10.0,
    offsets=None,
    mix_mask=None,
    reference_energy=None,
):
    """
    Mix a noise batch into an audio batch at the requested per-item SNRs:
    ``mixed = audio + gain * shift(noise)`` truncated to the audio frame.

    :param audio: (B, T) batch; valid lengths ``audio_lens``.
    :param noise: (B, Tn) noise batch; valid lengths ``noise_lens``.
    :param snr: scalar or (B,) target SNR in dB (noise relative to audio).
    :param offsets: optional (B,) sample offsets where each noise starts.
    :param mix_mask: optional (B,) 0/1 — items with 0 pass through unmixed
        (the batched form of ``mix_prob``).
    :param reference_energy: optional (B,) override of the audio energy used
        in the gain (e.g. the pre-gain energy of a MixedCut's first track).
    """
    import jax.numpy as jnp

    audio = jnp.asarray(audio)
    T = audio.shape[-1]
    ref_energy = (
        masked_energy(audio, audio_lens)
        if reference_energy is None
        else jnp.asarray(reference_energy, jnp.float32)
    )
    noise = jnp.asarray(noise)
    noise_energy = masked_energy(noise, noise_lens)
    gain = snr_mix_gain(ref_energy, noise_energy, snr)
    if offsets is None:
        # Gather-free fast path: align at t=0, mask/pad/truncate to T.
        placed = noise
        if noise_lens is not None:
            placed = placed * valid_mask(noise_lens, placed.shape[-1])
        if placed.shape[-1] < T:
            placed = jnp.pad(placed, ((0, 0), (0, T - placed.shape[-1])))
        elif placed.shape[-1] > T:
            placed = placed[:, :T]
    else:
        lens = (
            jnp.full(audio.shape[0], noise.shape[-1])
            if noise_lens is None
            else noise_lens
        )
        placed = place_at_offsets(noise, lens, offsets, T)
    if mix_mask is not None:
        gain = gain * jnp.asarray(mix_mask, jnp.float32)
    return audio + gain[:, None] * placed


def reverb_rir(audio, rir, audio_lens=None, rir_lens=None, normalize: bool = True):
    """
    Batched RIR reverberation with Kaldi ``wav-reverberate --shift-output``
    semantics (host rir.py parity): full FFT convolution with
    ``rir * 2^-15``, output realigned so the RIR peak lands at t=0, truncated
    to the input length, optionally rescaled to preserve the dry energy.

    :param audio: (B, T); ``audio_lens`` marks valid samples (tail beyond an
        item's length is cut, as the host path's fixed output length does).
    :param rir: (L,) shared or (B, L) per-item impulse responses;
        ``rir_lens`` masks per-item padding in a batched RIR.
    """
    import jax.numpy as jnp

    audio = jnp.asarray(audio, jnp.float32)
    B, T = audio.shape
    # A concrete shared 1-D RIR has a compile-time peak: the realignment
    # becomes a static slice instead of a (B, T) gather.
    static_peak = None
    if isinstance(rir, np.ndarray) and rir.ndim == 1 and rir_lens is None:
        static_peak = int(np.argmax(rir))
    rir = jnp.asarray(rir, jnp.float32)
    if rir.ndim == 1:
        if static_peak is not None:
            # Shared RIR: one FFT row, broadcast in the frequency product.
            rir = rir[None, :]
        else:
            rir = jnp.broadcast_to(rir[None, :], (B, rir.shape[0]))
    L = rir.shape[-1]
    if rir_lens is not None:
        rir = rir * valid_mask(rir_lens, L)
    taps = rir * RIR_SCALING_FACTOR

    full = T + L - 1
    fft_size = 1 << (full - 1).bit_length()
    wet_full = jnp.fft.irfft(
        jnp.fft.rfft(audio, n=fft_size) * jnp.fft.rfft(taps, n=fft_size),
        n=fft_size,
    )
    # Align the RIR peak with t=0 (host: wet[peak : peak + N]).
    if static_peak is not None:
        wet = wet_full[:, static_peak : static_peak + T]
    else:
        peak = jnp.argmax(taps, axis=-1)
        idx = peak[:, None] + jnp.arange(T)[None, :]
        wet = jnp.take_along_axis(
            wet_full, jnp.clip(idx, 0, fft_size - 1), axis=-1
        )
    if audio_lens is not None:
        wet = wet * valid_mask(audio_lens, T)
    if normalize:
        dry_power = masked_energy(audio, audio_lens)
        wet_power = masked_energy(wet, audio_lens)
        scale = jnp.sqrt(dry_power / jnp.maximum(wet_power, 1e-20))
        wet = wet * jnp.where(wet_power > 0, scale, 1.0)[:, None]
    return wet


def resolve_fbank_layer(fbank, sampling_rate: int):
    """
    Normalize the ``fbank`` argument of the fused pipeline to a batched
    wav->features layer: ``None`` -> a default
    :class:`~lhotse_tpu.features.kaldi.layers.Wav2LogFilterBank`; a
    user-facing :class:`~lhotse_tpu.features.base.FeatureExtractor` (e.g.
    ``Fbank()``) -> its ``extractor`` layer; any other callable passes
    through.
    """
    from lhotse_tpu.features.kaldi.layers import Wav2LogFilterBank

    if fbank is None:
        return Wav2LogFilterBank(sampling_rate=sampling_rate)
    from lhotse_tpu.features.base import FeatureExtractor

    if isinstance(fbank, FeatureExtractor):
        inner = getattr(fbank, "extractor", None)
        if not callable(inner):
            raise ValueError(
                f"{type(fbank).__name__} does not expose a batched "
                "wav->features layer; pass a callable such as "
                "Wav2LogFilterBank instead.")
        return inner
    return fbank


def apply_specaugment(features, warp_src, time_mask, freq_mask):
    """
    Vectorized SpecAugment apply: linear-interp gather along time by
    fractional source indices ``warp_src`` (B, T), then masked fill with
    per-example means.  Dispatches to jax when given a jax array (one fused
    XLA program; also traced into OnDeviceAugmenter's bucket programs),
    numpy otherwise.  The randomness lives in
    :class:`lhotse_tpu.dataset.signal_transforms.SpecAugment` (host-side,
    checkpointable) — this is only the math.
    """
    is_jax = type(features).__module__.startswith(("jax", "jaxlib"))
    if is_jax:
        import jax.numpy as xp
    else:
        xp = np

    b, t, f = features.shape
    src = xp.asarray(warp_src, dtype=xp.float32)
    lo = xp.clip(xp.floor(src).astype(xp.int32), 0, t - 1)
    hi = xp.clip(lo + 1, 0, t - 1)
    frac = (src - lo.astype(xp.float32))[..., None]
    batch_idx = xp.arange(b)[:, None]
    gathered = (1.0 - frac) * features[batch_idx, lo] + frac * features[batch_idx, hi]

    mean = gathered.mean(axis=(1, 2), keepdims=True)
    tm = xp.asarray(time_mask)[:, :, None]
    fm = xp.asarray(freq_mask)[:, None, :]
    out = xp.where(tm | fm, mean, gathered)
    return out.astype(features.dtype)


def make_augment_fbank_pipeline(
    sampling_rate: int = 16000,
    speed_factor: Optional[float] = None,
    normalize_rir: bool = True,
    fbank=None,
    wire_format: str = "float32",
    rir: Optional[np.ndarray] = None,
):
    """
    Build ONE jitted program running the full BASELINE config #3 chain on
    device over a fixed-shape bucket:

        speed perturb → volume gain → SNR noise mix → RIR reverb → fbank

    Every stage is optional at call time (pass ``None`` to skip; the jit
    retraces per argument structure, so each used combination costs one
    compile per bucket shape).  Returns ``fn(audio, audio_lens, *, gains,
    noise, noise_lens, snr, noise_offsets, mix_mask, rir) -> (feats (B, T',
    80), feat_lens)``.  ``wire_format`` selects the host->device audio
    encoding ("float32"/"int16"/"mulaw"); decoding is the program's first,
    freely-fused step (:mod:`lhotse_tpu.ops.wire`).

    A fixed impulse response should be passed HERE (build-time ``rir``)
    rather than per call: a concrete RIR is baked into the program as a
    constant, so its peak is found at trace time and the realignment
    compiles to a static slice with ONE shared-RIR FFT row.  A per-call
    ``rir`` argument still works (and overrides the build-time one) but is
    a traced value — peak-finding and realignment then run on device as an
    argmax + (B, T) gather, and the RIR is FFT'd per item, which measures
    ~6x slower for small buckets on TPU.
    """
    import jax

    from lhotse_tpu.ops.resample import resampled_num_samples, speed_perturb
    from lhotse_tpu.ops.wire import decode_wire

    fbank = resolve_fbank_layer(fbank, sampling_rate)
    hop = round(fbank.frame_shift * sampling_rate)
    static_rir = None if rir is None else np.asarray(rir, np.float32)

    def pipeline(
        audio,
        audio_lens,
        gains=None,
        noise=None,
        noise_lens=None,
        snr=None,
        noise_offsets=None,
        mix_mask=None,
        rir=None,
        warp_src=None,
        time_mask=None,
        freq_mask=None,
    ):
        import jax.numpy as jnp

        audio = decode_wire(audio, wire_format)
        audio_lens = jnp.asarray(audio_lens)
        if speed_factor is not None and speed_factor != 1.0:
            orig = round(sampling_rate * speed_factor)
            audio = speed_perturb(audio, speed_factor, sampling_rate)
            audio_lens = resampled_num_samples(audio_lens, orig, sampling_rate)
        if gains is not None:
            audio = audio * jnp.asarray(gains, jnp.float32)[:, None]
        if noise is not None:
            audio = mix_noise(
                audio,
                audio_lens,
                noise,
                noise_lens,
                snr,
                offsets=noise_offsets,
                mix_mask=mix_mask,
            )
        if rir is None:
            rir = static_rir  # concrete -> static-peak path (see docstring)
        if rir is not None:
            audio = reverb_rir(
                audio, rir, audio_lens=audio_lens, normalize=normalize_rir
            )
        feats = fbank(audio)
        # snip_edges=False frame count, computed per item from the lens.
        feat_lens = (audio_lens + hop // 2) // hop
        if time_mask is not None or freq_mask is not None or warp_src is not None:
            # Host draws use the analytic frame-count formula, which may
            # overshoot the layer's actual output by a frame — slice down.
            T_f = feats.shape[1]
            F = feats.shape[2]
            if warp_src is None:
                warp_src = jnp.broadcast_to(
                    jnp.arange(T_f, dtype=jnp.float32)[None, :],
                    (feats.shape[0], T_f),
                )
            else:
                warp_src = jnp.asarray(warp_src)[:, :T_f]
            if time_mask is None:
                time_mask = jnp.zeros((feats.shape[0], T_f), bool)
            else:
                time_mask = jnp.asarray(time_mask)[:, :T_f]
            if freq_mask is None:
                freq_mask = jnp.zeros((feats.shape[0], F), bool)
            feats = apply_specaugment(feats, warp_src, time_mask, freq_mask)
        return feats, feat_lens

    return jax.jit(pipeline)
