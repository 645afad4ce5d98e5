"""
Wire formats for host→device audio transfer.

The input pipeline's bottleneck on real deployments is often the
host→device link (PCIe, or a tunnel), not compute.  Audio crosses the wire
in one of three formats, decoded on device as the first step of the fused
augment→fbank program:

- ``float32`` — lossless, 4 B/sample;
- ``int16``  — linear PCM quantization, 2 B/sample (~96 dB SNR, the
  default: indistinguishable at fbank level);
- ``mulaw``  — 8-bit mu-law companding (mu=255, the G.711 curve),
  1 B/sample. LOSSY: ~38 dB SNR on speech — fbank features shift by more
  than the 1e-4 parity budget, so this is an opt-in trade of fidelity for
  2x wire throughput (useful when the link, not the chip, caps the
  pipeline; robust training setups often tolerate or even benefit from it
  as augmentation noise);
- ``adpcm4`` — 4-bit IMA-style block ADPCM, ~0.56 B/sample (64-sample
  blocks, 4-byte header each). LOSSY: ~30-35 dB SNR on speech. Blocks are
  independent (header carries the predictor seed + step index), so the
  device decode is a 64-step ``lax.scan`` of elementwise int32 ops
  vectorized over (batch x blocks) lanes — it fuses into the downstream
  augment program. The deepest wire squeeze for link-bound pipelines:
  3.6x fewer bytes than int16. Requires T to be a multiple of 64
  (bucket shapes with integral seconds at common rates always are).

Encoding runs on the host (numpy, vectorized); decoding is elementwise
device math that fuses into the downstream program for free. The adpcm4
encoder/decoder pair uses pure int32 arithmetic on both sides, so the
host mirror decode is bit-exact against the device decode.
"""
from __future__ import annotations

import numpy as np

WIRE_FORMATS = ("float32", "int16", "mulaw", "adpcm4")
_MU = 255.0

_MULAW_LUT = None


def _mulaw_formula(x: np.ndarray) -> np.ndarray:
    """The continuous G.711-curve byte mapping (reference semantics)."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    # [-1, 1] -> [0, 255] with 128 = zero.
    return np.clip((y + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)


def _mulaw_encode(x: np.ndarray) -> np.ndarray:
    """Mu-law encode via int16 pre-quantization + 65536-entry LUT (the LUT
    is built once from the continuous formula, so semantics match; the
    extra int16 snap sits ~-96 dBFS, far under mu-law's own ~-38 dB noise).
    ~10x faster than evaluating log1p per sample — this runs on the
    loader's hot path. Native one-pass kernel when available."""
    global _MULAW_LUT
    if _MULAW_LUT is None:
        grid = (np.arange(65536, dtype=np.float32) - 32768.0) / 32768.0
        _MULAW_LUT = _mulaw_formula(grid)
    from lhotse_tpu.ops import host_dsp

    native = host_dsp.mulaw_encode_lut(x, _MULAW_LUT)
    if native is not None:
        return native
    q = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int32)
    return _MULAW_LUT[q + 32768]


# ---------------------------------------------------------------------------
# 4-bit block ADPCM (IMA step/index tables; independent 64-sample blocks).
# ---------------------------------------------------------------------------
ADPCM_BLOCK = 64
_ADPCM_HEADER_BYTES = 4  # pred0 (int16 LE) + step index (u8) + reserved
# The standard 89-entry IMA ADPCM step-size table.
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
# Index adjustment by nibble magnitude (code & 7).
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _adpcm4_geometry(num_samples: int):
    if num_samples % ADPCM_BLOCK:
        raise ValueError(
            f"adpcm4 wire format needs T % {ADPCM_BLOCK} == 0, got T="
            f"{num_samples} — pad the bucket shape up to a block multiple"
        )
    nb = num_samples // ADPCM_BLOCK
    return nb, nb * _ADPCM_HEADER_BYTES + num_samples // 2


def _adpcm4_encode(audio: np.ndarray) -> np.ndarray:
    """float32 ``(..., T)`` in [-1, 1] -> uint8 ``(..., W)`` wire rows:
    per row ``[nb*4 header bytes | T/2 nibble bytes]``. Takes the native C
    kernel when available (bit-exact vs this numpy reference; ~20x faster —
    the encode runs on the loader's hot path)."""
    lead = audio.shape[:-1]
    T = audio.shape[-1]
    nb, width = _adpcm4_geometry(T)
    from lhotse_tpu.ops import host_dsp

    native = host_dsp.adpcm4_encode(
        np.asarray(audio, np.float32), T, width
    )
    if native is not None:
        return native
    x = np.clip(
        np.rint(np.asarray(audio, np.float32) * 32768.0), -32768, 32767
    ).astype(np.int32)
    x = x.reshape(-1, nb, ADPCM_BLOCK)
    pred = x[:, :, 0].copy()  # predictor seed = first sample of the block
    # Step-index seed: smallest step covering the block's mean |first diff|
    # (converges the adaptive loop immediately instead of ramping from 0).
    dmean = np.abs(np.diff(x, axis=-1)).mean(axis=-1) if ADPCM_BLOCK > 1 else x[:, :, 0] * 0
    idx = np.searchsorted(_IMA_STEPS, dmean).astype(np.int32)
    idx = np.clip(idx, 0, 88)
    pred0, idx0 = pred.copy(), idx.copy()
    nib = np.empty((x.shape[0], nb, ADPCM_BLOCK), np.uint8)
    for t in range(ADPCM_BLOCK):
        step = _IMA_STEPS[idx]
        diff = x[:, :, t] - pred
        sign = (diff < 0).astype(np.int32)
        diff = np.abs(diff)
        b4 = (diff >= step).astype(np.int32)
        diff = diff - step * b4
        half = step >> 1
        b2 = (diff >= half).astype(np.int32)
        diff = diff - half * b2
        b1 = (diff >= (step >> 2)).astype(np.int32)
        mag = (b4 << 2) | (b2 << 1) | b1
        nib[:, :, t] = ((sign << 3) | mag).astype(np.uint8)
        # Decoder mirror (must match _adpcm4 decode exactly).
        diffq = (step >> 3) + b4 * step + b2 * half + b1 * (step >> 2)
        pred = np.clip(pred + np.where(sign > 0, -diffq, diffq), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[mag], 0, 88)
    header = np.empty((x.shape[0], nb, _ADPCM_HEADER_BYTES), np.uint8)
    u = (pred0 & 0xFFFF).astype(np.uint16)
    header[:, :, 0] = (u & 0xFF).astype(np.uint8)
    header[:, :, 1] = (u >> 8).astype(np.uint8)
    header[:, :, 2] = idx0.astype(np.uint8)
    header[:, :, 3] = 0
    packed = (nib[:, :, 0::2] | (nib[:, :, 1::2] << 4)).astype(np.uint8)
    out = np.concatenate(
        [header.reshape(x.shape[0], -1), packed.reshape(x.shape[0], -1)],
        axis=1,
    )
    return out.reshape(*lead, width)


def adpcm4_decode_np(wire: np.ndarray) -> np.ndarray:
    """Host mirror of the device decode (bit-exact; for tests/fallbacks)."""
    lead = wire.shape[:-1]
    W = wire.shape[-1]
    nb = W // (_ADPCM_HEADER_BYTES + ADPCM_BLOCK // 2)
    w = wire.reshape(-1, W).astype(np.int32)
    header = w[:, : nb * _ADPCM_HEADER_BYTES].reshape(-1, nb, _ADPCM_HEADER_BYTES)
    pred = header[:, :, 0] | (header[:, :, 1] << 8)
    pred = np.where(pred >= 32768, pred - 65536, pred)
    idx = np.clip(header[:, :, 2], 0, 88)
    packed = w[:, nb * _ADPCM_HEADER_BYTES :].reshape(-1, nb, ADPCM_BLOCK // 2)
    nib = np.stack([packed & 15, packed >> 4], axis=-1).reshape(
        -1, nb, ADPCM_BLOCK
    )
    out = np.empty((w.shape[0], nb, ADPCM_BLOCK), np.int32)
    for t in range(ADPCM_BLOCK):
        code = nib[:, :, t]
        mag = code & 7
        step = _IMA_STEPS[idx]
        diffq = (
            (step >> 3)
            + np.where(mag & 4, step, 0)
            + np.where(mag & 2, step >> 1, 0)
            + np.where(mag & 1, step >> 2, 0)
        )
        pred = np.clip(
            pred + np.where(code & 8, -diffq, diffq), -32768, 32767
        )
        idx = np.clip(idx + _IMA_INDEX[mag], 0, 88)
        out[:, :, t] = pred
    return (out.reshape(*lead, nb * ADPCM_BLOCK).astype(np.float32)) / 32768.0


def _adpcm4_decode_jax(wire):
    """Device decode: a ``lax.scan`` of ADPCM_BLOCK elementwise int32 steps
    over (batch x blocks) lanes; fuses into the consuming program."""
    import jax.numpy as jnp
    from jax import lax

    steps_t = jnp.asarray(_IMA_STEPS)
    index_t = jnp.asarray(_IMA_INDEX)
    lead = wire.shape[:-1]
    W = wire.shape[-1]
    nb = W // (_ADPCM_HEADER_BYTES + ADPCM_BLOCK // 2)
    w = wire.reshape(-1, W).astype(jnp.int32)
    header = w[:, : nb * _ADPCM_HEADER_BYTES].reshape(-1, nb, _ADPCM_HEADER_BYTES)
    pred0 = header[:, :, 0] | (header[:, :, 1] << 8)
    pred0 = jnp.where(pred0 >= 32768, pred0 - 65536, pred0)
    idx0 = jnp.clip(header[:, :, 2], 0, 88)
    packed = w[:, nb * _ADPCM_HEADER_BYTES :].reshape(-1, nb, ADPCM_BLOCK // 2)
    nib = jnp.stack([packed & 15, packed >> 4], axis=-1).reshape(
        -1, nb, ADPCM_BLOCK
    )

    def body(carry, code):
        pred, idx = carry
        mag = code & 7
        step = steps_t[idx]
        diffq = (
            (step >> 3)
            + jnp.where((mag & 4) > 0, step, 0)
            + jnp.where((mag & 2) > 0, step >> 1, 0)
            + jnp.where((mag & 1) > 0, step >> 2, 0)
        )
        pred = jnp.clip(
            pred + jnp.where((code & 8) > 0, -diffq, diffq), -32768, 32767
        )
        idx = jnp.clip(idx + index_t[mag], 0, 88)
        return (pred, idx), pred

    _, preds = lax.scan(body, (pred0, idx0), jnp.moveaxis(nib, -1, 0))
    out = jnp.moveaxis(preds, 0, -1).reshape(*lead, nb * ADPCM_BLOCK)
    return out.astype(jnp.float32) * (1.0 / 32768.0)


def encode_wire(audio: np.ndarray, wire_format: str) -> np.ndarray:
    """Host-side: float32 ``(..., T)`` in [-1, 1] -> wire array."""
    if wire_format == "float32":
        return np.asarray(audio, np.float32)
    if wire_format == "int16":
        return np.clip(
            np.asarray(audio, np.float32) * 32768.0, -32768, 32767
        ).astype(np.int16)
    if wire_format == "mulaw":
        return _mulaw_encode(np.asarray(audio, np.float32))
    if wire_format == "adpcm4":
        return _adpcm4_encode(audio)
    raise ValueError(f"Unknown wire format: {wire_format!r} (use {WIRE_FORMATS})")


def decode_wire(audio, wire_format: str):
    """Device-side (jittable): wire array -> float32 in [-1, 1]."""
    import jax.numpy as jnp

    audio = jnp.asarray(audio)
    if wire_format == "float32":
        return audio.astype(jnp.float32)
    if wire_format == "int16":
        return audio.astype(jnp.float32) * (1.0 / 32768.0)
    if wire_format == "mulaw":
        y = audio.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        return jnp.sign(y) * (
            (jnp.exp(jnp.abs(y) * np.log1p(_MU)) - 1.0) / _MU
        )
    if wire_format == "adpcm4":
        return _adpcm4_decode_jax(audio)
    raise ValueError(f"Unknown wire format: {wire_format!r} (use {WIRE_FORMATS})")


def wire_bytes_per_sample(wire_format: str) -> float:
    """Wire bytes per audio sample (adpcm4 includes its header overhead)."""
    if wire_format == "adpcm4":
        return 0.5 + _ADPCM_HEADER_BYTES / ADPCM_BLOCK
    return {"float32": 4, "int16": 2, "mulaw": 1}[wire_format]


def wire_row_width(num_samples: int, wire_format: str) -> int:
    """Elements (of :func:`wire_np_dtype`) per ``(..., T)`` row on the wire —
    equals ``T`` for the sample-per-element formats, smaller for adpcm4."""
    if wire_format == "adpcm4":
        return _adpcm4_geometry(num_samples)[1]
    return int(num_samples)


def wire_np_dtype(wire_format: str):
    return {
        "float32": np.float32,
        "int16": np.int16,
        "mulaw": np.uint8,
        "adpcm4": np.uint8,
    }[wire_format]
