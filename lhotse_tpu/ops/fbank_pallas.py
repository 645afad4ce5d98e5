"""
Fused Pallas TPU kernel for log-mel fbank extraction.

Fuses the whole hot path — overlapped framing → (preprocessing-folded)
DFT GEMM → power spectrum → mel GEMM → eps-floored log — into one kernel:
the (num_frames, 400) frames matrix is never materialized in HBM (the XLA
path writes + re-reads ~2.5x the audio at float32 width), and the small
(frames, num_mels) log-mel output is the only HBM write.

TPU lowering requires every lane-dimension slice/DMA width to be a multiple
of 128, which the Kaldi 160-sample hop violates directly. The kernel
therefore uses a **128-lane repack** of the framing problem:

- the caller passes audio as a (B, rows, 640) view — 640 = lcm(160, 128),
  i.e. 4 hops = 5 full 128-lane registers — which is a free XLA reshape of
  the pre-padded (B, N) batch;
- each grid step DMAs a (K+1, 640) slab (K = BLOCK_T/4 rows) and forms
  ``cat = [slab[:-1] | slab[1:]]`` — a (K, 1280) two-row window, a
  lane-concat of 128-multiples;
- frames are processed in 4 *phases* (frame index mod 4). Phase p frames
  start at sample offset 160p inside their row, i.e. at lane 32p of the
  128-aligned window ``cat[:, 128p : 128p + 512]`` — every slice the
  Mosaic compiler sees is 128-aligned and 512 lanes wide;
- the 32p intra-window shift is absorbed into four shifted copies of the
  folded DFT matrix: ``Dp[32p + j, :] = [Mc | Ms][j, :]`` (rows outside
  the 400-sample window are zero), so phase p's spectrum is one
  (K, 512) @ (512, 512) MXU matmul — no in-kernel gather or unaligned
  reshape. FLOP overhead vs. the ideal 400-wide GEMM is 512/400 = 1.28x,
  paid back by eliminating the frames-matrix HBM round-trip;
- the Nyquist bin is dropped inside the kernel (256 spectrum bins): the
  extractors zero-pad the mel filterbank's Nyquist row
  (features/kaldi/layers.py ``_build_fb``), so it never contributes;
- both GEMMs run at f32 (HIGHEST) precision — required for the 1e-4-class
  parity contract vs. the reference (kaldi/torchaudio) implementation
  (bf16x3 'HIGH' measurably breaks it: ~1.4e-3 max error on chip).

Output is written phase-major as (B, 4, T/4, mels); the host wrapper
transposes to frame order — a cheap relayout of the smallest tensor in the
pipeline.

Functional parity target: lhotse/features/kaldi/layers.py (Wav2LogFilterBank
forward path).
"""
from functools import partial

import jax
import numpy as np

from lhotse_tpu.ops import fbank as ops

FRAME_LEN = 400
HOP = 160
PHASES = 4            # frames per 640-sample row
ROW = PHASES * HOP    # 640 = lcm(HOP, 128): the repack row width
CHUNK = 512           # 128-aligned lane window covering 32*3 + 400 samples
# Frames per grid step. 512 (=> K = 128 slab rows) fills the MXU M-dimension
# and measured ~7% faster than 256 on v5e at bench shapes; 256 halves the
# zero-pad bucket for short utterances. fbank_fused_padded picks whichever
# wastes fewer padded frames.
BLOCK_T_CHOICES = (512, 256)
BLOCK_T = 512


def _kernel(audio_hbm, shifted_hbm, d0, d1, d2, d3, mel, out_ref, slab_a, slab_b, sem_a, sem_b, *, eps: float, K: int):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)

    # Two overlapping row windows: row k frames may run into row k+1
    # (160*3 + 400 = 880 < 1280). ``shifted_hbm`` is the same audio advanced
    # by one 640-sample row, so both DMAs start at t*K — Mosaic requires
    # slice starts divisible by the 8-sublane tile, which t*K + 1 is not —
    # and both slabs land at sublane offset 0, which the lane-concat below
    # requires on its non-concat dimension.
    copy_a = pltpu.make_async_copy(audio_hbm.at[b, pl.ds(t * K, K), :], slab_a, sem_a)
    copy_b = pltpu.make_async_copy(shifted_hbm.at[b, pl.ds(t * K, K), :], slab_b, sem_b)
    copy_a.start()
    copy_b.start()
    copy_a.wait()
    copy_b.wait()

    cat = jnp.concatenate([slab_a[:], slab_b[:]], axis=1)  # (K, 1280)

    hi = jax.lax.Precision.HIGHEST
    for p, dp in enumerate((d0, d1, d2, d3)):
        chunk = cat[:, 128 * p : 128 * p + CHUNK]  # 128-aligned, 512 lanes
        spec = jnp.dot(chunk, dp[:], precision=hi, preferred_element_type=jnp.float32)
        bins = spec.shape[1] // 2
        pow_spec = spec[:, :bins] ** 2 + spec[:, bins:] ** 2
        melspec = jnp.dot(pow_spec, mel[:], precision=hi, preferred_element_type=jnp.float32)
        out_ref[0, p] = jnp.log(jnp.maximum(melspec, eps))


def _squeeze_nyquist(Mc: np.ndarray, Ms: np.ndarray, mel_fb: np.ndarray):
    """Drop the Nyquist bin (zero mel row by construction) -> 256-bin GEMMs."""
    bins = Mc.shape[1]
    if bins == 257:
        if mel_fb[256].any():
            raise ValueError("fbank_pallas requires a zero Nyquist mel row (257-bin input).")
        return Mc[:, :256], Ms[:, :256], mel_fb[:256]
    if bins % 128 == 0:
        return Mc, Ms, mel_fb
    raise ValueError(f"Unsupported spectrum bin count for the TPU kernel: {bins}")


def fbank_pallas(
    audio, Mc: np.ndarray, Ms: np.ndarray, mel_fb: np.ndarray, *,
    eps: float = float(np.finfo(np.float32).eps), interpret: bool = False,
    block_t: int = None):
    """
    Fused fbank over pre-padded audio.

    :param audio: (B, N) float32 with N == num_frames * 160 + 640 and
        num_frames a multiple of BLOCK_T (pad the tail with zeros; slice the
        output with true frame counts as usual). Frame i reads samples
        [160*i, 160*i + 400) — the final 400 padding samples are never part
        of a frame; they only square off the 640-wide row view.
    :param Mc/Ms: (400, bins) folded DFT analysis matrices (bins = 257 with
        a zero-Nyquist mel row, or a 128-multiple).
    :param mel_fb: (bins, num_mels) mel filterbank.
    :return: (B, num_frames, num_mels) float32 log-mel features.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = audio.shape
    num_frames = (N - ROW) // HOP
    if block_t is None:
        block_t = next(
            (b for b in BLOCK_T_CHOICES if num_frames % b == 0), BLOCK_T)
    assert N == num_frames * HOP + ROW and num_frames % block_t == 0, (
        f"audio length must be num_frames * {HOP} + {ROW} with num_frames a "
        f"multiple of block_t ({block_t}); got N={N}."
    )
    assert Mc.shape[0] == FRAME_LEN, f"expected {FRAME_LEN}-sample frames"
    Mc, Ms, mel_fb = _squeeze_nyquist(
        np.asarray(Mc, np.float32), np.asarray(Ms, np.float32), np.asarray(mel_fb, np.float32))
    grid_t = num_frames // block_t
    K = block_t // PHASES
    num_mels = mel_fb.shape[1]
    bins2 = 2 * Mc.shape[1]

    # Four phase-shifted copies of the packed [Mc | Ms] analysis matrix.
    dft = np.concatenate([Mc, Ms], axis=1)  # (400, 2*bins)
    phased = []
    for p in range(PHASES):
        dp = np.zeros((CHUNK, bins2), np.float32)
        dp[32 * p : 32 * p + FRAME_LEN] = dft
        phased.append(jnp.asarray(dp))
    mel = jnp.asarray(mel_fb)

    audio3d = audio.reshape(B, N // ROW, ROW)
    shifted3d = audio[:, ROW:].reshape(B, N // ROW - 1, ROW)

    out = pl.pallas_call(
        partial(_kernel, eps=eps, K=K),
        grid=(B, grid_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # row-shifted audio view
            pl.BlockSpec(memory_space=pltpu.VMEM),  # phase-0 DFT
            pl.BlockSpec(memory_space=pltpu.VMEM),  # phase-1 DFT
            pl.BlockSpec(memory_space=pltpu.VMEM),  # phase-2 DFT
            pl.BlockSpec(memory_space=pltpu.VMEM),  # phase-3 DFT
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel bank
        ],
        out_specs=pl.BlockSpec(
            (1, PHASES, K, num_mels), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, PHASES, num_frames // PHASES, num_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, ROW), jnp.float32), pltpu.VMEM((K, ROW), jnp.float32),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(audio3d, shifted3d, *phased, mel)

    # (B, 4, T/4, mels) phase-major -> (B, T, mels) frame order (i = 4k + p).
    return out.transpose(0, 2, 1, 3).reshape(B, num_frames, num_mels)


def _is_tpu_backend() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_pallas_default() -> bool:
    """Route fbank through the fused Pallas kernel? Env-overridable
    (``LHOTSE_TPU_FBANK_PALLAS=1/0``); defaults to on for TPU backends."""
    import os

    if os.environ.get("LHOTSE_TPU_FBANK_PALLAS") == "1":
        return True
    if os.environ.get("LHOTSE_TPU_FBANK_PALLAS") == "0":
        return False
    return _is_tpu_backend()


def fbank_fused_padded(
    x, Mc: np.ndarray, Ms: np.ndarray, mel_fb: np.ndarray, *, snip_edges: bool = False,
    eps: float = float(np.finfo(np.float32).eps)):
    """
    :func:`fbank_pallas` over raw (B, N) audio: applies the snip_edges=False
    symmetric edge padding (matching ``ops.frame_signal``), zero-pads the
    frame count up to the BLOCK_T bucket, runs the kernel, and slices back to
    the true frame count. All shape arithmetic is static, so this is
    jit-safe.
    """
    import jax.numpy as jnp

    B, N = x.shape
    if snip_edges:
        num_frames = (N - FRAME_LEN) // HOP + 1
        padded = x
    else:
        num_frames = (N + HOP // 2) // HOP
        new_n = (num_frames - 1) * HOP + FRAME_LEN
        npad_left = (FRAME_LEN - HOP) // 2
        npad_right = new_n - N - npad_left
        if npad_right >= 0:
            padded = jnp.pad(x, ((0, 0), (npad_left, npad_right)), mode="symmetric")
        else:
            padded = jnp.pad(x, ((0, 0), (npad_left, 0)), mode="symmetric")
            padded = padded[:, :new_n]
    # Pick the block that wastes the fewest padded frames: the large block
    # only when it costs no extra padding over the small one.
    big, small = BLOCK_T_CHOICES
    block_t = big if -(-num_frames // big) * big <= -(-num_frames // small) * small else small
    t_bucket = -(-num_frames // block_t) * block_t
    padded = jnp.pad(padded, ((0, 0), (0, t_bucket * HOP + ROW - padded.shape[1])))
    return fbank_pallas(padded, Mc, Ms, mel_fb, eps=eps, block_t=block_t)[:, :num_frames]


def fbank_fused(audio, Mc, Ms, mel_fb, *, eps: float = float(np.finfo(np.float32).eps)):
    """
    Best-available fused fbank: the Pallas kernel on TPU backends, the XLA
    GEMM path elsewhere (CPU/GPU interpret-mode Pallas would be pure
    overhead). Same (B, num_frames * HOP + ROW) input contract.
    """
    if _is_tpu_backend():
        try:
            return fbank_pallas(audio, Mc, Ms, mel_fb, eps=eps)
        except Exception:
            pass
    num_frames = (audio.shape[1] - ROW) // HOP
    return reference_fbank(
        audio[:, : num_frames * HOP + (FRAME_LEN - HOP)], Mc, Ms, mel_fb, eps=eps)


def reference_fbank(audio, Mc, Ms, mel_fb, eps=float(np.finfo(np.float32).eps)):
    """XLA-path equivalent of :func:`fbank_pallas` (for parity tests):
    frames via gather, then the same two GEMMs."""
    import jax.numpy as jnp

    frames = ops.frame_signal(audio, FRAME_LEN, HOP, snip_edges=True)
    ps = ops.power_spectrum_gemm(frames, jnp.asarray(Mc), jnp.asarray(Ms))
    out = jnp.matmul(ps, jnp.asarray(mel_fb), precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(out, eps))
