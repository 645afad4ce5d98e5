"""
Fused Pallas TPU kernel for log-mel fbank extraction.

Fuses the whole hot path — overlapped framing → (preprocessing-folded)
DFT GEMM → power spectrum → mel GEMM → eps-floored log — into one kernel:

- the (num_frames, frame_len) frames matrix is never materialized in HBM
  (the XLA path writes + re-reads ~2.5x the audio size at float32 width);
  each grid step DMAs only the audio slab its frame block overlaps from HBM
  into VMEM;
- overlapped framing is expressed as a split-K matmul: with hop=160 dividing
  the 400-sample frame as 160+160+80, ``frames @ M`` equals
  ``A[i] @ M0 + A[i+1] @ M1 + A[i+2,:80] @ M2`` over the hop-strided 2-D
  audio view A — three MXU dots, no in-kernel reshape/concat (Mosaic-
  friendly layouts);
- both GEMMs run at f32 (HIGHEST) precision — required for the 1e-4-class
  parity contract (bf16x3 'HIGH' measurably breaks it: ~1.4e-3 max error vs
  golden on chip);
- the small (frames, num_mels) output is the only HBM write.

The caller provides the audio as a hop-strided 2-D view (B, rows, HOP)
(a free XLA reshape of pre-padded audio), so frame i covers rows i, i+1 and
the first 80 samples of row i+2.

Status note (measured on this chip's toolchain): Mosaic currently cannot
lower HOP=160-lane HBM slices or (n,)→(rows, 160) vector reshapes (lane
counts must be 128-aligned), so the compiled-kernel path is unavailable on
TPU for the Kaldi 160-sample hop; the kernel is validated in interpret mode
(1e-5 agreement with the XLA path) and :func:`fbank_fused` transparently
falls back to the XLA path. The fallback costs little: profiling shows the
pipeline is dominated by the f32 (HIGHEST) DFT GEMM, not the frames-matrix
HBM traffic this kernel eliminates (~0.8 ms of a 12 ms batch). The
higher-impact planned optimization is factoring the 512-point DFT into two
small GEMM stages (Cooley-Tukey as batched matmuls, ~4x FLOP reduction)
while keeping f32 accuracy.
"""
from functools import partial

import jax
import numpy as np

from lhotse_tpu.ops import fbank as ops

FRAME_LEN = 400
HOP = 160
BLOCK_T = 256  # frames per grid step


def _kernel(audio_hbm, dft0, dft1, dft2, mel, out_ref, slab, sem, *, eps: float):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)

    # DMA the (BLOCK_T + 2, HOP) hop-strided audio rows for this frame block.
    copy = pltpu.make_async_copy(
        audio_hbm.at[b, pl.ds(t * BLOCK_T, BLOCK_T + 2), :], slab, sem
    )
    copy.start()
    copy.wait()

    a = slab[:]
    hi = jax.lax.Precision.HIGHEST
    # frames @ [Mc|Ms] as a split-K matmul over the three hop-chunks.
    spec = (
        jnp.dot(a[:BLOCK_T], dft0[:], precision=hi, preferred_element_type=jnp.float32)
        + jnp.dot(a[1 : BLOCK_T + 1], dft1[:], precision=hi, preferred_element_type=jnp.float32)
        + jnp.dot(
            a[2 : BLOCK_T + 2, : FRAME_LEN - 2 * HOP],
            dft2[:],
            precision=hi,
            preferred_element_type=jnp.float32,
        )
    )  # (BLOCK_T, 2*bins)
    bins = spec.shape[1] // 2
    pow_spec = spec[:, :bins] ** 2 + spec[:, bins:] ** 2

    melspec = jnp.dot(pow_spec, mel[:], precision=hi, preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(melspec, eps))


def fbank_pallas(
    audio,
    Mc: np.ndarray,
    Ms: np.ndarray,
    mel_fb: np.ndarray,
    *,
    eps: float = float(np.finfo(np.float32).eps),
    interpret: bool = False,
):
    """
    Fused fbank over pre-padded audio.

    :param audio: (B, N) float32 with N == (num_frames + 2) * 160 and
        num_frames a multiple of BLOCK_T (pad the tail with zeros; slice the
        output with true frame counts as usual).
    :param Mc/Ms: (400, bins) folded DFT analysis matrices.
    :param mel_fb: (bins, num_mels) mel filterbank.
    :return: (B, num_frames, num_mels) float32 log-mel features.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = audio.shape
    num_frames = N // HOP - 2
    assert N == (num_frames + 2) * HOP and num_frames % BLOCK_T == 0, (
        f"audio length must be (num_frames + 2) * {HOP} with num_frames a "
        f"multiple of BLOCK_T ({BLOCK_T}); got N={N}."
    )
    grid_t = num_frames // BLOCK_T
    num_mels = mel_fb.shape[1]

    # Pack [Mc | Ms] and split along K into the three hop-chunks.
    dft = np.concatenate([Mc, Ms], axis=1).astype(np.float32)  # (400, 2*bins)
    dft0 = jnp.asarray(dft[:HOP])
    dft1 = jnp.asarray(dft[HOP : 2 * HOP])
    dft2 = jnp.asarray(dft[2 * HOP :])
    mel = jnp.asarray(mel_fb, dtype=jnp.float32)

    audio3d = audio.reshape(B, N // HOP, HOP)

    return pl.pallas_call(
        partial(_kernel, eps=eps),
        grid=(B, grid_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dft chunk 0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dft chunk 1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dft chunk 2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel bank
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_T, num_mels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, num_frames, num_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_T + 2, HOP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio3d, dft0, dft1, dft2, mel)


def fbank_fused(audio, Mc, Ms, mel_fb, *, eps: float = float(np.finfo(np.float32).eps)):
    """
    Best-available fused fbank: try the Pallas kernel, fall back to the XLA
    GEMM path when the kernel cannot lower on the current toolchain (see the
    module status note). Same (B, (num_frames+2)*HOP) input contract.
    """
    try:
        return fbank_pallas(audio, Mc, Ms, mel_fb, eps=eps)
    except Exception:
        num_frames = audio.shape[1] // HOP - 2
        return reference_fbank(
            audio[:, : num_frames * HOP + (FRAME_LEN - HOP)], Mc, Ms, mel_fb, eps=eps
        )


def reference_fbank(audio, Mc, Ms, mel_fb, eps=float(np.finfo(np.float32).eps)):
    """XLA-path equivalent of :func:`fbank_pallas` (for parity tests):
    frames via gather, then the same two GEMMs."""
    import jax.numpy as jnp

    frames = ops.frame_signal(audio, FRAME_LEN, HOP, snip_edges=True)
    ps = ops.power_spectrum_gemm(frames, jnp.asarray(Mc), jnp.asarray(Ms))
    out = jnp.matmul(ps, jnp.asarray(mel_fb), precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(out, eps))
