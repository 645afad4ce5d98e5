"""Pallas fused fbank kernel: interpret-mode parity with the XLA path."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from lhotse_tpu.ops import fbank as ops
from lhotse_tpu.ops.fbank import get_mel_banks
from lhotse_tpu.ops.fbank_pallas import (
    BLOCK_T,
    FRAME_LEN,
    HOP,
    fbank_fused,
    fbank_pallas,
    reference_fbank,
)


@pytest.fixture(scope="module")
def matrices():
    Mc, Ms = ops.dft_analysis_matrices(400, 512)
    mel, _ = get_mel_banks(80, 512, 16000, 20.0, -400.0)
    fb = np.zeros((257, 80), np.float32)
    fb[:256] = mel.T
    return Mc, Ms, fb


def test_interpret_parity(matrices):
    Mc, Ms, fb = matrices
    B, num_frames = 2, BLOCK_T * 2
    N = (num_frames + 2) * HOP
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(B, N).astype(np.float32) * 0.1)
    out_p = np.asarray(fbank_pallas(audio, Mc, Ms, fb, interpret=True))
    out_r = np.asarray(
        reference_fbank(audio[:, : num_frames * HOP + (FRAME_LEN - HOP)], Mc, Ms, fb)
    )
    assert out_p.shape == (B, num_frames, 80)
    # Split-K accumulation reorders sums; tolerance well inside the 5e-4
    # feature parity budget.
    assert np.abs(out_p - out_r[:, :num_frames]).max() < 5e-5


def test_fused_fallback_runs(matrices):
    Mc, Ms, fb = matrices
    B, num_frames = 1, BLOCK_T
    N = (num_frames + 2) * HOP
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(B, N).astype(np.float32) * 0.1)
    out = np.asarray(fbank_fused(audio, Mc, Ms, fb))
    assert out.shape[0] == 1 and out.shape[2] == 80
    assert np.isfinite(out).all()
