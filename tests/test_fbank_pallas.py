"""Pallas fused fbank kernel: interpret-mode parity with the XLA path."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from lhotse_tpu.ops import fbank as ops
from lhotse_tpu.ops.fbank import get_mel_banks
from lhotse_tpu.ops.fbank_pallas import (
    BLOCK_T, FRAME_LEN, HOP, ROW, fbank_fused, fbank_pallas, reference_fbank)


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
    N = num_frames * HOP + ROW
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(B, N).astype(np.float32) * 0.1)
    out_p = np.asarray(fbank_pallas(audio, Mc, Ms, fb, interpret=True))
    out_r = np.asarray(
        reference_fbank(audio[:, : num_frames * HOP + (FRAME_LEN - HOP)], Mc, Ms, fb)
    )
    assert out_p.shape == (B, num_frames, 80)
    # Phase-shifted GEMMs reorder sums; tolerance well inside the 5e-4
    # feature parity budget.
    assert np.abs(out_p - out_r[:, :num_frames]).max() < 5e-5


def test_interpret_parity_zero_padded_tail(matrices):
    # The extractor pads real audio with zeros up to the BLOCK_T bucket;
    # frames covering real audio must be unaffected by the bucket padding.
    Mc, Ms, fb = matrices
    true_frames = 100
    num_frames = BLOCK_T
    rng = np.random.RandomState(2)
    real = rng.randn(1, true_frames * HOP + FRAME_LEN - HOP).astype(np.float32) * 0.1
    audio = np.zeros((1, num_frames * HOP + ROW), np.float32)
    audio[:, : real.shape[1]] = real
    out_p = np.asarray(fbank_pallas(jnp.asarray(audio), Mc, Ms, fb, interpret=True))
    out_r = np.asarray(reference_fbank(jnp.asarray(real), Mc, Ms, fb))
    assert np.abs(out_p[:, :true_frames] - out_r).max() < 5e-5


def test_fused_fallback_runs(matrices):
    Mc, Ms, fb = matrices
    B, num_frames = 1, BLOCK_T
    N = num_frames * HOP + ROW
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(B, N).astype(np.float32) * 0.1)
    out = np.asarray(fbank_fused(audio, Mc, Ms, fb))
    assert out.shape == (1, num_frames, 80)
    assert np.isfinite(out).all()


def test_nyquist_row_must_be_zero(matrices):
    Mc, Ms, fb = matrices
    bad_fb = fb.copy()
    bad_fb[256, 0] = 1.0
    audio = jnp.zeros((1, BLOCK_T * HOP + ROW), jnp.float32)
    with pytest.raises(ValueError, match="Nyquist"):
        fbank_pallas(audio, Mc, Ms, bad_fb, interpret=True)


def test_extractor_pallas_fallback_parity(monkeypatch):
    # With the kernel force-enabled on a CPU backend, the lowering fails and
    # the extractor must fall back to the XLA path with identical output.
    from lhotse_tpu.features.kaldi.extractors import Fbank, FbankConfig

    rng = np.random.RandomState(3)
    samples = rng.randn(16000).astype(np.float32) * 0.1

    monkeypatch.setenv("LHOTSE_TPU_FBANK_PALLAS", "0")
    base = Fbank(FbankConfig()).extract(samples, 16000)

    monkeypatch.setenv("LHOTSE_TPU_FBANK_PALLAS", "1")
    forced = Fbank(FbankConfig()).extract(samples, 16000)

    assert forced.shape == base.shape
    np.testing.assert_array_equal(forced, base)


def test_mfcc_fused_routing():
    """The default MFCC config must map onto the fused kernel (23 mel
    filters, zero Nyquist row), and CPU execution routes through the GEMM
    path untouched."""
    from lhotse_tpu.features.kaldi.layers import Wav2MFCC

    layer = Wav2MFCC(sampling_rate=16000)
    assert layer._fused_matrices() is not None
    rng = np.random.RandomState(4)
    out = np.asarray(layer(rng.randn(2, 16000).astype(np.float32) * 0.1))
    assert out.shape == (2, 100, 13)
    assert np.isfinite(out).all()


def test_mfcc_fused_interpret_numerics():
    """Interpret-mode Pallas log-mel (23 filters) + DCT equals the XLA MFCC
    numerics over identical snip-edges frames."""
    from lhotse_tpu.features.kaldi.layers import Wav2MFCC

    layer = Wav2MFCC(sampling_rate=16000)
    Mc, Ms, fb_padded, n_mels = layer._fused_matrices()
    assert n_mels == 23 and fb_padded.shape[1] == 128  # lane-padded bank

    num_frames = BLOCK_T
    n = num_frames * HOP + ROW
    rng = np.random.RandomState(5)
    audio = jnp.asarray(rng.randn(1, n).astype(np.float32) * 0.1)

    # The exact padded bank the forward path ships to the kernel.
    logmel_fused = np.asarray(
        fbank_pallas(audio, Mc, Ms, fb_padded, interpret=True))[..., :n_mels]
    fb = fb_padded[:, :n_mels]
    logmel_ref = np.asarray(
        reference_fbank(audio[:, : num_frames * HOP + (FRAME_LEN - HOP)], Mc, Ms, fb))
    assert np.abs(logmel_fused - logmel_ref[:, :num_frames]).max() < 5e-5

    mfcc_fused = np.asarray(ops.mfcc_from_logmel(
        jnp.asarray(logmel_fused), jnp.asarray(layer._dct), jnp.asarray(layer._lifter)))
    mfcc_ref = np.asarray(ops.mfcc_from_logmel(
        jnp.asarray(logmel_ref[:, :num_frames]), jnp.asarray(layer._dct),
        jnp.asarray(layer._lifter)))
    assert np.abs(mfcc_fused - mfcc_ref).max() < 5e-4
