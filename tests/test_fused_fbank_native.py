"""
Native fused fbank kernel (native/dsp/dsp_kernels.c::fbank_fused_f32):
parity against the staged numpy pipeline it replaces, virtual-edge-padding
equivalence, envelope fallbacks, and the host dither fix.

The staged numpy path is itself pinned against the live reference
(tests/test_refdiff_kaldi_features.py), so fused==numpy at ~1e-3 log-domain
tolerance transitively preserves the reference parity budget (the residual
is float32 FFT noise: radix-2 vs pocketfft rounding, amplified by log on
near-silent mel bins).
"""
import numpy as np
import pytest

from lhotse_tpu.features.kaldi.extractors import Fbank, FbankConfig
from lhotse_tpu.ops import host_dsp

pytestmark = pytest.mark.skipif(
    not host_dsp.is_available(), reason="native dsp library unavailable"
)


def _disable_fused(monkeypatch):
    monkeypatch.setattr(host_dsp, "fbank_fused", lambda *a, **k: None)


def _rand_clip(seconds=3.0, sr=16000, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(int(sr * seconds)) * 0.1).astype(np.float32)


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"use_energy": True},
        {"use_fft_mag": True},
        {"remove_dc_offset": False},
        {"preemph_coeff": 0.0},
        {"window_type": "hanning"},
        {"num_filters": 40},
        {"sampling_rate": 8000},
    ],
)
def test_fused_matches_numpy_path(monkeypatch, kwargs):
    sr = kwargs.get("sampling_rate", 16000)
    x = _rand_clip(sr=sr)
    a = Fbank(FbankConfig(**kwargs)).extract(x, sr)
    _disable_fused(monkeypatch)
    b = Fbank(FbankConfig(**kwargs)).extract(x, sr)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-3)


def test_fused_snip_edges(monkeypatch):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cfg = FbankConfig(snip_edges=True)
        x = _rand_clip()
        a = Fbank(cfg).extract(x, 16000)
        _disable_fused(monkeypatch)
        b = Fbank(FbankConfig(snip_edges=True)).extract(x, 16000)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-3)


def test_fused_virtual_padding_matches_materialized():
    """pad_left>0 (raw input, reflect map in-kernel) must equal pad_left==0
    on the materialized padded copy, bit-for-bit."""
    fb = Fbank()
    x = _rand_clip(seconds=1.7, seed=3)
    n_frames = fb._num_frames(x.shape[-1])
    raw = fb._fused_native_raw(x, n_frames)
    prepared = fb._prepare_item(x)
    mat = fb._fused_native_item(prepared, n_frames)
    assert raw is not None and mat is not None
    np.testing.assert_array_equal(raw, mat)


def test_fused_short_item_falls_back():
    """Items shorter than one frame cannot use the virtual-pad path but must
    still produce features via the padded-copy path."""
    fb = Fbank()
    x = _rand_clip(seconds=0.02, seed=4)  # 320 samples < 400 frame length
    assert fb._fused_native_raw(x, fb._num_frames(x.shape[-1])) is None
    out = fb.extract(x, 16000)
    assert out.shape == (fb._num_frames(x.shape[-1]), 80)
    assert np.isfinite(out).all()


def test_fused_batch_path_equals_per_item():
    fb = Fbank()
    clips = [_rand_clip(seconds=s, seed=i) for i, s in enumerate([1.0, 2.3, 0.6])]
    batch = fb.extract_batch(clips, sampling_rate=16000)
    for clip, got in zip(clips, batch):
        np.testing.assert_array_equal(got, fb.extract(clip, 16000))


def test_fused_extreme_inputs_finite():
    fb = Fbank()
    silent = np.zeros(16000, dtype=np.float32)
    out = fb.extract(silent, 16000)
    assert np.isfinite(out).all()
    # all-zero mel energies clamp to float32 eps -> log(eps)
    np.testing.assert_allclose(out, np.log(np.finfo(np.float32).eps), atol=1e-5)
    loud = np.full(16000, 0.99, dtype=np.float32)
    assert np.isfinite(fb.extract(loud, 16000)).all()


def test_dither_is_applied_on_host_path():
    """config.dither must perturb the CPU-path output (it was silently
    ignored before); dither=0 stays deterministic."""
    x = _rand_clip()
    np.random.seed(0)
    a = Fbank(FbankConfig(dither=0.1)).extract(x, 16000)
    np.random.seed(1)
    b = Fbank(FbankConfig(dither=0.1)).extract(x, 16000)
    assert not np.allclose(a, b)
    # Magnitude sanity: small dither, small perturbation.
    base = Fbank().extract(x, 16000)
    assert np.max(np.abs(a - base)) < 5.0
    c = Fbank(FbankConfig(dither=0.0)).extract(x, 16000)
    np.testing.assert_array_equal(c, base)


def test_dither_applied_in_extract_batch():
    x = _rand_clip()
    np.random.seed(0)
    a = Fbank(FbankConfig(dither=0.1)).extract_batch([x, x], sampling_rate=16000)
    assert not np.allclose(a[0], a[1])  # independent noise per item
