"""
Native host-DSP kernels (native/dsp/dsp_kernels.c) must agree with the pure
numpy fallbacks they accelerate — the fallbacks are the executable spec.
"""
import numpy as np
import pytest

from lhotse_tpu.ops import host_dsp


@pytest.fixture(autouse=True)
def require_native():
    if not host_dsp.is_available():
        pytest.skip("no C compiler in this environment")


@pytest.fixture
def force_numpy(monkeypatch):
    """Context helper: call extractors with the native library disabled."""

    def _ctx():
        return monkeypatch.context()

    return _ctx


def test_frame_prep_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=5000).astype(np.float32)
    length, shift, fft_len = 400, 160, 512
    n_frames = (x.shape[0] - length) // shift + 1
    window = np.hanning(length).astype(np.float64)

    for coeff, dc, energy in [(0.0, False, False), (0.97, True, True), (0.97, False, True)]:
        out, log_e = host_dsp.frame_prep(
            x, length, shift, n_frames, window, fft_len,
            preemph_coeff=coeff, remove_dc=dc, want_energy=energy,
            energy_floor=1e-10 if energy else 0.0)
        # numpy spec
        frames = np.lib.stride_tricks.sliding_window_view(x, length)[::shift][
            :n_frames
        ].astype(np.float64)
        means = frames.mean(axis=-1, keepdims=True)
        if energy:
            c = frames - means
            expected_e = np.maximum(np.log((c * c).sum(-1) + 1e-15), np.log(1e-10))
            np.testing.assert_allclose(log_e, expected_e, rtol=1e-12, atol=1e-12)
        if dc:
            frames = frames - means
        if coeff:
            frames = frames - coeff * np.concatenate(
                [frames[:, :1], frames[:, :-1]], axis=-1)
        frames = frames * window
        np.testing.assert_allclose(out[:, :length], frames, rtol=1e-12, atol=1e-14)
        assert np.all(out[:, length:] == 0.0)


def test_power_spectrum_matches_numpy():
    rng = np.random.default_rng(1)
    spec = (rng.normal(size=(7, 257)) + 1j * rng.normal(size=(7, 257))).astype(np.complex128)
    # The kernel compiles with -march=native: re*re+im*im contracts to an
    # FMA (more accurate than numpy's two-rounding sum) — identity only up
    # to the last ulp.
    np.testing.assert_allclose(
        host_dsp.power_spectrum(spec), spec.real**2 + spec.imag**2, rtol=1e-15)
    np.testing.assert_allclose(
        host_dsp.power_spectrum(spec, magnitude=True), np.abs(spec), rtol=1e-14)


def test_scale_i32_to_f32():
    pcm = np.array([[-32768, -1, 0, 1, 32767]], dtype=np.int32)
    out = host_dsp.scale_i32_to_f32(pcm, 1.0 / 32768.0)
    np.testing.assert_array_equal(out, pcm.astype(np.float32) * np.float32(1 / 32768.0))
    assert out.dtype == np.float32 and out.shape == pcm.shape


def test_sinc_resample_matches_strided_matmul():
    from lhotse_tpu.augmentation.resample import get_sinc_resample_kernel

    rng = np.random.default_rng(2)
    x = rng.normal(size=48321).astype(np.float32)
    o, n = 10, 11  # 16000 -> 17600 reduced
    kernel, width = get_sinc_resample_kernel(16000, 17600)
    padded = np.pad(x, (width, width + o))
    K = kernel.shape[1]
    num_blocks = (padded.shape[0] - K) // o + 1
    out = host_dsp.sinc_resample(padded, num_blocks, kernel, o)
    frames = np.lib.stride_tricks.as_strided(
        padded, shape=(num_blocks, K), strides=(o * 4, 4))
    expected = (frames @ kernel.T).reshape(-1)
    np.testing.assert_allclose(out, expected, atol=2e-6)


def test_extractors_identical_with_and_without_native(monkeypatch):
    """f64 chain: the native kernel and the numpy fallback are bit-identical
    (same double arithmetic, no contraction ambiguity)."""
    from lhotse_tpu import Fbank, Mfcc

    monkeypatch.setenv("LHOTSE_TPU_HOST_FFT_DTYPE", "float64")
    rng = np.random.default_rng(3)
    sig = (0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
           + 0.05 * rng.normal(size=16000)).astype(np.float32)
    for ex in [Fbank(), Mfcc()]:
        native = ex.extract(sig, 16000)
        monkeypatch.setattr(host_dsp, "_LIB", None)
        monkeypatch.setattr(host_dsp, "_LIB_FAILED", True)
        fallback = ex.extract(sig, 16000)
        monkeypatch.setattr(host_dsp, "_LIB_FAILED", False)
        np.testing.assert_array_equal(native, fallback)


def test_extractors_close_with_and_without_native_f32(monkeypatch):
    """f32 chain (the default): the fused native kernel runs its own radix-2
    f32 FFT (vs pocketfft in the fallback) plus FMA contraction, so agreement
    is f32-FFT-noise-floor only — log amplifies it on near-silent mel bins
    (~3e-4 log-domain; far inside the stored-feature budget, which is
    dominated by the codec's 2^-5 quantization tick)."""
    from lhotse_tpu import Fbank, Mfcc

    rng = np.random.default_rng(4)
    sig = (0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
           + 0.05 * rng.normal(size=16000)).astype(np.float32)
    for ex in [Fbank(), Mfcc()]:
        native = ex.extract(sig, 16000)
        monkeypatch.setattr(host_dsp, "_LIB", None)
        monkeypatch.setattr(host_dsp, "_LIB_FAILED", True)
        fallback = ex.extract(sig, 16000)
        monkeypatch.setattr(host_dsp, "_LIB_FAILED", False)
        np.testing.assert_allclose(native, fallback, atol=1e-3)
