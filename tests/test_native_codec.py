"""Native LTC1 codec: cross-implementation and cross-method compatibility."""
import importlib
import os

import numpy as np
import pytest

from lhotse_tpu.codecs import lilcom_codec as L


@pytest.fixture
def smooth():
    rng = np.random.RandomState(0)
    return np.cumsum(rng.randn(500, 80).astype(np.float32) * 0.3, axis=0) * 0.05 - 10


@pytest.fixture
def noisy():
    return np.random.RandomState(1).randn(500, 80).astype(np.float32)


def _reload_with_native(enabled: bool):
    if enabled:
        os.environ.pop("LHOTSE_TPU_NO_NATIVE", None)
    else:
        os.environ["LHOTSE_TPU_NO_NATIVE"] = "1"
    importlib.reload(L)
    return L


def teardown_module(module):
    os.environ.pop("LHOTSE_TPU_NO_NATIVE", None)
    importlib.reload(L)


def test_error_bound(smooth, noisy):
    for x in (smooth, noisy):
        y = L.decompress(L.compress(x))
        assert np.abs(y - x).max() <= 2**-6 + 1e-7


def test_cross_implementation_decode(smooth):
    Ln = _reload_with_native(True)
    b_native = Ln.compress(smooth)
    y_native = Ln.decompress(b_native)

    Lp = _reload_with_native(False)
    y_py = Lp.decompress(b_native)  # numpy decodes native rowpack
    np.testing.assert_array_equal(np.asarray(y_native), np.asarray(y_py))

    b_py = Lp.compress(smooth)  # numpy zlib method 0
    Ln = _reload_with_native(True)
    y_cross = Ln.decompress(b_py)  # native decodes method 0
    np.testing.assert_array_equal(np.asarray(y_py), np.asarray(y_cross))


def test_rowpack_ratio_beats_raw(smooth, noisy):
    if L._native_lib() is None:
        pytest.skip("native codec unavailable")
    for x, min_ratio in ((smooth, 6.0), (noisy, 2.0)):
        b = L.compress(x)
        assert x.nbytes / len(b) > min_ratio


def test_1d_and_3d_arrays():
    for shape in ((100,), (10, 4, 8)):
        x = np.random.RandomState(2).randn(*shape).astype(np.float32)
        y = L.decompress(L.compress(x))
        assert y.shape == shape
        assert np.abs(y - x).max() <= 2**-6 + 1e-7


def test_tick_power():
    x = np.random.RandomState(3).randn(50, 8).astype(np.float32)
    y = L.decompress(L.compress(x, tick_power=-8))
    assert np.abs(y - x).max() <= 2**-9 + 1e-7
