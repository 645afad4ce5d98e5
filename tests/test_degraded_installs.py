"""
Degraded-install behavior: optional deps missing must degrade gracefully
(the reference runs CI legs with deliberately missing optional packages,
e.g. test/test_missing_lilcom.py).
"""
import importlib
import os

import numpy as np
import pytest


def test_native_disabled_codec_roundtrip(monkeypatch):
    """With LHOTSE_TPU_NO_NATIVE=1 the numpy LTC1 codec stands alone."""
    monkeypatch.setenv("LHOTSE_TPU_NO_NATIVE", "1")
    from lhotse_tpu.codecs import lilcom_codec as L

    importlib.reload(L)
    try:
        x = np.random.RandomState(0).randn(100, 40).astype(np.float32)
        y = L.decompress(L.compress(x))
        assert np.abs(y - x).max() <= 2**-6 + 1e-7
    finally:
        monkeypatch.delenv("LHOTSE_TPU_NO_NATIVE")
        importlib.reload(L)


def test_gated_extractors_raise_informative_errors():
    from lhotse_tpu import OpenSmileConfig, OpenSmileExtractor, S3PRLSSL

    with pytest.raises(AssertionError, match="opensmile"):
        OpenSmileExtractor()
    with pytest.raises(AssertionError, match="s3prl"):
        S3PRLSSL()
    # is_module_available must not crash on dotted names w/o the parent pkg.
    from lhotse_tpu.utils import is_module_available

    assert is_module_available("s3prl.hub") is False
    with pytest.raises(AssertionError, match="opensmile"):
        OpenSmileConfig.featuresets_names()


def test_hdf5_backend_roundtrip_when_available(tmp_path):
    """h5py IS in this image: the gated HDF5 backends must actually work."""
    from lhotse_tpu.features.io import get_reader, get_writer

    x = np.random.RandomState(1).randn(50, 8).astype(np.float32)
    with get_writer("numpy_hdf5")(tmp_path / "f.h5") as w:
        key = w.write("utt1", x)
    y = get_reader("numpy_hdf5")(tmp_path / "f.h5").read(key)
    np.testing.assert_array_equal(x, y)


def test_missing_sdk_workflows_raise_informative_errors(tmp_path):
    from lhotse_tpu.recipes import prepare_gigaspeech
    from lhotse_tpu.workflows import annotate_dnsmos

    with pytest.raises(ImportError, match="speechcolab"):
        prepare_gigaspeech(tmp_path, output_dir=tmp_path)
    with pytest.raises(AssertionError, match="onnxruntime"):
        next(annotate_dnsmos([]))


def test_audio_backends_exclude_unavailable():
    import sys

    from lhotse_tpu.audio import available_audio_backends

    names = available_audio_backends()
    # The dependency-free backends are always present...
    assert "InternalWavBackend" in names
    assert "FlacBackend" in names
    # ...and SDK-gated ones only when importable. The real soundfile is not
    # in this image, but the refdiff suites install a functional stand-in
    # (tests/_refstubs/soundfile.py) for the whole process — in that case
    # SoundfileBackend legitimately reports available.
    sf = sys.modules.get("soundfile")
    refstub_active = sf is not None and "_refstubs" in (getattr(sf, "__file__", "") or "")
    if not refstub_active:
        assert "SoundfileBackend" not in names
    assert "TorchcodecBackend" not in names


def test_unknown_lilcom_payload_error():
    from lhotse_tpu.codecs.lilcom_codec import decompress

    with pytest.raises(ValueError, match="LTC1"):
        decompress(b"NOTAREALSTREAM")


def test_smart_open_gated_url_open():
    from lhotse_tpu.serialization import SmartOpenIOBackend

    if not SmartOpenIOBackend.is_available():
        assert "SmartOpenIOBackend" not in __import__(
            "lhotse_tpu.serialization", fromlist=["available_io_backends"]).available_io_backends()
