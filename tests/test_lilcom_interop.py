"""
Interop with REFERENCE-produced lilcom archives, gated on the pip ``lilcom``
package (absent in this environment — these tests document and verify the
fallback contract the day the package exists; see docs/features.md "LTC1
bitstream" for the standing deviation).

The fallback chain under test: this build's feature codec is LTC1
(lhotse_tpu/codecs/lilcom_codec.py); ``decompress`` detects non-LTC1 payloads
by magic and delegates them to pip lilcom, so archives written by the
reference (lhotse/features/compression.py:18, lhotse/features/io.py:253-267,
982-1060) load through the same readers (lhotse_tpu/features/io.py).
"""
import numpy as np
import pytest

from lhotse_tpu.codecs import lilcom_codec
from lhotse_tpu.utils import is_module_available

from tests._reference import load_reference

requires_lilcom = pytest.mark.skipif(
    not is_module_available("lilcom"), reason="pip lilcom not installed"
)

ref = load_reference()


@requires_lilcom
def test_codec_decodes_pip_lilcom_payloads():
    """A raw pip-lilcom payload round-trips through our decompress exactly."""
    import lilcom

    rng = np.random.RandomState(0)
    arr = (rng.randn(230, 80) * 3).astype(np.float32)
    payload = lilcom.compress(arr, tick_power=-5)
    theirs = lilcom.decompress(payload)
    ours = lilcom_codec.decompress(payload)
    np.testing.assert_array_equal(ours, theirs)
    # Quantization bound: ticks of 2^-5 => max error 2^-6.
    assert np.max(np.abs(ours - arr)) <= 2.0**-6


@requires_lilcom
def test_env_pin_writes_pip_lilcom_bitstream(monkeypatch):
    """LHOTSE_TPU_USE_PIP_LILCOM=1 pins compress to the reference bitstream."""
    import lilcom

    monkeypatch.setenv("LHOTSE_TPU_USE_PIP_LILCOM", "1")
    arr = np.linspace(-4, 4, 160, dtype=np.float32).reshape(2, 80)
    payload = lilcom_codec.compress(arr, tick_power=-5)
    assert payload[:4] != b"LTC1"  # real lilcom bytes, not our container
    np.testing.assert_array_equal(
        lilcom.decompress(payload), lilcom_codec.decompress(payload)
    )


@requires_lilcom
@pytest.mark.skipif(ref is None, reason="/root/reference not mounted")
def test_read_reference_lilcom_chunky_archive(tmp_path):
    """An .lca archive written by the REFERENCE LilcomChunkyWriter loads
    through this build's reader with identical dequantized values
    (chunked partial reads included)."""
    import lilcom  # noqa: F401 — reference writer requires it

    import lhotse.features.io as RIO

    import lhotse_tpu.features.io as MIO

    rng = np.random.RandomState(7)
    arr = (rng.randn(473, 80) * 2).astype(np.float32)

    with RIO.LilcomChunkyWriter(tmp_path / "feats") as w:
        key = w.write("utt1", arr)
    reader_theirs = RIO.LilcomChunkyReader(tmp_path / "feats.lca")
    reader_ours = MIO.LilcomChunkyReader(tmp_path / "feats.lca")

    np.testing.assert_array_equal(reader_ours.read(key), reader_theirs.read(key))
    # Chunked partial read (100-frame chunks): frames 150..349.
    np.testing.assert_array_equal(
        reader_ours.read(key, left_offset_frames=150, right_offset_frames=350),
        reader_theirs.read(key, left_offset_frames=150, right_offset_frames=350),
    )


@requires_lilcom
@pytest.mark.skipif(ref is None, reason="/root/reference not mounted")
def test_read_reference_lilcom_files_archive(tmp_path):
    """Per-file .llc payloads written by the reference LilcomFilesWriter load
    through this build's LilcomFilesReader."""
    import lilcom  # noqa: F401

    import lhotse.features.io as RIO

    import lhotse_tpu.features.io as MIO

    arr = np.outer(
        np.linspace(0, 1, 57, dtype=np.float32),
        np.linspace(-2, 2, 23, dtype=np.float32),
    )
    with RIO.LilcomFilesWriter(tmp_path / "feats") as w:
        key = w.write("utt9", arr)
    theirs = RIO.LilcomFilesReader(tmp_path / "feats").read(key)
    ours = MIO.LilcomFilesReader(tmp_path / "feats").read(key)
    np.testing.assert_array_equal(ours, theirs)
