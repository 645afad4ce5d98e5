"""
Native AIFF / AIFF-C codec (lhotse_tpu/audio/aiffio.py) and its backend
integration. Variant fixtures are constructed by hand so the decoder is
tested against independently-built bitstreams, not its own writer.
"""
import struct
from io import BytesIO

import numpy as np
import pytest

from lhotse_tpu import Recording
from lhotse_tpu.audio.aiffio import (
    _write_extended80,
    info_aiff,
    read_aiff,
    write_aiff,
)

SR = 16000


def build_aifc(samples_f32, compression: bytes, payload: bytes, bits: int, ch=1):
    """Hand-assemble an AIFF-C file with the given SSND payload."""
    frames = samples_f32.shape[-1]
    comm = (
        struct.pack(">HIH", ch, frames, bits)
        + _write_extended80(float(SR))
        + compression
        + b"\x0bcompression"  # pstring name (11 chars); content irrelevant
    )
    if len(comm) & 1:
        comm += b"\x00"
    fver = struct.pack(">I", 0xA2805140)
    ssnd = struct.pack(">II", 0, 0) + payload
    chunks = b""
    for cid, body in ((b"FVER", fver), (b"COMM", comm), (b"SSND", ssnd)):
        chunks += cid + struct.pack(">I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    form = b"AIFC" + chunks
    return b"FORM" + struct.pack(">I", len(form)) + form


@pytest.fixture
def sig():
    t = np.arange(SR) / SR
    return (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def test_write_read_roundtrip(tmp_path, sig):
    write_aiff(tmp_path / "x.aiff", sig, SR)
    out, sr = read_aiff(tmp_path / "x.aiff")
    assert sr == SR and out.shape == (1, SR)
    np.testing.assert_allclose(out[0], sig, atol=2.0**-15)
    info = info_aiff(tmp_path / "x.aiff")
    assert (info.num_channels, info.sampling_rate, info.num_frames) == (1, SR, SR)


def test_stereo_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(2, 5000)) * 0.1).astype(np.float32)
    write_aiff(tmp_path / "st.aif", x, SR)
    out, sr = read_aiff(tmp_path / "st.aif")
    assert out.shape == (2, 5000)
    np.testing.assert_allclose(out, x, atol=2.0**-15)


def test_aifc_sowt_little_endian(sig):
    pcm = np.clip(np.rint(sig * 32768), -32768, 32767).astype("<i2")
    blob = build_aifc(sig, b"sowt", pcm.tobytes(), bits=16)
    out, sr = read_aiff(blob)
    np.testing.assert_allclose(out[0], sig, atol=2.0**-15)


def test_aifc_fl32(sig):
    blob = build_aifc(sig, b"fl32", sig.astype(">f4").tobytes(), bits=32)
    out, _ = read_aiff(blob)
    np.testing.assert_array_equal(out[0], sig)


def test_aifc_fl64(sig):
    blob = build_aifc(sig, b"fl64", sig.astype(">f8").tobytes(), bits=64)
    out, _ = read_aiff(blob)
    np.testing.assert_allclose(out[0], sig, atol=1e-7)


def test_aifc_ulaw(sig):
    # Encode with the WAV codec's mu-law encoder for an independent bitstream.
    from lhotse_tpu.audio.wavio import mulaw_table

    table = mulaw_table()
    # Nearest-entry encode (reference-quality mu-law has ~1/16 max error on
    # loud samples; use a quiet signal for a tight bound).
    quiet = (sig * 0.1).astype(np.float32)
    codes = np.abs(quiet[:, None] - table[None, :]).argmin(axis=1).astype(np.uint8)
    blob = build_aifc(quiet, b"ulaw", codes.tobytes(), bits=16)
    out, _ = read_aiff(blob)
    np.testing.assert_allclose(out[0], quiet, atol=5e-3)


def test_24bit_big_endian_pcm(sig):
    vals = np.clip(np.rint(sig * (1 << 23)), -(1 << 23), (1 << 23) - 1).astype(np.int32)
    b = np.zeros((vals.size, 3), dtype=np.uint8)
    u = vals.astype(np.uint32)
    b[:, 0] = (u >> 16) & 0xFF
    b[:, 1] = (u >> 8) & 0xFF
    b[:, 2] = u & 0xFF
    frames = vals.size
    comm = struct.pack(">HIH", 1, frames, 24) + _write_extended80(float(SR))
    ssnd = struct.pack(">II", 0, 0) + b.tobytes()
    chunks = b""
    for cid, body in ((b"COMM", comm), (b"SSND", ssnd)):
        chunks += cid + struct.pack(">I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    form = b"AIFF" + chunks
    blob = b"FORM" + struct.pack(">I", len(form)) + form
    out, _ = read_aiff(blob)
    np.testing.assert_allclose(out[0], sig, atol=2.0**-23)


def test_backend_dispatch_and_recording(tmp_path, sig):
    write_aiff(tmp_path / "r.aiff", sig, SR)
    rec = Recording.from_file(tmp_path / "r.aiff")
    assert rec.sampling_rate == SR and rec.num_samples == SR
    np.testing.assert_allclose(rec.load_audio()[0], sig, atol=2.0**-15)
    # Partial read through the backend.
    part = rec.load_audio(offset=0.25, duration=0.5)
    np.testing.assert_allclose(part[0], sig[SR // 4 : SR // 4 + SR // 2], atol=2.0**-15)


def test_rejects_non_aiff():
    with pytest.raises(ValueError, match="AIFF"):
        read_aiff(b"RIFF" + b"\x00" * 40)
