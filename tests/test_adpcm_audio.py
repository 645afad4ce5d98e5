"""
IMA ADPCM (WAV format 0x0011) decoding. The fixture encoder below is an
independent, straight-from-the-spec per-sample implementation (scalar,
greedy nibble search), so the vectorized block decoder is validated against
separately-written code, plus a hand-computed nibble vector.
"""
import struct
from io import BytesIO

import numpy as np
import pytest

from lhotse_tpu.audio.wavio import (
    _IMA_INDEX_TABLE,
    _IMA_STEP_TABLE,
    info_wav,
    read_wav,
)

SR = 8000


def _encode_nibble(sample, pred, index):
    """Spec encoder: choose the nibble whose decoded diff best approaches
    sample - pred, then update state exactly like the decoder."""
    step = int(_IMA_STEP_TABLE[index])
    delta = sample - pred
    nibble = 0
    if delta < 0:
        nibble = 8
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    # decoder-side reconstruction
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX_TABLE[nibble])))
    return nibble, pred, index


def encode_ima_wav(pcm: np.ndarray, sr: int, block_align: int = 256) -> bytes:
    """Mono IMA ADPCM WAV encoder (independent of the product decoder)."""
    spb = (block_align - 4) * 2 + 1
    n = pcm.shape[0]
    blocks = []
    i = 0
    while i < n:
        chunk = pcm[i : i + spb]
        if chunk.shape[0] < spb:
            chunk = np.pad(chunk, (0, spb - chunk.shape[0]))
        pred, index = int(chunk[0]), 0
        header = struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            nib, pred, index = _encode_nibble(int(s), pred, index)
            nibbles.append(nib)
        payload = bytearray()
        for a, b in zip(nibbles[0::2], nibbles[1::2]):
            payload.append(a | (b << 4))
        blocks.append(header + bytes(payload))
        i += spb
    data = b"".join(blocks)
    byte_rate = sr * block_align // spb
    fmt = struct.pack("<HHIIHHHH", 0x0011, 1, sr, byte_rate, block_align, 4, 2, spb)
    fact = struct.pack("<I", n)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


@pytest.fixture
def sine_pcm():
    t = np.arange(SR * 2) / SR
    return np.clip(np.rint(0.5 * 32767 * np.sin(2 * np.pi * 440 * t)), -32768, 32767).astype(np.int64)


def test_header_parse(sine_pcm, tmp_path):
    blob = encode_ima_wav(sine_pcm, SR)
    hdr = info_wav(BytesIO(blob))
    assert hdr.format_tag == 0x0011
    assert hdr.sampling_rate == SR
    assert hdr.num_frames == sine_pcm.shape[0]  # via the fact chunk
    assert hdr.samples_per_block == (256 - 4) * 2 + 1


def test_decode_matches_signal(sine_pcm, tmp_path):
    p = tmp_path / "a.wav"
    p.write_bytes(encode_ima_wav(sine_pcm, SR))
    out, sr = read_wav(str(p))
    assert sr == SR and out.shape == (1, sine_pcm.shape[0])
    ref = sine_pcm.astype(np.float32) / 32768.0
    # 4-bit ADPCM via the simple greedy fixture encoder: lossy but faithful.
    err = out[0] - ref
    snr = 10 * np.log10(np.mean(ref**2) / (np.mean(err**2) + 1e-12))
    assert snr > 12.0, f"SNR too low: {snr:.1f} dB"
    assert np.corrcoef(out[0], ref)[0, 1] > 0.97


def test_partial_reads_align_with_full(sine_pcm, tmp_path):
    p = tmp_path / "a.wav"
    p.write_bytes(encode_ima_wav(sine_pcm, SR))
    full, _ = read_wav(str(p))
    # Offsets landing mid-block must decode from the block boundary.
    for off, cnt in [(0, 100), (505, 505), (700, 1000), (4321, 777)]:
        part, _ = read_wav(str(p), frame_offset=off, num_frames=cnt)
        np.testing.assert_array_equal(part, full[:, off : off + cnt])


def test_hand_computed_first_nibbles():
    """predictor=0, index=0 (step=7): nibble 0x7 decodes to +11, then
    index moves to 8 (step=16); nibble 0x8 (sign only) gives -(16>>3)=-2."""
    pcm = np.zeros(505, dtype=np.int64)
    block = struct.pack("<hBB", 0, 0, 0) + bytes([0x87]) + bytes(125)
    byte_rate = SR * 256 // 505
    fmt = struct.pack("<HHIIHHHH", 0x0011, 1, SR, byte_rate, 128, 4, 2, 249)
    data = block
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    out, _ = read_wav(BytesIO(blob))
    vals = np.rint(out[0, :3] * 32768).astype(int)
    assert vals[0] == 0        # header predictor
    assert vals[1] == 11       # nibble 7 at step 7
    assert vals[2] == 11 - 2   # nibble 8 at step 16: sign bit, diff = 2


def test_recording_level_dispatch(sine_pcm, tmp_path):
    from lhotse_tpu import Recording

    p = tmp_path / "adpcm.wav"
    p.write_bytes(encode_ima_wav(sine_pcm, SR))
    rec = Recording.from_file(p)
    assert rec.sampling_rate == SR
    assert rec.num_samples == sine_pcm.shape[0]
    audio = rec.load_audio(offset=0.5, duration=0.5)
    full = rec.load_audio()
    np.testing.assert_array_equal(audio, full[:, SR // 2 : SR])


# -- Microsoft ADPCM (0x0002) -------------------------------------------------

_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230]
_MS_C1 = [256, 512, 0, 192, 240, 460, 392]
_MS_C2 = [0, -256, 0, 64, 0, -208, -232]


def encode_ms_wav(pcm: np.ndarray, sr: int, block_align: int = 256, bpred: int = 0) -> bytes:
    """Mono MS ADPCM encoder written straight from the spec (scalar)."""
    spb = (block_align - 7) * 2 + 2
    blocks = []
    i, n = 0, pcm.shape[0]
    while i < n:
        chunk = pcm[i : i + spb]
        if chunk.shape[0] < spb:
            chunk = np.pad(chunk, (0, spb - chunk.shape[0]))
        c1, c2 = _MS_C1[bpred], _MS_C2[bpred]
        sample2, sample1 = int(chunk[0]), int(chunk[1])
        idelta = 16
        header = bytes([bpred]) + struct.pack("<h", idelta) + struct.pack("<h", sample1) + struct.pack("<h", sample2)
        nibbles = []
        for s in chunk[2:]:
            pred = (sample1 * c1 + sample2 * c2) >> 8
            err = int(s) - pred
            nib = max(-8, min(7, int(round(err / idelta)) if idelta else 0))
            dec = max(-32768, min(32767, pred + nib * idelta))
            sample2, sample1 = sample1, dec
            idelta = max(16, (_MS_ADAPT[nib & 0xF] * idelta) >> 8)
            nibbles.append(nib & 0xF)
        payload = bytearray()
        for a, b in zip(nibbles[0::2], nibbles[1::2]):
            payload.append((a << 4) | b)  # HIGH nibble first
        blocks.append(header + bytes(payload))
        i += spb
    data = b"".join(blocks)
    fmt = struct.pack("<HHIIHHHH", 0x0002, 1, sr, sr * block_align // spb, block_align, 4, 2, spb)
    fact = struct.pack("<I", n)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_ms_adpcm_decode(sine_pcm, tmp_path):
    p = tmp_path / "ms.wav"
    p.write_bytes(encode_ms_wav(sine_pcm, SR))
    from lhotse_tpu.audio.wavio import read_wav as _read

    out, sr = _read(str(p))
    assert sr == SR and out.shape == (1, sine_pcm.shape[0])
    ref = sine_pcm.astype(np.float32) / 32768.0
    err = out[0] - ref
    snr = 10 * np.log10(np.mean(ref**2) / (np.mean(err**2) + 1e-12))
    assert snr > 12.0, f"SNR too low: {snr:.1f} dB"
    assert np.corrcoef(out[0], ref)[0, 1] > 0.97


def test_ms_adpcm_partial_reads(sine_pcm, tmp_path):
    p = tmp_path / "ms.wav"
    p.write_bytes(encode_ms_wav(sine_pcm, SR))
    full, _ = read_wav(str(p))
    for off, cnt in [(0, 64), (500, 500), (1234, 999)]:
        part, _ = read_wav(str(p), frame_offset=off, num_frames=cnt)
        np.testing.assert_array_equal(part, full[:, off : off + cnt])


def test_ms_adpcm_first_samples_are_header_samples(tmp_path):
    pcm = np.zeros(1000, dtype=np.int64)
    pcm[0], pcm[1] = -123, 456  # sample2 (older), sample1
    p = tmp_path / "ms.wav"
    p.write_bytes(encode_ms_wav(pcm, SR))
    out, _ = read_wav(str(p))
    vals = np.rint(out[0, :2] * 32768).astype(int)
    assert vals[0] == -123 and vals[1] == 456


def test_ima_adpcm_stereo(tmp_path):
    """Stereo blocks: per-channel 4-byte headers, then alternating 4-byte
    channel groups. Decoded against an independent scalar reference."""
    rng = np.random.RandomState(0)
    spb = (256 - 4 * 2) * 2 // 2 + 1  # block_align=256, C=2
    n = spb * 3
    t = np.arange(n) / SR
    left = np.clip(np.rint(12000 * np.sin(2 * np.pi * 300 * t)), -32768, 32767).astype(np.int64)
    right = np.clip(np.rint(9000 * np.sin(2 * np.pi * 440 * t) + 500 * rng.randn(n)), -32768, 32767).astype(np.int64)

    # Scalar spec encoder for stereo; also records the exact decoder
    # trajectory (the reconstructed samples) as ground truth.
    def encode_channel(chunk):
        pred, index = int(chunk[0]), 0
        nibs, traj = [], [pred]
        for s in chunk[1:]:
            nib, pred, index = _encode_nibble(int(s), pred, index)
            nibs.append(nib)
            traj.append(pred)
        return int(chunk[0]), nibs, traj

    blocks = []
    expected = [[], []]
    for b in range(3):
        lo, hi = b * spb, (b + 1) * spb
        headers, nib_ch = b"", []
        for ci, ch in enumerate((left[lo:hi], right[lo:hi])):
            pred0, nibs, traj = encode_channel(ch)
            headers += struct.pack("<hBB", pred0, 0, 0)
            nib_ch.append(nibs)
            expected[ci].extend(traj)
        payload = bytearray()
        # Alternating 4-byte (8-nibble) groups per channel.
        for g in range(len(nib_ch[0]) // 8):
            for ch in range(2):
                eight = nib_ch[ch][g * 8 : g * 8 + 8]
                for a, c in zip(eight[0::2], eight[1::2]):
                    payload.append(a | (c << 4))
        blocks.append(headers + bytes(payload))
    data = b"".join(blocks)
    fmt = struct.pack("<HHIIHHHH", 0x0011, 2, SR, SR * 256 // spb, 256, 4, 2, spb)
    fact = struct.pack("<I", n)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data)
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff

    out, sr = read_wav(BytesIO(blob))
    assert sr == SR and out.shape == (2, n)
    # Exact agreement with the independent scalar decoder trajectory.
    for ch in range(2):
        exact = np.array(expected[ch], dtype=np.float32) / 32768.0
        np.testing.assert_array_equal(out[ch], exact)
    # And faithful to the pre-quantization signal.
    for ch, ref in ((0, left), (1, right)):
        reff = ref.astype(np.float32) / 32768.0
        assert np.corrcoef(out[ch], reff)[0, 1] > 0.95, ch
