"""
FfmpegSubprocessBackend audio paths without the real ffmpeg binary: stub
``ffmpeg``/``ffprobe`` scripts on PATH synthesize deterministic float32 PCM
(value of sample i = ((start+i) % 12289) / 12289, per-channel +ch offset),
with the source's duration/sample-rate/channels encoded in the file name
(``*_d<dur>_sr<rate>_c<ch>.<ext>``). This exercises pipe construction, the
ffprobe parsing, offset/duration windowing (-ss/-t), channel de-interleave,
OPUS detection (by suffix and by OpusHead magic in pipes), and the
``force_opus_sampling_rate`` resample semantics — the same coverage the
reference gets from real opus/mp3 fixtures (reference:
lhotse/audio/backend.py:1494-1592 read_opus_ffmpeg + info parsing).
"""
import os
import stat
import sys
from io import BytesIO

import numpy as np
import pytest

from lhotse_tpu.audio.backend import FfmpegSubprocessBackend

MOD = 12289

FFMPEG_STUB = f'''#!{sys.executable}
import re, struct, sys

args = sys.argv[1:]
def opt(flag, default=None):
    return args[args.index(flag) + 1] if flag in args else default

src = opt("-i")
if src == "pipe:0":
    sys.stdin.buffer.read()
    dur, native_sr = 1.0, 48000
    channels = 1
else:
    m = re.search(r"_d([0-9.]+)_sr(\\d+)_c(\\d+)\\.", src)
    dur, native_sr, channels = float(m.group(1)), int(m.group(2)), int(m.group(3))
ar = int(opt("-ar", native_sr))
ss = float(opt("-ss", 0.0))
t = opt("-t")
dur = min(float(t), dur - ss) if t is not None else dur - ss
start = round(ss * ar)
n = round(dur * ar)
out = sys.stdout.buffer
MOD = {MOD}
for i in range(n):
    base = ((start + i) % MOD) / MOD
    for ch in range(channels):
        out.write(struct.pack("<f", base + ch))
'''

FFPROBE_STUB = f'''#!{sys.executable}
import re, sys

src = sys.argv[-1]
select = sys.argv[sys.argv.index("-select_streams") + 1]
if select.startswith("v"):
    sys.exit(1)  # pure-audio stub: no video stream
if src == "pipe:0":
    sys.stdin.buffer.read()
    dur, sr, ch = 1.0, 48000, 1
else:
    m = re.search(r"_d([0-9.]+)_sr(\\d+)_c(\\d+)\\.", src)
    dur, sr, ch = float(m.group(1)), int(m.group(2)), int(m.group(3))
print(f"sample_rate={{sr}}")
print(f"channels={{ch}}")
print(f"duration={{dur}}")
'''


@pytest.fixture
def stub_ffmpeg(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in (("ffmpeg", FFMPEG_STUB), ("ffprobe", FFPROBE_STUB)):
        f = bindir / name
        f.write_text(body)
        f.chmod(f.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")
    return tmp_path


def expected(start: int, n: int, channels: int = 1) -> np.ndarray:
    base = ((start + np.arange(n)) % MOD) / MOD
    return np.stack([base + ch for ch in range(channels)]).astype(np.float32)


class TestOpusViaFfmpegSubprocess:
    def test_force_opus_sampling_rate_inserts_resample(self, stub_ffmpeg):
        path = stub_ffmpeg / "talk_d2.0_sr48000_c1.opus"
        path.write_bytes(b"\x00")  # stubs only parse the name
        backend = FfmpegSubprocessBackend()
        samples, sr = backend.read_audio(path, force_opus_sampling_rate=16000)
        assert sr == 16000
        assert samples.shape == (1, 32000)  # 2.0 s at the FORCED rate
        np.testing.assert_allclose(samples, expected(0, 32000), atol=1e-6)

    def test_opus_defaults_to_ffmpeg_48k(self, stub_ffmpeg):
        path = stub_ffmpeg / "talk_d0.5_sr48000_c1.opus"
        path.write_bytes(b"\x00")
        samples, sr = FfmpegSubprocessBackend().read_audio(path)
        assert sr == 48000 and samples.shape == (1, 24000)

    def test_opus_detected_in_pipe_by_magic(self, stub_ffmpeg):
        # File-object input: OPUS is recognized from the OpusHead magic, so
        # force_opus_sampling_rate applies even without a file suffix.
        payload = BytesIO(b"OggS....OpusHead" + b"\x00" * 64)
        samples, sr = FfmpegSubprocessBackend().read_audio(
            payload, force_opus_sampling_rate=8000
        )
        assert sr == 8000
        assert samples.shape == (1, 8000)  # pipe stub's fixed 1.0 s

    def test_non_opus_pipe_ignores_force_rate(self, stub_ffmpeg):
        samples, sr = FfmpegSubprocessBackend().read_audio(
            BytesIO(b"ID3\x04" + b"\x00" * 64), force_opus_sampling_rate=8000
        )
        assert sr == 48000  # probe rate: the force only applies to OPUS


class TestMp3ViaFfmpegSubprocess:
    def test_full_read_at_probed_rate(self, stub_ffmpeg):
        path = stub_ffmpeg / "song_d1.5_sr22050_c1.mp3"
        path.write_bytes(b"\x00")
        samples, sr = FfmpegSubprocessBackend().read_audio(path)
        assert sr == 22050
        assert samples.shape == (1, round(1.5 * 22050))
        np.testing.assert_allclose(
            samples, expected(0, round(1.5 * 22050)), atol=1e-6
        )

    def test_offset_duration_window(self, stub_ffmpeg):
        path = stub_ffmpeg / "song_d3.0_sr16000_c1.mp3"
        path.write_bytes(b"\x00")
        samples, sr = FfmpegSubprocessBackend().read_audio(
            path, offset=0.5, duration=1.0
        )
        assert sr == 16000 and samples.shape == (1, 16000)
        # -ss is passed through: the window starts at sample 8000.
        np.testing.assert_allclose(samples, expected(8000, 16000), atol=1e-6)

    def test_stereo_deinterleave(self, stub_ffmpeg):
        path = stub_ffmpeg / "duo_d0.25_sr8000_c2.mp3"
        path.write_bytes(b"\x00")
        samples, sr = FfmpegSubprocessBackend().read_audio(path)
        assert samples.shape == (2, 2000)
        np.testing.assert_allclose(samples, expected(0, 2000, channels=2), atol=1e-6)

    def test_info_parses_probe_output(self, stub_ffmpeg):
        path = stub_ffmpeg / "song_d2.5_sr44100_c2.mp3"
        path.write_bytes(b"\x00")
        info = FfmpegSubprocessBackend().info(path)
        assert info.samplerate == 44100
        assert info.channels == 2
        assert info.duration == pytest.approx(2.5)
        assert info.frames == round(2.5 * 44100)

    def test_recording_from_file_via_backend(self, stub_ffmpeg):
        """Recording.from_file + load_audio drive the whole chain through
        the manifest layer (suffix routing -> ffmpeg decode)."""
        from lhotse_tpu.audio.backend import audio_backend

        path = stub_ffmpeg / "utt_d1.0_sr16000_c1.mp3"
        path.write_bytes(b"\x00")
        from lhotse_tpu import Recording

        with audio_backend(FfmpegSubprocessBackend()):
            rec = Recording.from_file(path)
            assert rec.sampling_rate == 16000 and rec.duration == 1.0
            audio = rec.load_audio()
        assert audio.shape == (1, 16000)
        np.testing.assert_allclose(audio, expected(0, 16000), atol=1e-6)
