"""
Video path end-to-end without the real ffmpeg binary: a stub ``ffmpeg``
script on PATH emits deterministic rawvideo frames (pixel value == frame
index mod 256), so the pipe construction, rawvideo parsing, offset/duration
windowing, padding, VideoMixer, collate_video, and
UnsupervisedAudioVideoDataset all run and can be checked frame-exactly.

Reference surface: /root/reference/test/video/ +
/root/reference/lhotse/audio/source.py:113-225 (StreamReader-based loading).
"""
import os
import stat
import sys
from pathlib import Path

import numpy as np
import pytest

from lhotse_tpu import CutSet, Recording
from lhotse_tpu.audio.source import AudioSource
from lhotse_tpu.audio.utils import VideoInfo
from lhotse_tpu.audio.wavio import write_wav

SR = 16000
FPS = 10.0
H, W = 8, 6

STUB = f'''#!{sys.executable}
import contextlib, sys, wave

args = sys.argv[1:]
def opt(flag, default=None):
    return args[args.index(flag) + 1] if flag in args else default

ss = float(opt("-ss", 0.0))
path = opt("-i")
t = opt("-t")
w, h = map(int, opt("-s").split("x"))
FPS = {FPS}
with contextlib.closing(wave.open(path)) as f:
    total = f.getnframes() / f.getframerate()
dur = float(t) if t is not None else max(total - ss, 0.0)
start = int(round(ss * FPS))
n = int(round(dur * FPS))
out = sys.stdout.buffer
for i in range(start, start + n):
    out.write(bytes([i % 256]) * (w * h * 3))
'''


@pytest.fixture
def video_recording(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "ffmpeg"
    stub.write_text(STUB)
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")

    rng = np.random.RandomState(0)
    wav = tmp_path / "clip.wav"
    write_wav(str(wav), (0.1 * rng.randn(2 * SR)).astype(np.float32), SR)
    return Recording(
        id="vid1",
        sources=[
            AudioSource(
                type="file",
                channels=[0],
                source=str(wav),
                video=VideoInfo(fps=FPS, num_frames=20, height=H, width=W),
            )
        ],
        sampling_rate=SR,
        num_samples=2 * SR,
        duration=2.0,
    )


class TestRecordingVideo:
    def test_load_full(self, video_recording):
        frames, audio = video_recording.load_video()
        assert frames.shape == (20, 3, H, W)
        assert frames.dtype == np.uint8
        np.testing.assert_array_equal(frames[0], 0)
        np.testing.assert_array_equal(frames[7], 7)
        assert audio.shape == (1, 2 * SR)

    def test_load_window(self, video_recording):
        frames, audio = video_recording.load_video(offset=0.5, duration=1.0)
        assert frames.shape == (10, 3, H, W)
        # Frame indices 5..14 of the source (offset seek honored).
        np.testing.assert_array_equal(frames[0], 5)
        np.testing.assert_array_equal(frames[-1], 14)
        assert audio.shape == (1, SR)

    def test_without_audio(self, video_recording):
        frames, audio = video_recording.load_video(with_audio=False)
        assert frames.shape[0] == 20 and audio is None

    def test_missing_ffmpeg_raises(self, video_recording, monkeypatch, tmp_path):
        from lhotse_tpu.audio.utils import VideoLoadingError

        empty = tmp_path / "nobin"
        empty.mkdir()
        monkeypatch.setenv("PATH", str(empty))
        with pytest.raises(VideoLoadingError):
            video_recording.load_video()

    def test_manifest_roundtrip_preserves_video(self, video_recording, tmp_path):
        from lhotse_tpu import RecordingSet

        path = tmp_path / "recs.jsonl.gz"
        RecordingSet.from_recordings([video_recording]).to_file(path)
        restored = RecordingSet.from_file(path)[video_recording.id]
        assert restored.has_video
        assert restored.video == video_recording.video
        frames, _ = restored.load_video(with_audio=False)
        assert frames.shape == (20, 3, H, W)


class TestCutVideo:
    def test_cut_span_video(self, video_recording):
        cut = video_recording.to_cut().truncate(offset=0.5, duration=1.0)
        assert cut.has_video
        assert cut.video.num_frames == 10
        frames, audio = cut.load_video()
        assert frames.shape == (10, 3, H, W)
        np.testing.assert_array_equal(frames[0], 5)

    def test_padding_cut_video_is_black(self, video_recording):
        cut = video_recording.to_cut().pad(duration=3.0)
        frames, audio = cut.load_video()
        assert frames.shape == (30, 3, H, W)
        np.testing.assert_array_equal(frames[:20], np.arange(20, dtype=np.uint8)[:, None, None, None] * np.ones((20, 3, H, W), np.uint8))
        np.testing.assert_array_equal(frames[20:], 0)
        assert audio.shape == (1, 3 * SR)

    def test_collate_video(self, video_recording):
        from lhotse_tpu.dataset.collation import collate_video

        c1 = video_recording.to_cut()
        c2 = video_recording.to_cut().truncate(duration=1.5)
        c2.id = "vid1-short"
        videos, video_lens, audios, audio_lens = collate_video(
            CutSet.from_cuts([c1, c2])
        )
        assert videos.shape == (2, 20, 3, H, W)
        np.testing.assert_array_equal(video_lens, [20, 15])
        assert audios.shape == (2, 1, 2 * SR)
        np.testing.assert_array_equal(audio_lens, [2 * SR, int(1.5 * SR)])
        # The short cut's tail frames are padding (black).
        np.testing.assert_array_equal(videos[1, 15:], 0)
        np.testing.assert_array_equal(videos[1, 14], 14)

    def test_audio_video_dataset(self, video_recording):
        from lhotse_tpu.dataset.video import UnsupervisedAudioVideoDataset

        ds = UnsupervisedAudioVideoDataset()
        batch = ds[CutSet.from_cuts([video_recording.to_cut()])]
        assert batch["video"].shape == (1, 20, 3, H, W)
        assert batch["audio"].shape == (1, 1, 2 * SR)
        np.testing.assert_array_equal(batch["video_lens"], [20])
        np.testing.assert_array_equal(batch["audio_lens"], [2 * SR])
        assert len(batch["cuts"]) == 1


class TestVideoMixer:
    def test_append_concatenates(self, video_recording):
        c1 = video_recording.to_cut().truncate(duration=1.0)
        c2 = video_recording.to_cut().truncate(duration=0.5)
        c2.id = "vid1-b"
        appended = c1.append(c2)
        assert appended.has_video
        frames, audio = appended.load_video()
        assert frames.shape == (15, 3, H, W)
        # First 10 frames from c1 (indices 0..9), then 5 from c2 (0..4).
        np.testing.assert_array_equal(frames[9], 9)
        np.testing.assert_array_equal(frames[10], 0)
        np.testing.assert_array_equal(frames[14], 4)

    def test_overlapping_mix_rejected(self, video_recording):
        from lhotse_tpu.audio.mixer import VideoMixer

        mixer = VideoMixer(np.zeros((10, 3, H, W), np.uint8), fps=FPS)
        with pytest.raises(AssertionError):
            mixer.add_to_mix(np.zeros((10, 3, H, W), np.uint8), offset=0.5)


FFPROBE_STUB = f'''#!{sys.executable}
import sys

args = sys.argv[1:]
stream = args[args.index("-select_streams") + 1]
if stream.startswith("a"):
    print("sample_rate={SR}")
    print("channels=1")
    print("duration=2.000000")
else:
    print("width={W}")
    print("height={H}")
    print("r_frame_rate=10/1")
    print("nb_frames=20")
    print("duration=2.000000")
'''


class TestVideoProbe:
    def test_from_file_mp4_gets_video_info(self, tmp_path, monkeypatch):
        """Recording.from_file on a video extension probes the video stream
        (reference: audio/backend.py:35-44 SUPPORTED_VIDEO_EXTENSIONS +
        Recording.from_file populating VideoInfo)."""
        bindir = tmp_path / "bin"
        bindir.mkdir()
        for name, body in (("ffmpeg", STUB), ("ffprobe", FFPROBE_STUB)):
            exe = bindir / name
            exe.write_text(body)
            exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")

        clip = tmp_path / "clip.mp4"
        clip.write_bytes(b"\x00" * 64)  # never decoded: stubs only read args
        r = Recording.from_file(clip)
        assert r.has_video
        assert r.video.fps == FPS
        assert r.video.num_frames == 20
        assert (r.video.height, r.video.width) == (H, W)
        assert r.sampling_rate == SR
        assert r.duration == 2.0

    def test_supported_video_extensions_exported(self):
        from lhotse_tpu.audio.backend import SUPPORTED_VIDEO_EXTENSIONS

        assert ".mp4" in SUPPORTED_VIDEO_EXTENSIONS
        assert ".webm" in SUPPORTED_VIDEO_EXTENSIONS
