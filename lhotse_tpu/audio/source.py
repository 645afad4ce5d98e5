"""
AudioSource: points at audio bytes retrievable from somewhere.

Reference behavior: `/root/reference/lhotse/audio/source.py:29` — types
``file``, ``command`` (unix pipe), ``url``, ``memory`` (bytes attached),
``shar`` (placeholder), ``shar_ptr`` (``<tar>?o=<off>&e=<end>`` lazy pointer);
loading semantics of ``_prepare_for_reading`` (source.py:253) including
AudioCache integration for command/url/shar_ptr sources.
"""
from __future__ import annotations

import os
import warnings
from dataclasses import dataclass
from io import BytesIO, FileIO
from pathlib import Path
from subprocess import PIPE, run
from typing import List, Optional, Tuple, Union

import numpy as np

from lhotse_tpu.audio.backend import read_audio
from lhotse_tpu.audio.utils import (
    DurationMismatchError, VideoInfo, VideoLoadingError, get_audio_duration_mismatch_tolerance)
from lhotse_tpu.caching import AudioCache
from lhotse_tpu.serialization import open_best
from lhotse_tpu.utils import Pathlike, Seconds, asdict_nonull, compute_num_samples, fastcopy

PathOrFilelike = Union[str, BytesIO, FileIO]


@dataclass
class AudioSource:
    """AudioSource represents audio data that can be retrieved from somewhere."""

    type: str
    """
    The type of audio source. Supported types are:
    - 'file' (most standard audio encodings, possibly multi-channel)
    - 'command' [unix pipe] (most standard audio encodings, possibly multi-channel)
    - 'url' (any URL type supported by the optional "smart_open" package)
    - 'memory' (any format, read from a binary string attached to the 'source' member)
    - 'shar' (placeholder filled later when using the Shar data format)
    - 'shar_ptr' (lazy pointer into a Shar tar shard: ``<tar_path>?o=<offset>&e=<end_offset>``)
    """

    channels: List[int]
    """A list of integer channel IDs available in this AudioSource."""

    source: Union[str, bytes]
    """The actual source to read from; interpretation depends on ``type``."""

    video: Optional[VideoInfo] = None
    """Optional information about the video contained in this source, if any."""

    @property
    def has_video(self) -> bool:
        return self.video is not None

    @property
    def format(self) -> str:
        return self._get_format()

    def load_audio(
        self, offset: Seconds = 0.0, duration: Optional[Seconds] = None,
        force_opus_sampling_rate: Optional[int] = None) -> np.ndarray:
        """
        Load the audio as float32 numpy array in [-1, 1]; shape
        ``(n_channels, n_samples)``; single-channel sources return
        ``(n_samples,)`` after the caller's channel selection.
        """
        source = self._prepare_for_reading(offset=offset, duration=duration)
        samples, sampling_rate = read_audio(
            source, offset=offset, duration=duration,
            force_opus_sampling_rate=force_opus_sampling_rate)
        # Explicit sanity check for duration (reference: source.py:98-110).
        if duration is not None:
            num_samples = samples.shape[0] if len(samples.shape) == 1 else samples.shape[1]
            available_duration = num_samples / sampling_rate
            if available_duration < duration - get_audio_duration_mismatch_tolerance():
                raise DurationMismatchError(
                    f"Requested more audio ({duration}s) than available ({available_duration}s)"
                )
        return samples.astype(np.float32)

    def load_video(
        self, offset: Seconds = 0.0, duration: Optional[Seconds] = None, with_audio: bool = True):
        """
        Load video frames as a uint8 array (T, C, H, W) plus optionally audio.
        Requires the ``ffmpeg`` binary (frames piped as rawvideo), replacing the
        reference's torchaudio StreamReader path (source.py:113-225).
        """
        import shutil
        import subprocess

        if shutil.which("ffmpeg") is None:
            raise VideoLoadingError(
                "Video loading requires the ffmpeg binary, which is not available."
            )
        assert self.video is not None, "This AudioSource has no video stream."
        try:
            src = self.source if isinstance(self.source, str) else "pipe:0"
            stdin = self.source if isinstance(self.source, bytes) else None
            h, w = self.video.height, self.video.width
            cmd = ["ffmpeg", "-v", "error"]
            if offset:
                cmd += ["-ss", str(offset)]
            cmd += ["-i", src]
            if duration is not None:
                cmd += ["-t", str(duration)]
            cmd += ["-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}", "pipe:1"]
            proc = subprocess.run(cmd, input=stdin, stdout=PIPE, stderr=PIPE)
            if proc.returncode != 0:
                raise RuntimeError(proc.stderr.decode(errors="replace"))
            frame_bytes = w * h * 3
            n = len(proc.stdout) // frame_bytes
            video = np.frombuffer(proc.stdout[: n * frame_bytes], dtype=np.uint8)
            video = video.reshape(n, h, w, 3).transpose(0, 3, 1, 2)
            audio = None
            if with_audio:
                audio = self.load_audio(offset=offset, duration=duration)
                if audio.ndim == 1:
                    audio = audio[None, :]
            return video, audio
        except Exception as e:
            raise VideoLoadingError(
                f"Reading video from '{self.source if not isinstance(self.source, bytes) else 'memory'}' failed. "
                f"Details: {type(e)}: {str(e)}"
            )

    def with_video_resolution(self, width: int, height: int) -> "AudioSource":
        return fastcopy(self, video=self.video.copy_with(width=width, height=height))

    def with_path_prefix(self, path: Pathlike) -> "AudioSource":
        if self.type != "file":
            return self
        return fastcopy(self, source=str(Path(path) / self.source))

    def to_dict(self) -> dict:
        return asdict_nonull(self)

    @staticmethod
    def from_dict(data) -> "AudioSource":
        if "video" in data:
            data["video"] = VideoInfo.from_dict(data["video"])
        return AudioSource(**data)

    def __repr__(self):
        return (
            f"AudioSource(type='{self.type}', channels={self.channels}, "
            f"source='{self.source if isinstance(self.source, str) else '<binary-data>'}')"
        )

    def _prepare_for_reading(self, offset: Seconds, duration: Optional[Seconds]) -> PathOrFilelike:
        """
        Validate ``self.type`` and prepare the actual source for reading:
        either a path or a binary file-like object (reference: source.py:253).
        """
        assert self.type in (
            "file", "command", "url", "memory", "shar", "shar_ptr",
        ), f"Unexpected AudioSource type: '{self.type}'"

        source = self.source

        if self.type == "command":
            if (offset != 0.0 or duration is not None) and not AudioCache.enabled():
                warnings.warn(
                    "You requested a subset of a recording that is read via a bash command. "
                    "Expect large I/O overhead for many such reads; "
                    "lhotse_tpu.set_caching_enabled(True) mitigates the overhead."
                )
            audio_bytes = AudioCache.try_cache(self.source)
            if not audio_bytes:
                audio_bytes = run(self.source, shell=True, stdout=PIPE).stdout
                AudioCache.add_to_cache(self.source, audio_bytes)
            source = BytesIO(audio_bytes)

        elif self.type == "url":
            if offset != 0.0 or duration is not None and not AudioCache.enabled():
                warnings.warn(
                    "You requested a subset of a recording read from a URL. "
                    "Expect large I/O overhead for many such reads; "
                    "lhotse_tpu.set_caching_enabled(True) mitigates the overhead."
                )
            audio_bytes = AudioCache.try_cache(self.source)
            if not audio_bytes:
                with open_best(self.source, "rb") as f:
                    audio_bytes = f.read()
                AudioCache.add_to_cache(self.source, audio_bytes)
            source = BytesIO(audio_bytes)

        elif self.type == "memory":
            assert isinstance(self.source, bytes), (
                "Corrupted manifest: AudioSource type is 'memory' but 'source' "
                f"is not bytes (found: '{type(self.source).__name__}')."
            )
            source = BytesIO(self.source)

        elif self.type == "shar":
            raise RuntimeError(
                "Inconsistent state: found an AudioSource with a Shar placeholder "
                "that was not filled during deserialization."
            )

        elif self.type == "shar_ptr":
            audio_bytes = AudioCache.try_cache(self.source)
            if not audio_bytes:
                from lhotse_tpu.shar.lazy_pointer import read_payload

                audio_bytes = read_payload(self.source)
                AudioCache.add_to_cache(self.source, audio_bytes)
            source = BytesIO(audio_bytes)

        return source

    def _get_format(self) -> str:
        """Infer the audio format from the file extension or binary data."""
        if self.type in ("file", "url"):
            return os.path.splitext(self.source)[-1][1:].lower()
        elif self.type in ("memory", "shar_ptr"):
            if self.type == "shar_ptr":
                payload = AudioCache.try_cache(self.source)
                if not payload:
                    from lhotse_tpu.shar.lazy_pointer import read_payload

                    payload = read_payload(self.source)
                    AudioCache.add_to_cache(self.source, payload)
            else:
                payload = self.source
            magic = payload[:12]
            if magic[:4] in (b"RIFF", b"RF64"):
                return "wav"
            if magic[:4] == b"fLaC":
                return "flac"
            if magic[:4] == b"OggS":
                return "opus" if b"OpusHead" in payload[:1024] else "ogg"
            if magic[:7] == b"NIST_1A":
                return "sph"
            if magic[:3] == b"ID3" or (len(magic) > 1 and magic[0] == 0xFF and (magic[1] & 0xE0) == 0xE0):
                return "mp3"
            return "unknown"
        else:
            raise NotImplementedError(f"Getting format not implemented for source type {self.type}")
