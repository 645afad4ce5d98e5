"""
Audio tar writer with audio-specific compression.

Reference behavior: `/root/reference/lhotse/shar/writers/audio.py`
(AudioTarWriter :21-142). Format support depends on the available audio
backends: 'wav' always works (internal RIFF codec); 'flac' requires the
internal FLAC codec or soundfile; 'mp3'/'opus' require ffmpeg/soundfile.
"""
import codecs
import json
from io import BytesIO
from typing import Callable, List, Optional

import numpy as np

from lhotse_tpu.audio import Recording
from lhotse_tpu.audio.backend import save_audio
from lhotse_tpu.shar.utils import to_shar_placeholder
from lhotse_tpu.shar.writers.tar import TarWriter


class AudioTarWriter:
    """
    Writes audio arrays into auto-sharded tar archives using audio-specific
    compression ('wav', 'flac', 'mp3', 'opus', or 'original').

    Example::

        >>> with AudioTarWriter("some_dir/audio.%06d.tar", shard_size=100, format="flac") as w:
        ...     w.write("audio1", audio1_array, 16000, manifest)
    """

    def __init__(
        self,
        pattern: str,
        shard_size: Optional[int] = 1000,
        format: str = "flac",
        shard_offset: int = 0,
        on_shard_complete: Optional[Callable[[str], None]] = None,
    ):
        self.format = format
        self.tar_writer = TarWriter(
            pattern,
            shard_size,
            shard_offset=shard_offset,
            on_shard_complete=on_shard_complete,
        )

    def __enter__(self):
        self.tar_writer.__enter__()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.close()

    def close(self):
        self.tar_writer.close()

    @property
    def output_paths(self) -> List[str]:
        return self.tar_writer.output_paths

    def resolve_format(self, original_format: Optional[str]) -> str:
        if self.format == "original" and original_format is not None:
            return original_format
        elif self.format == "original":
            return "wav"
        return self.format

    def write_placeholder(self, key: str) -> None:
        self.tar_writer.write(f"{key}.nodata", BytesIO())
        self.tar_writer.write(f"{key}.nometa", BytesIO(), count=False)

    def write(
        self,
        key: str,
        value: np.ndarray,
        sampling_rate: int,
        manifest: Recording,
        original_format: Optional[str] = None,
    ) -> None:
        save_format = self.resolve_format(original_format)

        stream = BytesIO()
        save_audio(dest=stream, src=value, sampling_rate=sampling_rate, format=save_format)
        self.tar_writer.write(f"{key}.{self.format}", stream)

        # Text manifest follows the data member.
        manifest = to_shar_placeholder(manifest)
        json_stream = BytesIO()
        print(
            json.dumps(manifest.to_dict()),
            file=codecs.getwriter("utf-8")(json_stream),
        )
        json_stream.seek(0)
        self.tar_writer.write(f"{key}.json", json_stream, count=False)
