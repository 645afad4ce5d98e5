"""
Array / TemporalArray: manifests for stored numpy arrays.

Reference behavior: `/root/reference/lhotse/array.py:14,136` — ``Array`` is a
generic stored-ndarray pointer (storage_type/path/key + shape); ``TemporalArray``
adds ``frame_shift``, ``temporal_dim``, ``start`` enabling partial reads via
``load(start, duration)`` (array.py:216); ``pad_array`` (array.py:366).
"""
from __future__ import annotations

import decimal
import warnings
from dataclasses import asdict, dataclass
from math import isclose
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from lhotse_tpu.utils import Pathlike, Seconds, fastcopy


@dataclass
class Array:
    """
    Describes a numpy array stored somewhere (files, archive, memory, cloud);
    :meth:`load` abstracts away the storage mechanism via the FeaturesReader
    registry.
    """

    storage_type: str
    storage_path: str
    storage_key: str
    shape: List[int]

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def is_in_memory(self) -> bool:
        from lhotse_tpu.features.io import is_in_memory

        return is_in_memory(self.storage_type)

    @property
    def is_placeholder(self) -> bool:
        return self.storage_type == "shar"

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, data: dict) -> "Array":
        if "storage_key" in data and "storage_type" in data and "storage_path" not in data:
            data["storage_path"] = None
        return cls(**data)

    def load(self) -> np.ndarray:
        from lhotse_tpu.features.io import get_reader

        storage = get_reader(self.storage_type)(self.storage_path)
        return storage.read(self.storage_key)

    def with_path_prefix(self, path: Pathlike) -> "Array":
        return fastcopy(self, storage_path=str(Path(path) / self.storage_path))

    def copy_with(self, **kwargs) -> "Array":
        return fastcopy(self, **kwargs)

    def move_to_memory(self, lilcom: bool = False) -> "Array":
        from lhotse_tpu.features.io import get_memory_writer

        if self.storage_type in ("memory_lilcom", "memory_writer"):
            return self
        arr = self.load()
        if np.issubdtype(arr.dtype, np.floating) and lilcom:
            writer = get_memory_writer("memory_lilcom")()
        else:
            writer = get_memory_writer("memory_raw")()
        data = writer.write("", arr)
        return Array(
            storage_type=writer.name,
            storage_key=data,
            storage_path="",
            shape=self.shape,
        )

    def __repr__(self):
        return (
            f"Array(storage_type='{self.storage_type}', "
            f"storage_path='{self.storage_path}', "
            f"storage_key='{self.storage_key if isinstance(self.storage_key, str) else '<binary-data>'}', "
            f"shape={self.shape})"
        )


@dataclass
class TemporalArray:
    """
    Array with a temporal dimension: knows its ``frame_shift``,
    ``temporal_dim``, and ``start``, enabling partial reads of sub-segments
    when the storage supports them.
    """

    array: Array
    temporal_dim: int
    frame_shift: Seconds
    start: Seconds

    @property
    def is_in_memory(self) -> bool:
        return self.array.is_in_memory

    @property
    def is_placeholder(self) -> bool:
        return self.array.is_placeholder

    @property
    def shape(self) -> List[int]:
        return self.array.shape

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def num_frames(self) -> int:
        return self.shape[self.temporal_dim]

    @property
    def duration(self) -> Seconds:
        return self.num_frames * self.frame_shift

    @property
    def end(self) -> Seconds:
        return self.start + self.duration

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, data: dict) -> "TemporalArray":
        array = Array.from_dict(data.pop("array"))
        return cls(array=array, **data)

    def load(
        self,
        start: Optional[Seconds] = None,
        duration: Optional[Seconds] = None,
    ) -> np.ndarray:
        """Load the array, optionally partially along ``temporal_dim``."""
        from lhotse_tpu.features.io import get_reader

        storage = get_reader(self.array.storage_type)(self.array.storage_path)
        left_offset_frames, right_offset_frames = 0, None
        if start is None:
            start = self.start
        if start < self.start - 1e-5:
            raise ValueError(
                f"Cannot load array starting from {start}s. "
                f"The available range is ({self.start}, {self.end}) seconds."
            )
        if not isclose(start, self.start):
            left_offset_frames = seconds_to_frames(
                start - self.start,
                frame_shift=self.frame_shift,
                max_index=self.shape[self.temporal_dim],
            )
        if duration is not None:
            right_offset_frames = left_offset_frames + seconds_to_frames(
                duration,
                frame_shift=self.frame_shift,
                max_index=self.shape[self.temporal_dim],
            )
        return storage.read(
            self.array.storage_key,
            left_offset_frames=left_offset_frames,
            right_offset_frames=right_offset_frames,
        )

    def with_path_prefix(self, path: Pathlike) -> "TemporalArray":
        return fastcopy(self, array=self.array.with_path_prefix(path))

    def copy_with(self, **kwargs) -> "TemporalArray":
        return fastcopy(self, **kwargs)

    def move_to_memory(
        self,
        start: Seconds = 0,
        duration: Optional[Seconds] = None,
        lilcom: bool = False,
    ) -> "TemporalArray":
        from lhotse_tpu.features.io import get_memory_writer

        if self.array.storage_type in ("memory_lilcom", "memory_writer"):
            return self
        arr = self.load(start=start, duration=duration)
        if np.issubdtype(arr.dtype, np.floating) and lilcom:
            writer = get_memory_writer("memory_lilcom")()
        else:
            writer = get_memory_writer("memory_raw")()
        data = writer.write("", arr)
        out = TemporalArray(
            array=Array(
                storage_type=writer.name,
                storage_key=data,
                storage_path="",
                shape=list(arr.shape),
            ),
            temporal_dim=self.temporal_dim,
            frame_shift=self.frame_shift,
            # The manifest now describes the moved subset; it starts at 0.
            start=0.0,
        )
        if out.shape == [0]:
            warnings.warn(
                "A TemporalArray with shape [0] encountered. If unexpected with "
                "long-recording data, make sure the 'start' attribute is set properly."
            )
        return out


def seconds_to_frames(
    duration: Seconds, frame_shift: Seconds, max_index: Optional[int] = None
) -> int:
    """
    Convert a time quantity in seconds to a frame index, limited to the array
    shape when ``max_index`` is given (reference: array.py:330, 8-digit
    rounding then HALF_UP quantization).
    """
    assert duration >= 0
    index = int(
        decimal.Decimal(round(duration / frame_shift, ndigits=8)).quantize(
            0, rounding=decimal.ROUND_HALF_UP
        )
    )
    if max_index is not None:
        return min(index, max_index)
    return index


def deserialize_array(raw_data: dict) -> Union[Array, TemporalArray]:
    """Dispatch Array vs TemporalArray during deserialization."""
    if "array" in raw_data:
        return TemporalArray.from_dict(raw_data)
    if "shape" in raw_data:
        return Array.from_dict(raw_data)
    raise ValueError(f"Cannot deserialize array from: {raw_data}")


def pad_array(
    array: np.ndarray,
    temporal_dim: int,
    frame_shift: Seconds,
    offset: Seconds,
    padded_duration: Seconds,
    pad_value: Union[int, float],
) -> np.ndarray:
    """
    Pad an array along its temporal dim, guided by durations: ``offset``
    seconds of padding in front, total ``padded_duration`` after padding.
    """
    array_frames = array.shape[temporal_dim]
    total_frames = seconds_to_frames(padded_duration, frame_shift=frame_shift)
    total_padding_frames = total_frames - array_frames
    assert total_padding_frames >= 0, (
        f"Invalid argument values for pad_array: array with shape {array.shape} cannot be "
        f"padded to padded_duration of {padded_duration} (total {total_frames} frames "
        f"under frame_shift={frame_shift})."
    )
    if total_padding_frames == 0:
        return array
    left_pad_frames = seconds_to_frames(offset, frame_shift=frame_shift)
    right_pad_frames = total_padding_frames - left_pad_frames
    # Fix off-by-one frame edge cases from duration rounding.
    if right_pad_frames == -1:
        right_pad_frames = 0
        left_pad_frames -= 1
    assert right_pad_frames >= 0, "Something went wrong..."
    pad_width = [
        (left_pad_frames, right_pad_frames) if dim == temporal_dim else (0, 0)
        for dim in range(array.ndim)
    ]
    return np.pad(array, pad_width=pad_width, mode="constant", constant_values=pad_value)
