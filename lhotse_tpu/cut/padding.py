"""
PaddingCut: synthetic silence used to even out cut lengths.

Reference behavior: `/root/reference/lhotse/cut/padding.py` — materializes
zeros (audio) / a constant ``feat_value`` (features, typically LOG_EPSILON)
on load (:111-150); every transformation is metadata-only.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple, Union

import numpy as np

from lhotse_tpu.audio import Recording
from lhotse_tpu.audio.utils import VideoInfo
from lhotse_tpu.cut.base import Cut
from lhotse_tpu.supervision import SupervisionSegment
from lhotse_tpu.utils import (
    LOG_EPSILON,
    Pathlike,
    Seconds,
    compute_num_frames,
    compute_num_samples,
    fastcopy,
    perturb_num_samples,
    uuid4,
)


@dataclass
class PaddingCut(Cut):
    """A dummy Cut that returns zero samples / constant feature values; its
    role is to be appended to other cuts to make them evenly sized."""

    id: str
    duration: Seconds
    sampling_rate: int
    feat_value: float

    # Frequency domain
    num_frames: Optional[int] = None
    num_features: Optional[int] = None
    frame_shift: Optional[float] = None

    # Time domain
    num_samples: Optional[int] = None
    video: Optional[VideoInfo] = None

    # Padding values for custom array attributes
    custom: Optional[dict] = None

    @property
    def start(self) -> Seconds:
        return 0

    @property
    def supervisions(self):
        return []

    @property
    def channel(self) -> int:
        return 0

    @property
    def has_features(self) -> bool:
        return self.num_frames is not None

    @property
    def has_recording(self) -> bool:
        return self.num_samples is not None

    @property
    def has_video(self) -> bool:
        return self.has_recording and self.video is not None

    @property
    def num_channels(self) -> int:
        return 1

    @property
    def is_in_memory(self) -> bool:
        return False

    def has(self, field: str) -> bool:
        if field == "recording":
            return self.has_recording
        elif field == "features":
            return self.has_features
        elif field == "video":
            return self.has_video
        else:
            return self.custom is not None and field in self.custom

    @property
    def recording_id(self) -> str:
        return "PAD"

    def iter_data(self) -> Iterable:
        return ()

    def load_features(self, *args, **kwargs) -> Optional[np.ndarray]:
        if self.has_features:
            return np.ones((self.num_frames, self.num_features), np.float32) * self.feat_value
        return None

    def load_audio(self, *args, **kwargs) -> Optional[np.ndarray]:
        if self.has_recording:
            return np.zeros(
                (1, compute_num_samples(self.duration, self.sampling_rate)), np.float32
            )
        return None

    def load_video(self, with_audio: bool = True):
        if self.has_video:
            audio = None
            if with_audio:
                audio = np.zeros(
                    (1, compute_num_samples(self.duration, self.sampling_rate)), np.float32
                )
            video = np.zeros(
                (self.video.num_frames, 3, self.video.height, self.video.width), np.uint8
            )
            return video, audio
        return None

    def truncate(
        self,
        *,
        offset: Seconds = 0.0,
        duration: Optional[Seconds] = None,
        keep_excessive_supervisions: bool = True,
        preserve_id: bool = False,
        **kwargs,
    ) -> "PaddingCut":
        new_duration = self.duration - offset if duration is None else duration
        assert new_duration > 0.0
        return fastcopy(
            self,
            id=self.id if preserve_id else str(uuid4()),
            duration=new_duration,
            feat_value=self.feat_value,
            num_frames=compute_num_frames(
                duration=new_duration,
                frame_shift=self.frame_shift,
                sampling_rate=self.sampling_rate,
            )
            if self.num_frames is not None
            else None,
            num_samples=compute_num_samples(new_duration, self.sampling_rate)
            if self.num_samples is not None
            else None,
        )

    def extend_by(
        self,
        *,
        duration: Seconds,
        direction: str = "both",
        preserve_id: bool = False,
        pad_silence: bool = True,
    ) -> "PaddingCut":
        """Extend by ``duration`` (on both sides when direction='both')."""
        new_duration = self.duration + duration
        if direction == "both":
            new_duration += duration
        assert new_duration > 0.0
        return fastcopy(
            self,
            id=self.id if preserve_id else str(uuid4()),
            duration=new_duration,
            feat_value=self.feat_value,
            num_frames=compute_num_frames(
                duration=new_duration,
                frame_shift=self.frame_shift,
                sampling_rate=self.sampling_rate,
            )
            if self.num_frames is not None
            else None,
            num_samples=compute_num_samples(new_duration, self.sampling_rate)
            if self.num_samples is not None
            else None,
        )

    def pad(
        self,
        duration: Seconds = None,
        num_frames: int = None,
        num_samples: int = None,
        pad_feat_value: float = LOG_EPSILON,
        direction: str = "right",
        preserve_id: bool = False,
        pad_value_dict: Optional[Dict[str, Union[int, float]]] = None,
    ) -> Cut:
        from lhotse_tpu.cut.set import pad

        return pad(
            self,
            duration=duration,
            num_frames=num_frames,
            num_samples=num_samples,
            pad_feat_value=pad_feat_value,
            direction=direction,
            preserve_id=preserve_id,
            pad_value_dict=pad_value_dict,
        )

    def resample(
        self, sampling_rate: int, affix_id: bool = False, recording_field: Optional[str] = None
    ) -> "PaddingCut":
        """Metadata-only resample mimic."""
        assert self.has_recording, "Cannot resample a PaddingCut without Recording."
        return fastcopy(
            self,
            id=f"{self.id}_rs{sampling_rate}" if affix_id else self.id,
            sampling_rate=sampling_rate,
            num_samples=compute_num_samples(self.duration, sampling_rate),
            num_frames=None,
            num_features=None,
            frame_shift=None,
        )

    def perturb_speed(self, factor: float, affix_id: bool = True) -> "PaddingCut":
        """Metadata-only speed perturb mimic."""
        if self.has_features:
            logging.warning(
                "Perturbing speed on a PaddingCut with feature metadata: the "
                "feature dims will be detached."
            )
            new_num_frames = None
            new_num_features = None
            new_frame_shift = None
        else:
            new_num_frames = self.num_frames
            new_num_features = self.num_features
            new_frame_shift = self.frame_shift
        new_num_samples = perturb_num_samples(self.num_samples, factor)
        new_duration = new_num_samples / self.sampling_rate
        return fastcopy(
            self,
            id=f"{self.id}_sp{factor}" if affix_id else self.id,
            num_samples=new_num_samples,
            duration=new_duration,
            num_frames=new_num_frames,
            num_features=new_num_features,
            frame_shift=new_frame_shift,
        )

    def perturb_tempo(self, factor: float, affix_id: bool = True) -> "PaddingCut":
        """Metadata-only tempo perturb mimic."""
        if self.has_features:
            logging.warning(
                "Perturbing tempo on a PaddingCut with feature metadata: the "
                "feature dims will be detached."
            )
            new_num_frames = None
            new_num_features = None
            new_frame_shift = None
        else:
            new_num_frames = self.num_frames
            new_num_features = self.num_features
            new_frame_shift = self.frame_shift
        new_num_samples = perturb_num_samples(self.num_samples, factor)
        new_duration = new_num_samples / self.sampling_rate
        return fastcopy(
            self,
            id=f"{self.id}_tp{factor}" if affix_id else self.id,
            num_samples=new_num_samples,
            duration=new_duration,
            num_frames=new_num_frames,
            num_features=new_num_features,
            frame_shift=new_frame_shift,
        )

    def perturb_volume(self, factor: float, affix_id: bool = True) -> "PaddingCut":
        """Volume has no effect on silence — only the ID changes."""
        return fastcopy(self, id=f"{self.id}_vp{factor}" if affix_id else self.id)

    def reverb_rir(
        self,
        rir_recording: Optional["Recording"] = None,
        normalize_output: bool = True,
        early_only: bool = False,
        affix_id: bool = True,
        rir_channels: List[int] = [0],
        room_rng_seed: Optional[int] = None,
        source_rng_seed: Optional[int] = None,
    ) -> "PaddingCut":
        """Reverb has no effect on silence — only the ID changes."""
        return fastcopy(self, id=f"{self.id}_rvb" if affix_id else self.id)

    def normalize_loudness(self, target: float, affix_id: bool = False, **kwargs) -> "PaddingCut":
        return fastcopy(self, id=f"{self.id}_ln{target}" if affix_id else self.id)

    def drop_features(self) -> "PaddingCut":
        assert self.has_recording, (
            f"Cannot detach features from a PaddingCut with no Recording (cut ID = {self.id})."
        )
        return fastcopy(self, num_frames=None, num_features=None, frame_shift=None)

    def drop_recording(self) -> "PaddingCut":
        assert self.has_features, (
            f"Cannot detach recording from a PaddingCut with no Features (cut ID = {self.id})."
        )
        return fastcopy(self, num_samples=None)

    def drop_supervisions(self) -> "PaddingCut":
        return self

    def drop_alignments(self) -> "PaddingCut":
        return self

    def drop_in_memory_data(self) -> "PaddingCut":
        return self

    def compute_and_store_features(self, extractor, *args, **kwargs) -> Cut:
        """Update feature-dim metadata per the extractor; no actual compute."""
        return fastcopy(
            self,
            num_features=extractor.feature_dim(self.sampling_rate),
            num_frames=compute_num_frames(
                duration=self.duration,
                frame_shift=extractor.frame_shift,
                sampling_rate=self.sampling_rate,
            ),
            frame_shift=extractor.frame_shift,
        )

    def fill_supervision(self, *args, **kwargs) -> "PaddingCut":
        return self

    def move_to_memory(self, *args, **kwargs) -> "PaddingCut":
        return self

    def map_supervisions(self, transform_fn: Callable[[Any], Any]) -> "PaddingCut":
        return self

    def merge_supervisions(self, *args, **kwargs) -> "PaddingCut":
        return self

    def filter_supervisions(
        self, predicate: Callable[[SupervisionSegment], bool]
    ) -> "PaddingCut":
        return self

    @staticmethod
    def from_dict(data: dict) -> "PaddingCut":
        data.pop("type", None)
        return PaddingCut(**data)

    def with_features_path_prefix(self, path: Pathlike) -> "PaddingCut":
        return self

    def with_recording_path_prefix(self, path: Pathlike) -> "PaddingCut":
        return self
