"""
DataCut: abstract cut bound to a single Recording/Features pair.

Reference behavior: `/root/reference/lhotse/cut/data.py` — all lazy op
builders: ``truncate`` (:482), ``extend_by`` (:584), ``pad`` (:720),
``resample`` (:762), ``perturb_speed/tempo/volume`` (:799-935),
``narrowband``/``normalize_loudness``/``dereverb_wpe``/``clip_amplitude``/
``compress`` (:936-1146), ``compute_and_store_features`` (:452),
``fill_supervision`` (:401), ``attach_tensor``/``attach_image`` (:289,1205),
``move_to_memory`` (:225).
"""
from __future__ import annotations

import logging
from abc import ABCMeta, abstractmethod
from dataclasses import dataclass, field
from decimal import ROUND_DOWN
from math import isclose
from pathlib import Path
from typing import Any, Callable, Dict, Generator, Iterable, List, Optional, Tuple, Union

import numpy as np

from lhotse_tpu.array import Array, TemporalArray
from lhotse_tpu.audio import Recording, VideoInfo
from lhotse_tpu.custom import CustomFieldMixin
from lhotse_tpu.cut.base import Cut
from lhotse_tpu.features.base import FeatureExtractor, Features
from lhotse_tpu.features.io import FeaturesWriter
from lhotse_tpu.image import Image
from lhotse_tpu.supervision import SupervisionSegment
from lhotse_tpu.utils import (
    LOG_EPSILON,
    Pathlike,
    Seconds,
    TimeSpan,
    add_durations,
    asdict_nonull,
    compute_num_frames,
    compute_num_samples,
    fastcopy,
    is_module_available,
    measure_overlap,
    overlaps,
    overspans,
    perturb_num_samples,
    rich_exception_info,
    uuid4,
)


@dataclass
class DataCut(Cut, CustomFieldMixin, metaclass=ABCMeta):
    """
    Base class for cuts pointing at actual data: MonoCut or MultiCut
    (as opposed to MixedCut, an operation over a collection of cuts).
    """

    id: str
    start: Seconds
    duration: Seconds
    channel: Union[int, List[int]]
    supervisions: List[SupervisionSegment] = field(default_factory=list)
    features: Optional[Features] = None
    recording: Optional[Recording] = None
    custom: Optional[Dict[str, Any]] = None

    def to_dict(self) -> dict:
        d = asdict_nonull(self)
        if self.has_recording:
            d["recording"] = self.recording.to_dict()
        if self.custom is not None:
            for k, v in self.custom.items():
                if isinstance(v, Recording):
                    d["custom"][k] = v.to_dict()
        return {**d, "type": type(self).__name__}

    def iter_data(
        self,
    ) -> Generator[Tuple[str, Union[Recording, Features, Array, TemporalArray, Image]], None, None]:
        """Yield (key, manifest) for every piece of data attached to the cut."""
        if self.has_recording:
            yield "recording", self.recording
        if self.has_features:
            yield "features", self.features
        for k, v in (self.custom or {}).items():
            if isinstance(v, (Recording, Features, Array, TemporalArray, Image)):
                yield k, v

    @property
    def is_in_memory(self) -> bool:
        return any(v.is_in_memory for k, v in self.iter_data())

    @property
    def recording_id(self) -> str:
        return self.recording.id if self.has_recording else self.features.recording_id

    @property
    def has_features(self) -> bool:
        return self.features is not None

    @property
    def has_recording(self) -> bool:
        return self.recording is not None

    @property
    def has_video(self) -> bool:
        return self.has_recording and self.recording.has_video

    @property
    def video(self) -> Optional[VideoInfo]:
        if self.has_recording:
            v = self.recording.video
            if v is None:
                return None
            return v.copy_with(
                num_frames=compute_num_samples(self.duration, v.fps, rounding=ROUND_DOWN)
            )
        return None

    def has(self, field_: str) -> bool:
        if field_ == "recording":
            return self.has_recording
        elif field_ == "features":
            return self.has_features
        elif field_ == "video":
            return self.has_video
        else:
            return self.custom is not None and field_ in self.custom

    @property
    def frame_shift(self) -> Optional[Seconds]:
        return self.features.frame_shift if self.has_features else None

    @property
    def num_frames(self) -> Optional[int]:
        return (
            compute_num_frames(
                duration=self.duration,
                frame_shift=self.frame_shift,
                sampling_rate=self.sampling_rate,
            )
            if self.has_features
            else None
        )

    @property
    def num_samples(self) -> Optional[int]:
        return (
            compute_num_samples(self.duration, self.sampling_rate)
            if self.has_recording
            else None
        )

    @property
    def num_features(self) -> Optional[int]:
        return self.features.num_features if self.has_features else None

    @property
    @abstractmethod
    def num_channels(self) -> Optional[int]:
        ...

    @property
    def features_type(self) -> Optional[str]:
        return self.features.type if self.has_features else None

    @property
    def sampling_rate(self) -> int:
        return (
            self.features.sampling_rate if self.has_features else self.recording.sampling_rate
        )

    @rich_exception_info
    @abstractmethod
    def load_features(self, **kwargs) -> Optional[np.ndarray]:
        ...

    @rich_exception_info
    @abstractmethod
    def load_audio(self, **kwargs) -> Optional[np.ndarray]:
        ...

    @rich_exception_info
    @abstractmethod
    def load_video(self, **kwargs):
        ...

    def move_to_memory(
        self,
        audio_format: str = "wav",
        load_audio: bool = True,
        load_features: bool = True,
        load_custom: bool = True,
    ) -> "Cut":
        """
        Load attached data into memory and return a copy with binary data
        embedded in the manifest (default audio format: wav; the reference
        uses flac — pass ``audio_format="flac"`` for that).
        """
        if not load_audio or not self.has_recording:
            recording = self.recording
        else:
            recording = self.recording.move_to_memory(
                channels=self.channel,
                offset=self.start,
                duration=self.duration,
                format=audio_format,
            )
        if not load_features or not self.has_features:
            features = self.features
        else:
            features = self.features.move_to_memory(start=self.start, duration=self.duration)
        if not load_custom or self.custom is None:
            custom = self.custom
        else:
            custom = {
                k: v.move_to_memory()
                if isinstance(v, Array)
                else v.move_to_memory(start=self.start, duration=self.duration)
                if isinstance(v, TemporalArray)
                else v
                for k, v in self.custom.items()
            }
        return fastcopy(
            self,
            # Moved data covers exactly this cut, so start resets to 0.
            start=0.0,
            recording=recording,
            features=features,
            custom=custom,
        )

    def attach_tensor(
        self,
        name: str,
        data: np.ndarray,
        frame_shift: Optional[Seconds] = None,
        temporal_dim: Optional[int] = None,
        compressed: bool = False,
    ) -> "Cut":
        """
        Attach an in-memory tensor under ``name`` (an Array/TemporalArray
        manifest); later accessible via ``cut.load_<name>()``. Truncate/pad
        propagate to TemporalArrays.
        """
        from lhotse_tpu.features.io import MemoryLilcomWriter, MemoryRawWriter

        cpy = fastcopy(self, custom=self.custom.copy() if self.custom is not None else {})
        writer = MemoryLilcomWriter() if compressed else MemoryRawWriter()
        data = np.asarray(data)
        with writer:
            setattr(
                cpy,
                name,
                writer.store_array(
                    key=cpy.id,
                    value=data,
                    frame_shift=frame_shift,
                    temporal_dim=temporal_dim,
                    start=cpy.start,
                ),
            )
        return cpy

    def drop_features(self) -> "DataCut":
        assert self.has_recording, (
            f"Cannot detach features from a DataCut with no Recording (cut ID = {self.id})."
        )
        return fastcopy(self, features=None)

    def drop_recording(self) -> "DataCut":
        assert self.has_features, (
            f"Cannot detach recording from a DataCut with no Features (cut ID = {self.id})."
        )
        return fastcopy(self, recording=None)

    def drop_supervisions(self) -> "DataCut":
        return fastcopy(self, supervisions=[])

    def drop_alignments(self) -> "DataCut":
        return fastcopy(
            self, supervisions=[fastcopy(s, alignment={}) for s in self.supervisions]
        )

    def drop_in_memory_data(self) -> "DataCut":
        """Replace in-memory data manifests with Shar placeholders."""
        from lhotse_tpu.shar.utils import to_shar_placeholder

        custom = None
        if self.custom is not None:
            custom = self.custom.copy()
            for k in custom:
                v = custom[k]
                if isinstance(v, (Recording, Features, Array, TemporalArray)) and v.is_in_memory:
                    custom[k] = to_shar_placeholder(v)
        return fastcopy(
            self,
            recording=to_shar_placeholder(self.recording)
            if self.has_recording and self.recording.is_in_memory
            else self.recording,
            features=to_shar_placeholder(self.features)
            if self.has_features and self.features.is_in_memory
            else self.features,
            custom=custom,
        )

    def fill_supervision(self, add_empty: bool = True, shrink_ok: bool = False) -> "DataCut":
        """
        Make a single supervision span the whole cut (adding an empty one when
        absent, if ``add_empty``); raises when shrinking would occur unless
        ``shrink_ok``.
        """
        if len(self.supervisions) == 0:
            if not add_empty:
                return self
            sups = [
                SupervisionSegment(
                    id=self.id,
                    recording_id=self.recording_id,
                    start=0,
                    duration=self.duration,
                    channel=self.channel,
                )
            ]
        else:
            assert len(self.supervisions) == 1, (
                f"Cannot expand more than one supervision (found {len(self.supervisions)})."
            )
            old_sup = self.supervisions[0]
            if isclose(old_sup.start, 0) and isclose(old_sup.duration, self.duration):
                return self
            if (old_sup.start < 0 or old_sup.end > self.end) and not shrink_ok:
                raise ValueError(
                    f"Cannot shrink supervision (start={old_sup.start}, end={old_sup.end}) "
                    f"to cut (start=0, duration={self.duration}) with shrink_ok=False. "
                    f"A supervision exceeding a cut may indicate spoken content beyond "
                    f"the cut's bounds; set shrink_ok=True to override."
                )
            sups = [fastcopy(old_sup, start=0, duration=self.duration)]
        return fastcopy(self, supervisions=sups)

    def compute_and_store_features(
        self,
        extractor: FeatureExtractor,
        storage: FeaturesWriter,
        augment_fn=None,
        *args,
        **kwargs,
    ) -> "DataCut":
        """Compute, store, and attach features for this cut."""
        features_info = extractor.extract_from_samples_and_store(
            samples=self.load_audio(),
            storage=storage,
            sampling_rate=self.sampling_rate,
            offset=self.start,
            channel=self.channel,
            augment_fn=augment_fn,
        )
        return fastcopy(self, features=features_info)

    def truncate(
        self,
        *,
        offset: Seconds = 0.0,
        duration: Optional[Seconds] = None,
        keep_excessive_supervisions: bool = True,
        preserve_id: bool = False,
        _supervisions_index: Optional[Dict[str, Any]] = None,
    ) -> "DataCut":
        """
        Lazy sub-region view [offset, offset+duration) of this cut, clamped
        to its end; supervisions crossing the boundary are kept or discarded
        per ``keep_excessive_supervisions``.
        """
        assert offset >= 0, f"Offset for truncate must be non-negative (provided {offset})."
        new_start = max(add_durations(self.start, offset, sampling_rate=self.sampling_rate), 0)
        until = add_durations(
            offset,
            duration if duration is not None else self.duration,
            sampling_rate=self.sampling_rate,
        )
        new_duration = add_durations(until, -offset, sampling_rate=self.sampling_rate)
        assert new_duration > 0.0, f"new_duration={new_duration}"
        duration_past_end = add_durations(
            new_start, new_duration, -self.start, -self.duration, sampling_rate=self.sampling_rate
        )
        if duration_past_end > 0:
            new_duration = add_durations(
                new_duration, -duration_past_end, sampling_rate=self.sampling_rate
            )

        if _supervisions_index is None:
            criterion = overlaps if keep_excessive_supervisions else overspans
            new_time_span = TimeSpan(start=0, end=new_duration)
            new_supervisions = (segment.with_offset(-offset) for segment in self.supervisions)
            supervisions = [
                segment for segment in new_supervisions if criterion(new_time_span, segment)
            ]
        else:
            index = _supervisions_index[self.id]
            window = TimeSpan(offset, offset + new_duration)
            supervisions = []
            for segment in index.overlap(begin=offset, end=offset + new_duration):
                if not keep_excessive_supervisions:
                    # Only fully-contained supervisions (with epsilon slack).
                    if not (
                        segment.start >= offset - 1e-3
                        and segment.end <= offset + new_duration + 1e-3
                    ):
                        continue
                # Reject <1% overlaps caused by float precision quirks.
                if measure_overlap(segment, window) > 0.01:
                    supervisions.append(segment.with_offset(-offset))

        return fastcopy(
            self,
            id=self.id if preserve_id else str(uuid4()),
            start=new_start,
            duration=new_duration,
            supervisions=sorted(supervisions, key=lambda s: s.start),
        )

    def extend_by(
        self,
        *,
        duration: Seconds,
        direction: str = "both",
        preserve_id: bool = False,
        pad_silence: bool = True,
    ) -> Cut:
        """
        Extend the cut by ``duration`` seconds of *real* recording content in
        the given direction(s); pads with silence where the recording ends
        (when ``pad_silence``). Features/custom arrays that don't cover the
        extended span are detached with a warning.
        """
        assert duration >= 0, f"Duration must be non-negative (provided {duration})."
        new_start, new_end = self.start, self.end
        pad_left, pad_right = 0, 0
        if direction in ("left", "both"):
            if self.start - duration < 0 and pad_silence:
                pad_left = duration - self.start
            new_start = max(self.start - duration, 0)
        if direction in ("right", "both"):
            if self.end + duration > self.recording.duration and pad_silence:
                pad_right = duration - (self.recording.duration - self.end)
            new_end = min(self.end + duration, self.recording.duration)
        new_duration = add_durations(new_end, -new_start, sampling_rate=self.sampling_rate)

        new_supervisions = (
            segment.with_offset(
                add_durations(self.start, -new_start, sampling_rate=self.sampling_rate)
            )
            for segment in self.supervisions
        )

        def _this_exceeds_duration(attribute) -> bool:
            new_start_frames = compute_num_frames(
                new_start, attribute.frame_shift, self.sampling_rate
            )
            new_end_frames = compute_num_frames(new_end, attribute.frame_shift, self.sampling_rate)
            attribute_start = compute_num_frames(
                attribute.start, attribute.frame_shift, self.sampling_rate
            )
            attribute_end = attribute_start + attribute.num_frames
            return (new_start_frames < attribute_start - 1) or (
                new_end_frames > attribute_end + 1
            )

        feature_kwargs = {}
        if self.has_features:
            if _this_exceeds_duration(self.features):
                logging.warning(
                    "Attempting to extend a cut beyond the range of pre-computed "
                    "features; the feature manifest will be detached."
                )
                feature_kwargs["features"] = None

        custom_kwargs = {}
        if self.custom is not None:
            for name, array in self.custom.items():
                custom_kwargs[name] = array
                if isinstance(array, TemporalArray):
                    if _this_exceeds_duration(array):
                        logging.warning(
                            f"Attempting to extend a cut beyond the range of pre-computed "
                            f"custom data '{name}'; the data will be detached."
                        )
                        custom_kwargs[name] = None

        cut = fastcopy(
            self,
            id=self.id if preserve_id else str(uuid4()),
            start=new_start,
            duration=new_duration,
            supervisions=sorted(new_supervisions, key=lambda s: s.start),
            **feature_kwargs,
            custom=custom_kwargs,
        )
        if pad_left > 0:
            cut = cut.pad(
                duration=cut.duration + pad_left, direction="left", preserve_id=preserve_id
            )
        if pad_right > 0:
            cut = cut.pad(
                duration=cut.duration + pad_right, direction="right", preserve_id=preserve_id
            )
        return cut

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
        """Pad to a target duration/frames/samples; see :func:`lhotse_tpu.cut.set.pad`."""
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
        self,
        sampling_rate: int,
        affix_id: bool = False,
        recording_field: Optional[str] = None,
    ) -> "DataCut":
        """Lazy resample; drops any attached feature manifest."""
        assert self.has_recording, "Cannot resample a DataCut without Recording."
        custom = self.custom
        recording = self.recording
        if recording_field is None:
            recording = recording.resample(sampling_rate)
        else:
            custom = {
                **custom,
                recording_field: custom[recording_field].resample(sampling_rate),
            }
        return fastcopy(
            self,
            id=f"{self.id}_rs{sampling_rate}" if affix_id else self.id,
            recording=recording,
            features=None,
            custom=custom,
        )

    def perturb_speed(self, factor: float, affix_id: bool = True) -> "DataCut":
        """Lazy speed perturbation: updates recording, supervisions, and the
        cut's own start/duration via sample-count arithmetic."""
        assert self.has_recording, "Cannot perturb speed on a DataCut without Recording."
        if self.has_features:
            logging.warning(
                "Perturbing speed on a DataCut with pre-computed features: the "
                "feature manifest will be detached (no feature-domain speed perturb)."
            )
            self.features = None
        recording_sp = self.recording.perturb_speed(factor=factor, affix_id=affix_id)
        supervisions_sp = [
            s.perturb_speed(factor=factor, sampling_rate=self.sampling_rate, affix_id=affix_id)
            for s in self.supervisions
        ]
        start_samples = perturb_num_samples(
            compute_num_samples(self.start, self.sampling_rate), factor
        )
        new_start = start_samples / self.sampling_rate
        new_num_samples = perturb_num_samples(self.num_samples, factor)
        new_duration = new_num_samples / self.sampling_rate
        return fastcopy(
            self,
            id=f"{self.id}_sp{factor}" if affix_id else self.id,
            recording=recording_sp,
            supervisions=supervisions_sp,
            duration=new_duration,
            start=new_start,
        )

    def perturb_tempo(self, factor: float, affix_id: bool = True) -> "DataCut":
        """Lazy tempo (pitch-preserving) perturbation."""
        assert self.has_recording, "Cannot perturb tempo on a DataCut without Recording."
        if self.has_features:
            logging.warning(
                "Perturbing tempo on a DataCut with pre-computed features: the "
                "feature manifest will be detached."
            )
            self.features = None
        recording_tp = self.recording.perturb_tempo(factor=factor, affix_id=affix_id)
        supervisions_tp = [
            s.perturb_tempo(factor=factor, sampling_rate=self.sampling_rate, affix_id=affix_id)
            for s in self.supervisions
        ]
        start_samples = perturb_num_samples(
            compute_num_samples(self.start, self.sampling_rate), factor
        )
        new_start = start_samples / self.sampling_rate
        new_num_samples = perturb_num_samples(self.num_samples, factor)
        new_duration = new_num_samples / self.sampling_rate
        return fastcopy(
            self,
            id=f"{self.id}_tp{factor}" if affix_id else self.id,
            recording=recording_tp,
            supervisions=supervisions_tp,
            duration=new_duration,
            start=new_start,
        )

    def perturb_volume(self, factor: float, affix_id: bool = True) -> "DataCut":
        """Lazy volume perturbation."""
        assert self.has_recording, "Cannot perturb volume on a DataCut without Recording."
        if self.has_features:
            logging.warning(
                "Perturbing volume on a DataCut with pre-computed features: the "
                "feature manifest will be detached."
            )
            self.features = None
        recording_vp = self.recording.perturb_volume(factor=factor, affix_id=affix_id)
        supervisions_vp = [
            s.perturb_volume(factor=factor, affix_id=affix_id) for s in self.supervisions
        ]
        return fastcopy(
            self,
            id=f"{self.id}_vp{factor}" if affix_id else self.id,
            recording=recording_vp,
            supervisions=supervisions_vp,
        )

    def narrowband(
        self, codec: str, restore_orig_sr: bool = True, affix_id: bool = True
    ) -> "DataCut":
        """Lazy narrowband (telephone codec) effect."""
        assert self.has_recording, "Cannot apply narrowband on a DataCut without Recording."
        if self.has_features:
            logging.warning(
                "Applying narrowband on a DataCut with pre-computed features: the "
                "feature manifest will be detached."
            )
            self.features = None
        recording_nb = self.recording.narrowband(
            codec=codec, restore_orig_sr=restore_orig_sr, affix_id=affix_id
        )
        supervisions_nb = [
            s.narrowband(codec=codec, affix_id=affix_id) for s in self.supervisions
        ]
        return fastcopy(
            self,
            id=f"{self.id}_nb_{codec}" if affix_id else self.id,
            recording=recording_nb,
            supervisions=supervisions_nb,
        )

    def normalize_loudness(self, target: float, affix_id: bool = False, **kwargs) -> "DataCut":
        """Lazy loudness normalization to ``target`` LUFS."""
        assert self.has_recording, "Cannot normalize loudness without a Recording."
        if self.has_features:
            logging.warning(
                "Normalizing loudness on a DataCut with pre-computed features: the "
                "feature manifest will be detached."
            )
            self.features = None
        recording_ln = self.recording.normalize_loudness(target=target, affix_id=affix_id)
        supervisions_ln = [
            fastcopy(
                s,
                id=f"{s.id}_ln{target}" if affix_id else s.id,
                recording_id=f"{s.recording_id}_ln{target}" if affix_id else s.recording_id,
            )
            for s in self.supervisions
        ]
        return fastcopy(
            self,
            id=f"{self.id}_ln{target}" if affix_id else self.id,
            recording=recording_ln,
            supervisions=supervisions_ln,
        )

    def dereverb_wpe(self, affix_id: bool = True) -> "DataCut":
        """Lazy WPE dereverberation."""
        assert self.has_recording, "Cannot apply WPE on a DataCut without Recording."
        if self.has_features:
            logging.warning(
                "Dereverberating a DataCut with pre-computed features: the feature "
                "manifest will be detached."
            )
            self.features = None
        recording_wpe = self.recording.dereverb_wpe(affix_id=affix_id)
        supervisions_wpe = [
            fastcopy(
                s,
                id=f"{s.id}_wpe" if affix_id else s.id,
                recording_id=f"{s.recording_id}_wpe" if affix_id else s.recording_id,
            )
            for s in self.supervisions
        ]
        return fastcopy(
            self,
            id=f"{self.id}_wpe" if affix_id else self.id,
            recording=recording_wpe,
            supervisions=supervisions_wpe,
        )

    @abstractmethod
    def reverb_rir(
        self,
        rir_recording: Optional["Recording"] = None,
        normalize_output: bool = True,
        early_only: bool = False,
        affix_id: bool = True,
        rir_channels: List[int] = [0],
        room_rng_seed: Optional[int] = None,
        source_rng_seed: Optional[int] = None,
    ) -> "DataCut":
        ...

    def clip_amplitude(
        self,
        hard: bool = False,
        gain_db: float = 0.0,
        normalize: bool = True,
        oversampling: Optional[int] = 2,
        affix_id: bool = True,
    ) -> "DataCut":
        """Lazy clipping effect."""
        assert self.has_recording, "Cannot apply clipping on a DataCut without Recording."
        if self.has_features:
            logging.warning(
                "Applying clipping on a DataCut with pre-computed features: the "
                "clipping affects only the audio path."
            )
        recording_clipped = self.recording.clip_amplitude(
            hard=hard,
            gain_db=gain_db,
            normalize=normalize,
            oversampling=oversampling,
            affix_id=affix_id,
        )
        return fastcopy(
            self,
            id=f"{self.id}_cl{gain_db}" if affix_id else self.id,
            recording=recording_clipped,
        )

    def compress(
        self,
        codec: str = "opus",
        compression_level: float = 0.99,
        compress_custom_fields: bool = False,
    ) -> "DataCut":
        """Lazy lossy-codec round-trip on the recording (and optionally on
        custom Recording fields)."""
        assert self.has_recording, "Cannot compress a DataCut without a Recording."
        custom = self.custom
        if compress_custom_fields:
            if isinstance(custom, dict) and any(isinstance(v, Recording) for v in custom.values()):
                custom = {
                    k: v.compress(codec, compression_level) if isinstance(v, Recording) else v
                    for k, v in custom.items()
                }
        return fastcopy(
            self,
            recording=self.recording.compress(codec, compression_level),
            custom=custom,
        )

    def map_supervisions(
        self, transform_fn: Callable[[SupervisionSegment], SupervisionSegment]
    ) -> "DataCut":
        return fastcopy(self, supervisions=[s.map(transform_fn) for s in self.supervisions])

    def filter_supervisions(
        self, predicate: Callable[[SupervisionSegment], bool]
    ) -> "DataCut":
        return fastcopy(self, supervisions=[s for s in self.supervisions if predicate(s)])

    @abstractmethod
    def merge_supervisions(
        self,
        merge_policy: str = "delimiter",
        custom_merge_fn: Optional[Callable[[str, Iterable[Any]], Any]] = None,
        **kwargs,
    ) -> "DataCut":
        ...

    @staticmethod
    @abstractmethod
    def from_dict(data: dict) -> "DataCut":
        ...

    def with_features_path_prefix(self, path: Pathlike) -> "DataCut":
        if not self.has_features:
            return self
        return fastcopy(self, features=self.features.with_path_prefix(path))

    def with_recording_path_prefix(self, path: Pathlike) -> "DataCut":
        if not self.has_recording:
            return self
        return fastcopy(self, recording=self.recording.with_path_prefix(path))

    def attach_image(self, key: str, path_or_object: Union[str, np.ndarray, bytes]) -> "DataCut":
        """Attach an image (path / ndarray / bytes) under ``key`` in custom."""
        assert is_module_available("PIL"), "Using images requires 'pip install pillow'."
        from lhotse_tpu.image.image import Image
        from lhotse_tpu.image.io import PillowInMemoryWriter

        cpy = fastcopy(self, custom=self.custom.copy() if self.custom is not None else {})
        if isinstance(path_or_object, (str, Path)):
            import PIL.Image as PILImage

            with PILImage.open(path_or_object) as img:
                width, height = img.size
            path = Path(path_or_object)
            image_manifest = Image(
                storage_type="pillow_files",
                storage_path=str(path.parent),
                storage_key=str(path.name),
                width=width,
                height=height,
            )
        else:
            writer = PillowInMemoryWriter()
            with writer:
                image_manifest = writer.store_image(key, path_or_object)
        cpy.custom[key] = image_manifest
        return cpy
