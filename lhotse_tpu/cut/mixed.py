"""
MixedCut: a lazy DAG of tracks mixed on the fly.

Reference behavior: `/root/reference/lhotse/cut/mixed.py` — tracks are
``MixTrack{cut, type, offset, snr, is_snr_reference, mute, tag}`` (:67);
``load_audio`` walks tracks into an AudioMixer with SNR gains relative to the
reference track (:1312); ``load_features`` mixes in the **feature domain** via
the extractor-defined mix/compute_energy (:1199); post-mix transforms
(reverb/loudness) live in ``transforms`` (:843-1198); ``unmix`` splits back
into time-aligned constituents (:244).
"""
from __future__ import annotations

import logging
import warnings
from dataclasses import dataclass
from functools import partial, reduce
from io import BytesIO
from operator import add
from typing import Any, Callable, Dict, Generator, Iterable, List, Optional, Tuple, Union

import numpy as np

from lhotse_tpu.array import Array, TemporalArray
from lhotse_tpu.audio import (
    Recording,
    VideoInfo,
    get_audio_duration_mismatch_tolerance,
)
from lhotse_tpu.audio.backend import save_audio
from lhotse_tpu.audio.mixer import AudioMixer, VideoMixer, audio_energy
from lhotse_tpu.augmentation import (
    AudioTransform,
    LoudnessNormalization,
    ReverbWithImpulseResponse,
)
from lhotse_tpu.cut.base import Cut
from lhotse_tpu.cut.data import DataCut
from lhotse_tpu.cut.padding import PaddingCut
from lhotse_tpu.features.base import (
    FeatureExtractor,
    Features,
    create_default_feature_extractor,
)
from lhotse_tpu.features.io import FeaturesWriter
from lhotse_tpu.features.mixer import FeatureMixer
from lhotse_tpu.image import Image
from lhotse_tpu.supervision import SupervisionSegment
from lhotse_tpu.utils import (
    DEFAULT_PADDING_VALUE,
    LOG_EPSILON,
    Decibels,
    Pathlike,
    Seconds,
    add_durations,
    compute_num_frames,
    compute_num_samples,
    fastcopy,
    hash_str_to_int,
    merge_items_with_delimiter,
    overlaps,
    perturb_num_samples,
    rich_exception_info,
    uuid4,
)


@dataclass
class MixTrack:
    """One track in a mix: points to a DataCut/PaddingCut plus the offset/SNR
    relative to the first track."""

    cut: Cut
    type: str = None
    offset: Seconds = 0.0
    snr: Optional[Decibels] = None
    tag: Optional[str] = None
    is_snr_reference: bool = False
    mute: bool = False

    def __post_init__(self):
        self.type = type(self.cut).__name__

    @staticmethod
    def from_dict(data: dict):
        from lhotse_tpu.cut.set import deserialize_cut

        cut_dict = data.pop("cut")
        cut_dict["type"] = data.pop("type")
        return MixTrack(deserialize_cut(cut_dict), **data)

    def to_dict(self) -> Dict:
        ans = {"cut": self.cut.to_dict(), "type": self.type, "offset": self.offset}
        if self.snr is not None:
            ans["snr"] = self.snr
        if self.tag is not None:
            ans["tag"] = self.tag
        if self.is_snr_reference:
            ans["is_snr_reference"] = self.is_snr_reference
        if self.mute:
            ans["mute"] = self.mute
        return ans


@dataclass
class MixedCut(Cut):
    """
    A Cut composed of other cuts mixed lazily in multiple tracks, each with
    its own offset and SNR relative to the first track. Enables time-domain
    and feature-domain augmentation (noise/music/babble mixing, padding) with
    the actual mixing performed on load.
    """

    id: str
    tracks: List[MixTrack]
    transforms: Optional[List[AudioTransform]] = None

    @property
    def supervisions(self) -> List[SupervisionSegment]:
        """Supervisions of all audible source cuts, offset by their track offsets."""
        return [
            segment.with_offset(track.offset)
            for track in _get_audible_tracks(self)
            for segment in track.cut.supervisions
        ]

    @property
    def start(self) -> Seconds:
        return 0

    @property
    def duration(self) -> Seconds:
        track_durations = (
            track.offset + track.cut.duration for track in _get_audible_tracks(self)
        )
        return round(max(track_durations), ndigits=8)

    @property
    def channel(self) -> Union[int, List[int]]:
        num_channels = self.num_channels
        return list(range(num_channels)) if num_channels > 1 else 0

    @property
    def has_features(self) -> bool:
        return self._first_non_padding_cut.has_features

    @property
    def has_recording(self) -> bool:
        return self._first_non_padding_cut.has_recording

    @property
    def has_video(self) -> bool:
        return self._first_non_padding_cut.has_video

    @property
    def is_in_memory(self) -> bool:
        return any(track.cut.is_in_memory for track in _get_audible_tracks(self))

    def has(self, field: str) -> bool:
        return self._first_non_padding_cut.has(field)

    @property
    def num_frames(self) -> Optional[int]:
        if self.has_features:
            return compute_num_frames(
                duration=self.duration,
                frame_shift=self.frame_shift,
                sampling_rate=self.sampling_rate,
            )
        return None

    @property
    def frame_shift(self) -> Optional[Seconds]:
        return self._first_non_padding_cut.frame_shift

    @property
    def sampling_rate(self) -> Optional[int]:
        return self._first_non_padding_cut.sampling_rate

    @property
    def num_samples(self) -> Optional[int]:
        return compute_num_samples(self.duration, self.sampling_rate)

    @property
    def num_features(self) -> Optional[int]:
        return self._first_non_padding_cut.num_features

    @property
    def num_channels(self) -> Optional[int]:
        return max(track.cut.num_channels for track in _get_audible_tracks(self))

    @property
    def features_type(self) -> Optional[str]:
        return self._first_non_padding_cut.features.type if self.has_features else None

    def to_dict(self) -> dict:
        ans = {
            "id": self.id,
            "tracks": [t.to_dict() for t in self.tracks],
            "type": type(self).__name__,
        }
        if self.transforms:
            ans["transforms"] = [t.to_dict() for t in self.transforms]
        return ans

    def unmix(self, tag: Optional[str] = None) -> List[Cut]:
        """
        Split into time-aligned constituent cuts: one per non-padding track, or
        — when ``tag`` is given — exactly two: ``[without_tag, with_tag]``
        (muted SNR-reference tracks are retained internally for exact SNR math).
        """
        tracks = [
            track for track in _get_audible_tracks(self) if not isinstance(track.cut, PaddingCut)
        ]
        if tag is None:
            return [_to_unmixed_cut(self, [track]) for track in tracks]
        without_tag = [track for track in tracks if track.tag != tag]
        with_tag = [track for track in tracks if track.tag == tag]
        return [_to_unmixed_cut(self, without_tag), _to_unmixed_cut(self, with_tag)]

    def iter_data(self) -> Generator:
        return self._first_non_padding_cut.iter_data()

    def __setattr__(self, key: str, value: Any) -> None:
        # MixedCut has no own `custom`; by convention custom attrs go to the
        # first non-padding cut.
        if key in self.__dataclass_fields__:
            super().__setattr__(key, value)
        else:
            setattr(self._first_non_padding_cut, key, value)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("__"):
            raise AttributeError()
        if name.startswith("load_"):
            return partial(self.load_custom, name[5:])
        if name == "custom":
            ans = {}
            for t in _get_audible_tracks(self):
                if cstm := t.cut.custom:
                    ans.update(cstm)
            return ans
        tracks_with_attr = self._get_tracks_with_custom_attr(name)
        if tracks_with_attr:
            _, mono_cut = tracks_with_attr[0]
            return getattr(mono_cut, name)
        raise AttributeError(f"No such attribute: '{name}'")

    def has_custom(self, name: str) -> bool:
        tracks_with_attr = self._get_tracks_with_custom_attr(name)
        if not tracks_with_attr:
            return False
        _, mono_cut = tracks_with_attr[0]
        return hasattr(mono_cut, name)

    def load_custom(self, name: str) -> np.ndarray:
        """
        Load a custom Array/TemporalArray/Recording attribute with padding as
        dictated by the padding tracks; multi-track combination is supported
        for Recording-type attributes only.
        """
        from lhotse_tpu.array import Array, pad_array

        tracks_with_attr = self._get_tracks_with_custom_attr(name)
        assert len(tracks_with_attr) > 0, (
            f"No non-padding tracks with custom attribute '{name}' found in this MixedCut."
        )
        first_idx, first_cut = tracks_with_attr[0]
        manifest = getattr(first_cut, name)

        if len(tracks_with_attr) > 1:
            if isinstance(manifest, Recording):
                return self._load_custom_recording_multi_track(name, tracks_with_attr)
            raise ValueError(
                f"This MixedCut has {len(tracks_with_attr)} non-padding tracks with "
                f"custom attribute '{name}'; mixing custom attributes is only "
                f"supported for Recording-type attributes."
            )

        if isinstance(manifest, Array):
            return first_cut.load_custom(name)

        left_padding = self.tracks[first_idx].offset
        padded_duration = self.duration

        if isinstance(manifest, Recording):
            return (
                manifest.to_cut()
                .pad(duration=manifest.duration + left_padding, direction="left")
                .pad(duration=padded_duration, direction="right")
                .load_audio()
            )

        array = first_cut.load_custom(name)
        try:
            pad_value_dict = [t.cut for t in self.tracks if isinstance(t.cut, PaddingCut)][
                0
            ].custom
            pad_value = pad_value_dict[name]
        except Exception:
            pad_value = DEFAULT_PADDING_VALUE

        return pad_array(
            array,
            temporal_dim=manifest.temporal_dim,
            frame_shift=manifest.frame_shift,
            offset=left_padding,
            padded_duration=padded_duration,
            pad_value=pad_value,
        )

    def _load_custom_recording_multi_track(self, name: str, tracks_with_attr: list) -> np.ndarray:
        """Combine a custom Recording attribute across multiple tracks (e.g.
        appended cuts with per-cut target_audio)."""
        first_idx, first_cut = tracks_with_attr[0]
        first_audio = first_cut.load_custom(name)
        first_recording = getattr(first_cut, name)
        custom_sr = first_recording.sampling_rate
        mixer = AudioMixer(
            base_audio=first_audio,
            sampling_rate=custom_sr,
            base_offset=self.tracks[first_idx].offset,
        )
        for track_idx, cut in tracks_with_attr[1:]:
            mixer.add_to_mix(audio=cut.load_custom(name), offset=self.tracks[track_idx].offset)
        audio = mixer.mixed_audio
        expected_num_samples = compute_num_samples(self.duration, custom_sr)
        tol_samples = compute_num_samples(get_audio_duration_mismatch_tolerance(), custom_sr)
        num_samples_diff = audio.shape[1] - expected_num_samples
        if 0 < num_samples_diff < tol_samples:
            audio = audio[:, :expected_num_samples]
        if -tol_samples < num_samples_diff < 0:
            audio = np.pad(audio, [(0, 0), (0, -num_samples_diff)])
        return audio

    def _get_tracks_with_custom_attr(self, attr_name: str) -> list:
        return [
            (idx, t.cut)
            for idx, t in enumerate(self.tracks)
            if isinstance(t.cut, DataCut)
            and not t.mute
            and t.cut.custom is not None
            and attr_name in t.cut.custom
        ]

    def move_to_memory(
        self,
        audio_format: str = "wav",
        load_audio: bool = True,
        load_features: bool = True,
        load_custom: bool = True,
    ) -> "MixedCut":
        return fastcopy(
            self,
            tracks=[
                fastcopy(
                    t,
                    cut=t.cut.move_to_memory(
                        audio_format=audio_format,
                        load_audio=load_audio,
                        load_features=load_features,
                        load_custom=load_custom,
                    ),
                )
                for t in self.tracks
            ],
        )

    def to_mono(self, encoding: str = "wav", **kwargs) -> "Cut":
        """Mix all tracks/channels into one in-memory MonoCut."""
        samples = self.load_audio(mono_downmix=True)
        stream = BytesIO()
        save_audio(stream, samples, self.sampling_rate, format=encoding)
        recording = Recording.from_bytes(stream.getvalue(), recording_id=self.id)
        return fastcopy(
            recording.to_cut(),
            supervisions=[fastcopy(s, channel=0) for s in self.supervisions],
            custom=self._first_non_padding_track.cut.custom,
        )

    def truncate(
        self,
        *,
        offset: Seconds = 0.0,
        duration: Optional[Seconds] = None,
        keep_excessive_supervisions: bool = True,
        preserve_id: bool = False,
        _supervisions_index: Optional[Dict[str, Any]] = None,
    ) -> Cut:
        """
        Sub-region view: truncates the underlying cuts and adjusts their
        offsets; tracks falling outside are removed (returning a plain cut or
        PaddingCut in the degenerate cases).
        """
        assert offset >= 0, f"Offset for truncate must be non-negative (provided {offset})."
        old_duration = self.duration
        new_mix_end = (
            add_durations(old_duration, -offset, sampling_rate=self.sampling_rate)
            if duration is None
            else add_durations(offset, duration, sampling_rate=self.sampling_rate)
        )

        def truncate_track(track: MixTrack) -> Optional[MixTrack]:
            cut_offset = max(
                add_durations(offset, -track.offset, sampling_rate=self.sampling_rate), 0
            )
            track_offset = max(
                add_durations(track.offset, -offset, sampling_rate=self.sampling_rate), 0
            )
            track_end = add_durations(
                track.offset, track.cut.duration, sampling_rate=self.sampling_rate
            )
            if track_end < offset:
                return None
            cut_duration_decrease = 0
            if track_end > new_mix_end:
                if duration is not None:
                    cut_duration_decrease = add_durations(
                        track_end, -new_mix_end, sampling_rate=self.sampling_rate
                    )
                else:
                    cut_duration_decrease = add_durations(
                        track_end, -old_duration, sampling_rate=self.sampling_rate
                    )
            new_duration = add_durations(
                track.cut.duration,
                -cut_offset,
                -cut_duration_decrease,
                sampling_rate=self.sampling_rate,
            )
            if new_duration <= 0:
                return None
            return MixTrack(
                cut=track.cut.truncate(
                    offset=cut_offset,
                    duration=new_duration,
                    keep_excessive_supervisions=keep_excessive_supervisions,
                    preserve_id=preserve_id,
                    _supervisions_index=_supervisions_index,
                ),
                offset=track_offset,
                snr=track.snr,
                tag=track.tag,
                is_snr_reference=track.is_snr_reference,
                mute=track.mute,
            )

        new_tracks = [
            new_track
            for new_track in (
                truncate_track(track) for track in sorted(self.tracks, key=lambda t: t.offset)
            )
            if new_track is not None
        ]
        if len([t for t in new_tracks if not isinstance(t.cut, PaddingCut)]) == 0:
            return PaddingCut(
                id=self.id if preserve_id else str(uuid4()),
                duration=duration,
                sampling_rate=self.sampling_rate,
                feat_value=0.0,
                num_samples=compute_num_samples(duration, self.sampling_rate),
            )
        if len(new_tracks) == 1:
            return new_tracks[0].cut

        new_cut = MixedCut(id=self.id if preserve_id else str(uuid4()), tracks=new_tracks)

        # If the SNR reference was truncated away, make the first non-padding
        # track the new reference.
        if not any(track.is_snr_reference for track in new_cut.tracks) and all(
            t.snr is not None or isinstance(t.cut, PaddingCut) for t in new_cut.tracks
        ):
            first_non_padding_track_idx = [
                idx for idx, t in enumerate(new_cut.tracks) if not isinstance(t.cut, PaddingCut)
            ][0]
            new_cut.tracks[first_non_padding_track_idx] = fastcopy(
                new_cut.tracks[first_non_padding_track_idx], snr=None, is_snr_reference=True
            )
        return new_cut

    def extend_by(self, **kwargs) -> "MixedCut":
        raise ValueError("The extend_by() method is not defined for a MixedCut.")

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
    ) -> "MixedCut":
        """Lazy resample of all tracks; drops feature manifests."""
        assert self.has_recording, "Cannot resample a MixedCut without Recording."
        return MixedCut(
            id=f"{self.id}_rs{sampling_rate}" if affix_id else self.id,
            tracks=[
                fastcopy(t, cut=t.cut.resample(sampling_rate, recording_field=recording_field))
                for t in self.tracks
            ],
        )

    def compress(
        self,
        codec: str = "opus",
        compression_level: float = 0.99,
        compress_custom_fields: bool = False,
    ):
        assert self.has_recording, "Cannot compress a MixedCut without a Recording."
        return MixedCut(
            id=self.id,
            tracks=[
                fastcopy(t, cut=t.cut.compress(codec, compression_level, compress_custom_fields))
                for t in self.tracks
            ],
        )

    def perturb_speed(self, factor: float, affix_id: bool = True) -> "MixedCut":
        """Lazy speed perturbation of all tracks (offsets updated via sample counts)."""
        assert self.has_recording, "Cannot perturb speed on a MixedCut without Recording."
        if self.has_features:
            logging.warning(
                "Perturbing speed on a MixedCut with pre-computed features: the "
                "feature manifests will be detached."
            )
        return MixedCut(
            id=f"{self.id}_sp{factor}" if affix_id else self.id,
            tracks=[
                fastcopy(
                    track,
                    cut=track.cut.perturb_speed(factor=factor, affix_id=affix_id),
                    offset=round(
                        perturb_num_samples(
                            num_samples=compute_num_samples(track.offset, self.sampling_rate),
                            factor=factor,
                        )
                        / self.sampling_rate,
                        ndigits=8,
                    ),
                )
                for track in self.tracks
            ],
        )

    def perturb_tempo(self, factor: float, affix_id: bool = True) -> "MixedCut":
        """Lazy tempo perturbation of all tracks."""
        assert self.has_recording, "Cannot perturb tempo on a MixedCut without Recording."
        if self.has_features:
            logging.warning(
                "Perturbing tempo on a MixedCut with pre-computed features: the "
                "feature manifests will be detached."
            )
        return MixedCut(
            id=f"{self.id}_tp{factor}" if affix_id else self.id,
            tracks=[
                fastcopy(
                    track,
                    cut=track.cut.perturb_tempo(factor=factor, affix_id=affix_id),
                    offset=round(
                        perturb_num_samples(
                            num_samples=compute_num_samples(track.offset, self.sampling_rate),
                            factor=factor,
                        )
                        / self.sampling_rate,
                        ndigits=8,
                    ),
                )
                for track in self.tracks
            ],
        )

    def perturb_volume(self, factor: float, affix_id: bool = True) -> "MixedCut":
        """Lazy volume perturbation of all tracks."""
        assert self.has_recording, "Cannot perturb volume on a MixedCut without Recording."
        if self.has_features:
            logging.warning(
                "Perturbing volume on a MixedCut with pre-computed features: the "
                "feature manifests will be detached."
            )
        return MixedCut(
            id=f"{self.id}_vp{factor}" if affix_id else self.id,
            tracks=[
                fastcopy(track, cut=track.cut.perturb_volume(factor=factor, affix_id=affix_id))
                for track in self.tracks
            ],
        )

    def clip_amplitude(
        self,
        hard: bool = False,
        gain_db: float = 0.0,
        normalize: bool = True,
        oversampling: Optional[int] = 2,
        affix_id: bool = True,
    ) -> "MixedCut":
        """Lazy clipping of all tracks."""
        assert self.has_recording, "Cannot apply clipping on a MixedCut without Recording."
        if self.has_features:
            logging.warning(
                "Applying clipping on a MixedCut with pre-computed features: the "
                "feature manifests will be detached."
            )
        return MixedCut(
            id=f"{self.id}_cl{gain_db}" if affix_id else self.id,
            tracks=[
                fastcopy(
                    track,
                    cut=track.cut.clip_amplitude(
                        hard=hard,
                        gain_db=gain_db,
                        normalize=normalize,
                        oversampling=oversampling,
                        affix_id=affix_id,
                    ),
                )
                for track in self.tracks
            ],
        )

    def normalize_loudness(
        self, target: float, mix_first: bool = True, affix_id: bool = False
    ) -> Cut:
        """Lazy loudness normalization: on the mix (mix_first) or per track."""
        assert self.has_recording, "Cannot normalize loudness on a MixedCut without Recording."
        if self.has_features:
            logging.warning(
                "Normalizing loudness on a MixedCut with pre-computed features: the "
                "feature manifests will be detached."
            )
        if mix_first:
            transforms = self.transforms.copy() if self.transforms is not None else []
            transforms.append(LoudnessNormalization(target=target))
            return fastcopy(
                self,
                id=f"{self.id}_ln{target}" if affix_id else self.id,
                transforms=transforms,
            )
        return MixedCut(
            id=f"{self.id}_ln{target}" if affix_id else self.id,
            tracks=[
                fastcopy(track, cut=track.cut.normalize_loudness(target=target, affix_id=affix_id))
                for track in self.tracks
            ],
        )

    def reverb_rir(
        self,
        rir_recording: Optional["Recording"] = None,
        normalize_output: bool = True,
        early_only: bool = False,
        affix_id: bool = True,
        rir_channels: List[int] = [0],
        room_rng_seed: Optional[int] = None,
        source_rng_seed: Optional[int] = None,
        mix_first: bool = True,
    ) -> "MixedCut":
        """
        Lazy reverberation: same RIR on the mix (``mix_first=True``), or one
        RIR per track (shared room seed, distinct source seeds) to simulate
        multiple speakers in the same room.
        """
        assert self.has_recording, "Cannot apply reverberation on a MixedCut without Recording."
        if self.has_features:
            logging.warning(
                "Reverberating a MixedCut with pre-computed features: the feature "
                "manifests will be detached."
            )
        assert rir_recording is None or all(
            c < rir_recording.num_channels for c in rir_channels
        ), "Invalid channel index in `rir_channels`."
        audible_tracks = _get_audible_tracks(self)
        assert len(rir_channels) == 1 or len(rir_channels) == len(audible_tracks), (
            "Invalid number of channels in `rir_channels`: must be 1 or equal to "
            "the number of tracks."
        )

        uuid4_str = str(uuid4())
        if room_rng_seed is None:
            room_rng_seed = hash_str_to_int(uuid4_str + self.id, max_value=2**31)
        source_rng_seeds = [source_rng_seed] * len(self.tracks)
        if source_rng_seed is None:
            source_rng_seeds = [
                hash_str_to_int(uuid4_str + track.cut.id, max_value=2**31)
                for track in self.tracks
            ]
            source_rng_seed = source_rng_seeds[0]

        if mix_first:
            if rir_recording is None:
                from lhotse_tpu.augmentation.utils import FastRandomRIRGenerator

                rir_generator = FastRandomRIRGenerator(
                    sr=self.sampling_rate,
                    room_seed=room_rng_seed,
                    source_seed=source_rng_seed,
                )
            else:
                rir_generator = None
            transforms = self.transforms.copy() if self.transforms is not None else []
            transforms.append(
                ReverbWithImpulseResponse(
                    rir=rir_recording,
                    normalize_output=normalize_output,
                    early_only=early_only,
                    rir_channels=rir_channels if rir_channels is not None else [0],
                    rir_generator=rir_generator,
                )
            )
            return fastcopy(
                self, id=f"{self.id}_rvb" if affix_id else self.id, transforms=transforms
            )

        if len(rir_channels) == 1:
            rir_channels = rir_channels * len(self.tracks)
        else:
            audible_channels = iter(rir_channels)
            rir_channels = [
                next(audible_channels) if not track.mute else rir_channels[0]
                for track in self.tracks
            ]
        return MixedCut(
            id=f"{self.id}_rvb" if affix_id else self.id,
            tracks=[
                fastcopy(
                    track,
                    cut=track.cut.reverb_rir(
                        rir_recording=rir_recording,
                        normalize_output=normalize_output,
                        early_only=early_only,
                        affix_id=affix_id,
                        rir_channels=[channel],
                        room_rng_seed=room_rng_seed,
                        source_rng_seed=seed,
                    ),
                )
                for track, channel, seed in zip(self.tracks, rir_channels, source_rng_seeds)
            ],
        )

    @rich_exception_info
    def load_features(self, mixed: bool = True) -> Optional[np.ndarray]:
        """
        Load and feature-domain-mix the source cuts. With ``mixed=False``,
        returns the per-track padded feature stack instead.
        """
        if not self.has_features:
            return None
        tracks = _get_audible_tracks(self)
        first_track = tracks[0]
        first_cut = first_track.cut

        # Fast path: one real cut plus padding only — no extractor required.
        if (
            mixed
            and first_track.snr is None
            and tracks[1:]
            and all(isinstance(t.cut, PaddingCut) for t in tracks[1:])
        ):
            padding_val = tracks[1].cut.feat_value
            first_cut_feats = first_cut.load_features()
            if first_cut_feats.ndim == 2:
                feats = np.ones((self.num_frames, self.num_features)) * padding_val
            else:
                feats = (
                    np.ones((self.num_frames, self.num_features, first_cut_feats.shape[-1]))
                    * padding_val
                )
            feats[: first_cut.num_frames, ...] = first_cut_feats
            return feats

        # Real mixing: establish a reference energy (the SNR-reference track
        # may not be the first one, e.g. after left padding).
        reference_feats = None
        reference_energy = None
        _, reference_track = _get_snr_reference_track(self)
        feature_extractor = create_default_feature_extractor(reference_track.cut.features_type)
        if reference_track is not first_track:
            reference_feats = reference_track.cut.load_features()
            reference_energy = feature_extractor.compute_energy(reference_feats)

        first_cut_feats = first_cut.load_features()
        first_cut_feats = _scale_features_for_snr(
            first_cut_feats,
            feature_extractor=feature_extractor,
            snr=first_track.snr,
            reference_energy=reference_energy,
        )
        mixer = FeatureMixer(
            feature_extractor=feature_extractor,
            base_feats=first_cut_feats,
            frame_shift=first_cut.frame_shift,
            reference_energy=reference_energy,
        )
        for track in tracks[1:]:
            if track is reference_track and reference_feats is not None:
                feats = reference_feats
            else:
                feats = track.cut.load_features()
            mixer.add_to_mix(
                feats=feats,
                snr=track.snr,
                offset=track.offset,
                sampling_rate=track.cut.sampling_rate,
            )

        if mixed:
            feats = mixer.mixed_feats
            # Fix off-by-one frame-count drift from duration rounding.
            if feats.shape[0] - self.num_frames == 1:
                feats = feats[: self.num_frames, :]
            if feats.shape[0] - self.num_frames == -1:
                feats = np.concatenate((feats, feats[-1:, :]), axis=0)
            assert feats.shape[0] == self.num_frames, (
                "Inconsistent number of frames in a MixedCut — please report this "
                "with the output of print(cut)."
            )
            return feats
        return mixer.unmixed_feats

    @rich_exception_info
    def load_audio(self, mixed: bool = True, mono_downmix: bool = False) -> Optional[np.ndarray]:
        """
        Load and mix the source audios. With ``mixed=False``, returns the
        per-track padded stack; ``mono_downmix`` sums channels of a
        multi-channel mix.
        """
        if not self.has_recording:
            return None
        tracks = _get_audible_tracks(self)
        first_track = tracks[0]
        first_cut = first_track.cut

        reference_audio = None
        reference_energy = None
        _, reference_track = _get_snr_reference_track(self)
        if reference_track is not first_track:
            reference_audio = reference_track.cut.load_audio()
            reference_energy = audio_energy(reference_audio)

        first_cut_audio = _scale_audio_for_snr(
            first_cut.load_audio(), snr=first_track.snr, reference_energy=reference_energy
        )
        mixer = AudioMixer(
            first_cut_audio,
            sampling_rate=first_cut.sampling_rate,
            reference_energy=reference_energy,
            base_offset=first_track.offset,
        )
        for track in tracks[1:]:
            if track is reference_track and reference_audio is not None:
                audio = reference_audio
            else:
                audio = track.cut.load_audio()
            mixer.add_to_mix(audio=audio, snr=track.snr, offset=track.offset)

        mono_downmix = mono_downmix and any(track.type == "MultiCut" for track in tracks)
        mono_downmix = mono_downmix and mixed

        if mixed:
            audio = mixer.mixed_mono_audio if mono_downmix else mixer.mixed_audio
            tol_samples = compute_num_samples(
                get_audio_duration_mismatch_tolerance(), sampling_rate=self.sampling_rate
            )
            num_samples_diff = audio.shape[1] - self.num_samples
            if 0 < num_samples_diff < tol_samples:
                audio = audio[:, : self.num_samples]
            if -tol_samples < num_samples_diff < 0:
                audio = np.pad(audio, [(0, 0), (0, -num_samples_diff)], mode="reflect")
            assert audio.shape[1] == self.num_samples, (
                f"Inconsistent number of samples in a MixedCut: expected "
                f"{self.num_samples}, the mix produced {audio.shape[1]}."
            )
            transforms = [
                tnfm if isinstance(tnfm, AudioTransform) else AudioTransform.from_dict(tnfm)
                for tnfm in self.transforms or []
            ]
            for tfn in transforms:
                audio = tfn(audio, self.sampling_rate)
        else:
            audio = mixer.unmixed_audio
        return audio

    @property
    def video(self) -> Optional[VideoInfo]:
        if self.has_video:
            v = self._first_non_padding_cut.video
            return v.copy_with(num_frames=compute_num_samples(self.duration, v.fps))
        return None

    @rich_exception_info
    def load_video(self, with_audio: bool = True, mixed: bool = True, mono_downmix: bool = False):
        if not self.has_video:
            return None
        tracks = _get_audible_tracks(self)
        mixer = VideoMixer(
            tracks[0].cut.load_video(with_audio=False)[0],
            fps=self.video.fps,
            base_offset=tracks[0].offset,
        )
        for track in tracks[1:]:
            mixer.add_to_mix(
                video=track.cut.load_video(with_audio=False)[0], offset=track.offset
            )
        video = mixer.mixed_video
        audio = None
        if with_audio:
            audio = self.load_audio(mixed=mixed, mono_downmix=mono_downmix)
        return video, audio

    def plot_tracks_features(self):
        import matplotlib.pyplot as plt

        tracks = _get_audible_tracks(self)
        fig, axes = plt.subplots(len(tracks))
        features = self.load_features(mixed=False)
        fmin, fmax = features.min(), features.max()
        for idx, ax in enumerate(axes):
            ax.imshow(np.flip(features[idx].transpose(1, 0), 0), vmin=fmin, vmax=fmax)
        return axes

    def plot_tracks_audio(self):
        import matplotlib.pyplot as plt

        audio = self.load_audio(mixed=False)
        tracks = _get_audible_tracks(self)
        fig, axes = plt.subplots(len(tracks), sharex=False, sharey=True)
        for idx, (track, ax) in enumerate(zip(tracks, axes)):
            samples = audio[idx].squeeze(0)
            ax.plot(np.linspace(0, self.duration, len(samples)), samples)
            for supervision in track.cut.supervisions:
                supervision = supervision.trim(track.cut.duration)
                ax.axvspan(
                    track.offset + supervision.start,
                    track.offset + supervision.end,
                    color="green",
                    alpha=0.1,
                )
        return axes

    def drop_features(self) -> "MixedCut":
        assert self.has_recording, (
            f"Cannot detach features from a MixedCut with no Recording (cut ID = {self.id})."
        )
        return fastcopy(self, tracks=[fastcopy(t, cut=t.cut.drop_features()) for t in self.tracks])

    def drop_recording(self) -> "MixedCut":
        assert self.has_features, (
            f"Cannot detach recording from a MixedCut with no Features (cut ID = {self.id})."
        )
        return fastcopy(
            self, tracks=[fastcopy(t, cut=t.cut.drop_recording()) for t in self.tracks]
        )

    def drop_supervisions(self) -> "MixedCut":
        return fastcopy(
            self, tracks=[fastcopy(t, cut=t.cut.drop_supervisions()) for t in self.tracks]
        )

    def drop_alignments(self) -> "MixedCut":
        return fastcopy(
            self, tracks=[fastcopy(t, cut=t.cut.drop_alignments()) for t in self.tracks]
        )

    def drop_in_memory_data(self) -> "MixedCut":
        return fastcopy(
            self, tracks=[fastcopy(t, cut=t.cut.drop_in_memory_data()) for t in self.tracks]
        )

    def compute_and_store_features(
        self,
        extractor: FeatureExtractor,
        storage: FeaturesWriter,
        augment_fn=None,
        mix_eagerly: bool = True,
    ) -> DataCut:
        """
        Compute+store features: eagerly (mix audio first → one MonoCut without
        a recording) or lazily per track (returns a MixedCut whose tracks all
        carry Features for dynamic feature-domain mixing).
        """
        if mix_eagerly:
            from lhotse_tpu.cut.mono import MonoCut

            features_info = extractor.extract_from_samples_and_store(
                samples=self.load_audio(),
                storage=storage,
                sampling_rate=self.sampling_rate,
                offset=0,
                channel=0,
                augment_fn=augment_fn,
            )
            features_info.recording_id = self.id
            return MonoCut(
                id=self.id,
                start=0,
                duration=self.duration,
                channel=0,
                supervisions=[fastcopy(s, recording_id=self.id) for s in self.supervisions],
                features=features_info,
                recording=None,
                custom=self.custom if hasattr(self, "custom") else None,
            )
        new_tracks = [
            MixTrack(
                cut=track.cut.compute_and_store_features(
                    extractor=extractor, storage=storage, augment_fn=augment_fn
                ),
                offset=track.offset,
                snr=track.snr,
                tag=track.tag,
                is_snr_reference=track.is_snr_reference,
                mute=track.mute,
            )
            for track in self.tracks
        ]
        return MixedCut(id=self.id, tracks=new_tracks)

    def fill_supervision(self, add_empty: bool = True, shrink_ok: bool = False) -> "MixedCut":
        """Expand (or add) the single supervision to span the full mix duration."""
        n_sups = len(self.supervisions)
        if n_sups == 0:
            if not add_empty:
                return self
            first_non_padding_idx = self.tracks.index(self._first_non_padding_track)
            new_tracks = [
                fastcopy(
                    t,
                    cut=fastcopy(
                        t.cut,
                        supervisions=[
                            SupervisionSegment(
                                id=self.id,
                                recording_id=t.cut.recording_id,
                                start=-t.offset,
                                duration=self.duration,
                                channel=-1,
                            )
                        ],
                    ),
                )
                if idx == first_non_padding_idx
                else t
                for idx, t in enumerate(self.tracks)
            ]
        else:
            assert n_sups == 1, (
                f"Cannot expand more than one supervision (found {len(self.supervisions)})."
            )
            new_tracks = []
            for t in self.tracks:
                if t.mute:
                    new_tracks.append(t)
                    continue
                if len(t.cut.supervisions) == 0:
                    new_tracks.append(t)
                else:
                    sup = t.cut.supervisions[0]
                    if not shrink_ok and (sup.start < -t.offset or sup.end > self.duration):
                        raise ValueError(
                            f"Cannot shrink supervision (start={sup.start}, end={sup.end}) "
                            f"to cut (start=0, duration={t.cut.duration}) with "
                            f"shrink_ok=False."
                        )
                    new_tracks.append(
                        fastcopy(
                            t,
                            cut=fastcopy(
                                t.cut,
                                supervisions=[
                                    fastcopy(sup, start=-t.offset, duration=self.duration)
                                ],
                            ),
                        )
                    )
        return fastcopy(self, tracks=new_tracks)

    def map_supervisions(
        self, transform_fn: Callable[[SupervisionSegment], SupervisionSegment]
    ) -> Cut:
        new_mixed_cut = fastcopy(self)
        for track in new_mixed_cut.tracks:
            if isinstance(track.cut, PaddingCut) or track.mute:
                continue
            track.cut.supervisions = [
                segment.map(transform_fn) for segment in track.cut.supervisions
            ]
        return new_mixed_cut

    def merge_supervisions(
        self,
        merge_policy: str = "delimiter",
        custom_merge_fn: Optional[Callable[[str, Iterable[Any]], Any]] = None,
    ) -> "MixedCut":
        """Merge all supervisions into one spanning segment assigned to the
        first DataCut track."""
        merge_func_ = partial(
            merge_items_with_delimiter,
            delimiter="#",
            return_first=(merge_policy == "keep_first"),
        )
        if custom_merge_fn is not None:
            merge_custom = custom_merge_fn
        else:
            merge_custom = lambda k, vs: merge_func_(map(str, vs))

        sups = sorted(self.supervisions, key=lambda s: s.start)
        if len(sups) <= 1:
            return self
        mstart = sups[0].start
        mend = sups[-1].end
        mduration = add_durations(mend, -mstart, sampling_rate=self.sampling_rate)
        custom_keys = set(k for s in sups if s.custom is not None for k in s.custom.keys())
        alignment_keys = set(
            k for s in sups if s.alignment is not None for k in s.alignment.keys()
        )
        if any(overlaps(s1, s2) for s1, s2 in zip(sups, sups[1:])) and any(
            s.text is not None for s in sups
        ):
            warnings.warn(
                "You are merging overlapping supervisions with text transcripts; "
                f"the result may be unusable for ASR training (cut id: {self.id})."
            )
        msup = SupervisionSegment(
            id=merge_func_(s.id for s in sups),
            recording_id=merge_func_(s.recording_id for s in sups),
            start=mstart,
            duration=mduration,
            # -1 = no specific channel (supervisions may span different recordings).
            channel=-1,
            text=" ".join(s.text for s in sups if s.text),
            speaker=merge_func_(s.speaker for s in sups if s.speaker),
            language=merge_func_(s.language for s in sups if s.language),
            gender=merge_func_(s.gender for s in sups if s.gender),
            custom={
                k: merge_custom(
                    k, (s.custom[k] for s in sups if s.custom is not None and k in s.custom)
                )
                for k in custom_keys
            },
            alignment={
                k: reduce(
                    add,
                    (s.alignment[k] for s in sups if s.alignment is not None and k in s.alignment),
                )
                for k in alignment_keys
            },
        )
        new_cut = self.drop_supervisions()
        new_cut._first_non_padding_cut.supervisions = [msup]
        return new_cut

    def filter_supervisions(self, predicate: Callable[[SupervisionSegment], bool]) -> Cut:
        return fastcopy(
            self,
            tracks=[
                fastcopy(track, cut=track.cut.filter_supervisions(predicate))
                for track in self.tracks
            ],
        )

    @staticmethod
    def from_dict(data: dict) -> "MixedCut":
        data.pop("type", None)
        transforms = None
        if "transforms" in data:
            transforms = [AudioTransform.from_dict(t) for t in data["transforms"]]
        tracks = [MixTrack.from_dict(track) for track in data["tracks"]]
        if "snr_reference" in data:
            tracks.append(
                fastcopy(
                    MixTrack.from_dict(data["snr_reference"]),
                    is_snr_reference=True,
                    mute=True,
                )
            )
        return MixedCut(id=data["id"], tracks=tracks, transforms=transforms)

    def with_features_path_prefix(self, path: Pathlike) -> "MixedCut":
        if not self.has_features:
            return self
        return MixedCut(
            id=self.id,
            tracks=[fastcopy(t, cut=t.cut.with_features_path_prefix(path)) for t in self.tracks],
        )

    def with_recording_path_prefix(self, path: Pathlike) -> "MixedCut":
        if not self.has_recording:
            return self
        return MixedCut(
            id=self.id,
            tracks=[fastcopy(t, cut=t.cut.with_recording_path_prefix(path)) for t in self.tracks],
        )

    @property
    def first_non_padding_cut(self) -> DataCut:
        return self._first_non_padding_track.cut

    @property
    def first_non_padding_track(self) -> MixTrack:
        return _get_first_non_padding_track(self)

    @property
    def _first_non_padding_cut(self) -> DataCut:
        return self.first_non_padding_cut

    @property
    def _first_non_padding_track(self) -> MixTrack:
        return self.first_non_padding_track


def _get_audible_tracks(mixed_cut: "MixedCut") -> List[MixTrack]:
    tracks = [track for track in mixed_cut.tracks if not track.mute]
    return tracks if tracks else mixed_cut.tracks


def _get_first_non_padding_track(mixed_cut: "MixedCut") -> MixTrack:
    tracks = [
        track for track in _get_audible_tracks(mixed_cut) if not isinstance(track.cut, PaddingCut)
    ]
    if tracks:
        return tracks[0]
    return _get_audible_tracks(mixed_cut)[0]


def _get_snr_reference_track(mixed_cut: "MixedCut") -> Tuple[Optional[int], MixTrack]:
    for idx, track in enumerate(mixed_cut.tracks):
        if track.is_snr_reference:
            return idx, track
    for idx, track in enumerate(mixed_cut.tracks):
        if not isinstance(track.cut, PaddingCut) and track.snr is None:
            return idx, track
    raise ValueError(f"Cannot determine SNR reference track for MixedCut '{mixed_cut.id}'.")


def _ensure_explicit_snr_reference(tracks: List[MixTrack]) -> List[MixTrack]:
    if any(track.is_snr_reference for track in tracks):
        return tracks
    for idx, track in enumerate(tracks):
        if not isinstance(track.cut, PaddingCut) and track.snr is None:
            tracks[idx] = fastcopy(track, is_snr_reference=True)
            break
    return tracks


def _scale_audio_for_snr(
    audio: np.ndarray, snr: Optional[Decibels], reference_energy: Optional[float]
) -> np.ndarray:
    if snr is None or reference_energy is None or reference_energy <= 0.0:
        return audio
    added_audio_energy = audio_energy(audio)
    if added_audio_energy <= 0.0:
        return audio
    target_energy = reference_energy * (10.0 ** (-snr / 10))
    return np.sqrt(target_energy / added_audio_energy) * audio


def _scale_features_for_snr(
    features: np.ndarray,
    feature_extractor: FeatureExtractor,
    snr: Optional[Decibels],
    reference_energy: Optional[float],
) -> np.ndarray:
    if snr is None or reference_energy is None or reference_energy <= 0.0:
        return features
    added_features_energy = feature_extractor.compute_energy(features)
    if added_features_energy <= 0.0:
        return features
    target_energy = reference_energy * (10.0 ** (-snr / 10))
    return feature_extractor.scale(features, target_energy / added_features_energy)


def _make_padding_cut(mixed_cut: "MixedCut") -> PaddingCut:
    return PaddingCut(
        id=str(uuid4()),
        duration=mixed_cut.duration,
        sampling_rate=mixed_cut.sampling_rate,
        feat_value=LOG_EPSILON,
        num_frames=mixed_cut.num_frames if mixed_cut.has_features else None,
        num_features=mixed_cut.num_features if mixed_cut.has_features else None,
        frame_shift=mixed_cut.frame_shift if mixed_cut.has_features else None,
        num_samples=mixed_cut.num_samples if mixed_cut.has_recording else None,
        video=mixed_cut.video if mixed_cut.has_video else None,
    )


def _to_unmixed_cut(mixed_cut: "MixedCut", tracks: List[MixTrack]) -> Cut:
    if not tracks:
        return _make_padding_cut(mixed_cut)
    tracks = _ensure_explicit_snr_reference([fastcopy(track) for track in tracks])
    needs_reference = all(track.snr is not None for track in tracks)
    if needs_reference:
        _, reference_track = _get_snr_reference_track(mixed_cut)
        tracks.append(fastcopy(reference_track, is_snr_reference=True, mute=True))
    cut = MixedCut(id=str(uuid4()), tracks=tracks)
    if cut.duration < mixed_cut.duration:
        cut = cut.pad(duration=mixed_cut.duration, preserve_id=True)
    return cut
