"""
Recording: metadata for a single recording session with lazy transform chain.

Reference behavior: `/root/reference/lhotse/audio/recording.py:48` —
``load_audio`` with channel selection / offset / duration and **reverse
timestamp propagation** over the transform chain (recording.py:438-444) so
only the needed samples are read from the source; lazy augmentation builders
(perturb_speed/tempo/volume, resample, reverb_rir, narrowband,
normalize_loudness, dereverb_wpe, clip_amplitude, compress,
recording.py:701-1015); duration-mismatch fixup
(``assert_and_maybe_fix_num_samples``, recording.py:1032).
"""
from __future__ import annotations

from dataclasses import dataclass
from decimal import ROUND_HALF_UP
from io import BytesIO
from math import ceil, isclose
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from lhotse_tpu.audio.backend import get_current_audio_backend, info, save_audio
from lhotse_tpu.audio.source import AudioSource
from lhotse_tpu.audio.utils import (
    AudioLoadingError,
    DurationMismatchError,
    VideoInfo,
    get_audio_duration_mismatch_tolerance,
)
from lhotse_tpu.augmentation import (
    AudioTransform,
    Clipping,
    Compress,
    DereverbWPE,
    LoudnessNormalization,
    Narrowband,
    Resample,
    ReverbWithImpulseResponse,
    Speed,
    Tempo,
    Volume,
)
from lhotse_tpu.utils import (
    Channels,
    Pathlike,
    Seconds,
    asdict_nonull,
    compute_num_samples,
    fastcopy,
    ifnone,
    perturb_num_samples,
    rich_exception_info,
)


class SetContainingAnything:
    def __contains__(self, item):
        return True

    def intersection(self, iterable):
        return True


@dataclass
class Recording:
    """
    The ``Recording`` manifest describes one recording: its path(s), duration,
    number of samples, channels, and an optional list of lazily-applied
    transforms. It can represent a single utterance or an hour-long
    multi-channel session (partitioned for training via Cuts).
    """

    id: str
    sources: List[AudioSource]
    sampling_rate: int
    num_samples: int
    duration: Seconds
    channel_ids: Optional[List[int]] = None
    transforms: Optional[List[Union[AudioTransform, Dict]]] = None

    def __post_init__(self):
        if self.channel_ids is None:
            self.channel_ids = sorted(
                cid for source in self.sources for cid in source.channels
            )
        assert (
            sum(source.has_video for source in self.sources) < 2
        ), "More than one video stream per recording is not supported."

    @property
    def video(self) -> Optional[VideoInfo]:
        s = self._video_source
        return s.video if s is not None else None

    @property
    def has_video(self) -> bool:
        return self._video_source is not None

    @property
    def _video_source(self) -> Optional[AudioSource]:
        for s in self.sources:
            if s.has_video:
                return s
        return None

    @property
    def is_in_memory(self) -> bool:
        return any(s.type == "memory" for s in self.sources)

    @property
    def is_placeholder(self) -> bool:
        return any(s.type == "shar" for s in self.sources)

    @property
    def num_channels(self) -> int:
        return len(self.channel_ids)

    @property
    def source_format(self) -> str:
        source_formats = list(set(s.format for s in self.sources))
        if len(source_formats) == 1:
            return source_formats[0]
        raise NotImplementedError(
            "Sources have different formats; resolving to a single format is not implemented."
        )

    @staticmethod
    def from_file(
        path: Pathlike,
        recording_id: Optional[Union[str, Callable[[Path], str]]] = None,
        relative_path_depth: Optional[int] = None,
        force_opus_sampling_rate: Optional[int] = None,
        force_read_audio: bool = False,
    ) -> "Recording":
        """
        Read an audio file's header and create the corresponding ``Recording``
        (reference: recording.py:191).
        """
        path = Path(path)
        recording_id = (
            path.stem
            if recording_id is None
            else recording_id(path)
            if callable(recording_id)
            else recording_id
        )
        audio_info = info(
            path,
            force_opus_sampling_rate=force_opus_sampling_rate,
            force_read_audio=force_read_audio,
        )
        if audio_info.video is not None:
            duration = audio_info.video.duration
            num_samples = compute_num_samples(duration, audio_info.samplerate)
        else:
            duration = audio_info.duration
            num_samples = audio_info.frames
        return Recording(
            id=recording_id,
            sampling_rate=audio_info.samplerate,
            num_samples=num_samples,
            duration=duration,
            sources=[
                AudioSource(
                    type="file",
                    channels=list(range(audio_info.channels)),
                    source=(
                        "/".join(path.parts[-relative_path_depth:])
                        if relative_path_depth is not None and relative_path_depth > 0
                        else str(path)
                    ),
                    video=audio_info.video,
                )
            ],
        )

    @staticmethod
    def from_bytes(data: bytes, recording_id: str) -> "Recording":
        """
        Like :meth:`from_file` but for a byte string with encoded audio; the
        bytes are attached to the manifest (reference: recording.py:259).
        """
        stream = BytesIO(data)
        audio_info = get_current_audio_backend().info(stream)
        return Recording(
            id=recording_id,
            sampling_rate=audio_info.samplerate,
            num_samples=audio_info.frames,
            duration=audio_info.duration,
            sources=[
                AudioSource(
                    type="memory",
                    channels=list(range(audio_info.channels)),
                    source=data,
                )
            ],
        )

    def move_to_memory(
        self,
        channels: Optional[Channels] = None,
        offset: Seconds = None,
        duration: Optional[Seconds] = None,
        format: Optional[str] = None,
    ) -> "Recording":
        """
        Read audio data and return a copy of the manifest with binary data
        attached (reference: recording.py:298). With no arguments the raw
        encoded bytes are attached as-is; otherwise audio is decoded, subset,
        and re-encoded (default format: wav).
        """
        if all(src.type == "memory" for src in self.sources):
            return self

        def _aslist(x):
            return [x] if isinstance(x, int) else x

        if all(opt is None for opt in (channels, offset, duration)) or (
            (channels is None or _aslist(channels) == self.channel_ids)
            and (offset is None or isclose(offset, 0.0))
            and (duration is None or isclose(duration, self.duration))
        ):
            memory_sources = [
                AudioSource(
                    type="memory",
                    channels=old_source.channels,
                    source=open(old_source.source, "rb").read(),
                )
                for old_source in self.sources
            ]
            return fastcopy(self, sources=memory_sources)

        audio = self.load_audio(
            channels=channels, offset=ifnone(offset, 0), duration=duration
        )
        stream = BytesIO()
        save_audio(stream, audio, self.sampling_rate, format=ifnone(format, "wav"))
        channels = ifnone(channels, self.channel_ids)
        if isinstance(channels, int):
            channels = [channels]
        return Recording(
            id=self.id,
            sources=[
                AudioSource(type="memory", channels=channels, source=stream.getvalue())
            ],
            sampling_rate=self.sampling_rate,
            num_samples=audio.shape[1],
            duration=ifnone(duration, self.duration),
        )

    def to_dict(self) -> dict:
        d = asdict_nonull(self)
        if self.transforms is not None:
            d["transforms"] = [
                t if isinstance(t, dict) else t.to_dict() for t in self.transforms
            ]
        return d

    def to_cut(self):
        """Create a MonoCut or MultiCut spanning this whole recording."""
        from lhotse_tpu.cut import MonoCut, MultiCut

        cls = MonoCut if self.num_channels == 1 else MultiCut
        return cls(
            id=self.id,
            start=0.0,
            duration=self.duration,
            channel=self.channel_ids[0] if self.num_channels == 1 else self.channel_ids,
            recording=self,
        )

    @rich_exception_info
    def load_audio(
        self,
        channels: Optional[Channels] = None,
        offset: Seconds = 0.0,
        duration: Optional[Seconds] = None,
    ) -> np.ndarray:
        """
        Read audio samples from the underlying source, running the lazy
        transform chain with reverse timestamp propagation
        (reference: recording.py:390-492).

        :return: float32 array of shape ``(num_channels, num_samples)``.
        """
        assert offset <= self.duration, (
            f"Cannot load audio because the Recording's duration {self.duration}s "
            f"is smaller than the requested offset {offset}s."
        )

        # If duration is very close to the full recording, read everything.
        orig_duration = duration
        if duration is not None and isclose(duration, self.duration, abs_tol=1e-3):
            duration = None

        if channels is None:
            channels = SetContainingAnything()
        else:
            channels = frozenset([channels] if isinstance(channels, int) else channels)
            recording_channels = frozenset(self.channel_ids)
            assert channels.issubset(recording_channels), (
                "Requested to load audio from a channel that does not exist in the "
                f"recording: (recording channels: {recording_channels} -- "
                f"requested channels: {channels})"
            )

        transforms = [
            tnfm if isinstance(tnfm, AudioTransform) else AudioTransform.from_dict(tnfm)
            for tnfm in self.transforms or []
        ]

        # Backward pass over transforms to find the source read window.
        offset_aug, duration_aug = offset, duration
        for tfn in reversed(transforms):
            offset_aug, duration_aug = tfn.reverse_timestamps(
                offset=offset_aug,
                duration=duration_aug,
                sampling_rate=self.sampling_rate,
            )

        samples_per_source = []
        for source in self.sources:
            if not channels.intersection(source.channels):
                continue
            samples = source.load_audio(
                offset=offset_aug,
                duration=duration_aug,
                force_opus_sampling_rate=self.sampling_rate,
            )
            channels_to_remove = [
                idx for idx, cid in enumerate(source.channels) if cid not in channels
            ]
            if channels_to_remove:
                samples = np.delete(samples, channels_to_remove, axis=0)
            samples_per_source.append(samples)

        audio = self._stack_audio_channels(samples_per_source)

        for tfn in transforms:
            audio = tfn(audio, self.sampling_rate)

        if self.has_video:
            audio = assert_and_maybe_fix_num_samples(
                audio,
                offset=offset,
                duration=orig_duration,
                recording=self,
                tolerance=1e6,
                pad_mode="constant",
            )
        else:
            audio = assert_and_maybe_fix_num_samples(
                audio, offset=offset, duration=orig_duration, recording=self
            )

        return audio

    @rich_exception_info
    def load_video(
        self,
        channels: Optional[Channels] = None,
        offset: Seconds = 0.0,
        duration: Optional[Seconds] = None,
        with_audio: bool = True,
        force_consistent_duration: bool = True,
    ):
        """
        Load video frames (and audio) from this recording; returns
        ``(video(T,C,H,W) uint8 ndarray, audio or None)``.
        """
        assert self.has_video, f"Recording {self.id} has no video to load."
        vsrc = self._video_source
        video, _ = vsrc.load_video(offset=offset, duration=duration, with_audio=False)
        audio = None
        if with_audio:
            audio = self.load_audio(channels=channels, offset=offset, duration=duration)
        return video, audio

    def _stack_audio_channels(self, samples_per_source: List[np.ndarray]) -> np.ndarray:
        """Pad channels to a common length within tolerance and stack
        (reference: recording.py:640-676)."""
        allowed_diff = int(
            compute_num_samples(
                get_audio_duration_mismatch_tolerance(),
                sampling_rate=self.sampling_rate,
            )
        )
        if len(samples_per_source) > 1:
            samples_per_source = [
                s[None, :] if s.ndim == 1 else s for s in samples_per_source
            ]
            max_samples = max(s.shape[1] for s in samples_per_source)
            for i, s in enumerate(samples_per_source):
                if max_samples - s.shape[1] <= allowed_diff:
                    samples_per_source[i] = np.pad(
                        s, ((0, 0), (0, max_samples - s.shape[1])), "constant"
                    )
                else:
                    raise DurationMismatchError(
                        f"The mismatch between the number of samples in the different "
                        f"channels of recording {self.id} exceeds the allowed tolerance "
                        f"{get_audio_duration_mismatch_tolerance()}."
                    )
            audio = np.concatenate(samples_per_source, axis=0)
        else:
            audio = np.vstack(samples_per_source)
        return audio

    def _expected_num_samples(self, offset: Seconds, duration: Optional[Seconds]) -> int:
        if offset == 0 and duration is None:
            return self.num_samples
        duration = duration if duration is not None else self.duration - offset
        return compute_num_samples(duration, sampling_rate=self.sampling_rate)

    def with_path_prefix(self, path: Pathlike) -> "Recording":
        return fastcopy(self, sources=[s.with_path_prefix(path) for s in self.sources])

    def copy_with(self, **kwargs) -> "Recording":
        return fastcopy(self, **kwargs)

    def with_video_resolution(self, width: int, height: int) -> "Recording":
        return fastcopy(
            self,
            sources=[
                s.with_video_resolution(width=width, height=height) for s in self.sources
            ],
        )

    def perturb_speed(self, factor: float, affix_id: bool = True) -> "Recording":
        """Lazy speed perturbation: updates num_samples/duration
        (reference: recording.py:701)."""
        transforms = self.transforms.copy() if self.transforms is not None else []
        transforms.append(Speed(factor=factor))
        new_num_samples = perturb_num_samples(self.num_samples, factor)
        new_duration = new_num_samples / self.sampling_rate
        return fastcopy(
            self,
            id=f"{self.id}_sp{factor}" if affix_id else self.id,
            num_samples=new_num_samples,
            duration=new_duration,
            transforms=transforms,
        )

    def perturb_tempo(self, factor: float, affix_id: bool = True) -> "Recording":
        """Lazy tempo perturbation (pitch-preserving)."""
        transforms = self.transforms.copy() if self.transforms is not None else []
        transforms.append(Tempo(factor=factor))
        new_num_samples = perturb_num_samples(self.num_samples, factor)
        new_duration = new_num_samples / self.sampling_rate
        return fastcopy(
            self,
            id=f"{self.id}_tp{factor}" if affix_id else self.id,
            num_samples=new_num_samples,
            duration=new_duration,
            transforms=transforms,
        )

    def perturb_volume(self, factor: float, affix_id: bool = True) -> "Recording":
        """Lazy volume perturbation."""
        transforms = self.transforms.copy() if self.transforms is not None else []
        transforms.append(Volume(factor=factor))
        return fastcopy(
            self,
            id=f"{self.id}_vp{factor}" if affix_id else self.id,
            transforms=transforms,
        )

    def narrowband(
        self, codec: str, restore_orig_sr: bool = True, affix_id: bool = True
    ) -> "Recording":
        """Lazy narrowband (telephone codec) effect."""
        transforms = self.transforms.copy() if self.transforms is not None else []
        transforms.append(
            Narrowband(
                codec=codec,
                source_sampling_rate=self.sampling_rate,
                restore_orig_sr=restore_orig_sr,
            ).to_dict()
        )
        new_num_samples = compute_num_samples(
            self.duration,
            self.sampling_rate if restore_orig_sr else 8000,
            rounding=ROUND_HALF_UP,
        )
        return fastcopy(
            self,
            id=f"{self.id}_nb_{codec}" if affix_id else self.id,
            num_samples=new_num_samples,
            sampling_rate=self.sampling_rate if restore_orig_sr else 8000,
            transforms=transforms,
        )

    def normalize_loudness(self, target: float, affix_id: bool = False) -> "Recording":
        """Lazy loudness normalization to ``target`` dB LUFS."""
        transforms = self.transforms.copy() if self.transforms is not None else []
        transforms.append(LoudnessNormalization(target=target))
        return fastcopy(
            self,
            id=f"{self.id}_ln{target}" if affix_id else self.id,
            transforms=transforms,
        )

    def dereverb_wpe(self, affix_id: bool = True) -> "Recording":
        """Lazy WPE dereverberation."""
        transforms = self.transforms.copy() if self.transforms is not None else []
        transforms.append(DereverbWPE())
        return fastcopy(
            self,
            id=f"{self.id}_wpe" if affix_id else self.id,
            transforms=transforms,
        )

    def reverb_rir(
        self,
        rir_recording: Optional["Recording"] = None,
        normalize_output: bool = True,
        early_only: bool = False,
        affix_id: bool = True,
        rir_channels: Optional[Sequence[int]] = None,
        room_rng_seed: Optional[int] = None,
        source_rng_seed: Optional[int] = None,
    ) -> "Recording":
        """
        Lazy reverberation with a provided or synthetic (FRA-RIR) impulse
        response (reference: recording.py:821-920). Channel-count semantics:
        a mono input with a multi-channel RIR yields multi-channel output.
        """
        if rir_recording is not None:
            assert rir_recording.sampling_rate == self.sampling_rate, (
                f"Sampling rate mismatch between RIR vs recording: "
                f"{rir_recording.sampling_rate} vs {self.sampling_rate}."
            )
        if self.num_channels > 1 or rir_channels is None or len(rir_channels) == 1:
            new_channel_ids = self.channel_ids
        else:
            new_channel_ids = list(range(len(rir_channels)))

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
            self,
            id=f"{self.id}_rvb" if affix_id else self.id,
            channel_ids=new_channel_ids,
            transforms=transforms,
        )

    def resample(self, sampling_rate: int) -> "Recording":
        """Lazy resampling to a new sampling rate."""
        if sampling_rate == self.sampling_rate:
            return fastcopy(self)
        transforms = self.transforms.copy() if self.transforms is not None else []
        transforms.append(
            Resample(
                source_sampling_rate=self.sampling_rate,
                target_sampling_rate=sampling_rate,
            )
        )
        new_num_samples = compute_num_samples(
            self.duration, sampling_rate, rounding=ROUND_HALF_UP
        )
        new_duration = new_num_samples / sampling_rate
        return fastcopy(
            self,
            duration=new_duration,
            num_samples=new_num_samples,
            sampling_rate=sampling_rate,
            transforms=transforms,
        )

    def clip_amplitude(
        self,
        hard: bool = False,
        gain_db: float = 0.0,
        normalize: bool = True,
        oversampling: Optional[int] = 4,
        affix_id: bool = False,
    ) -> "Recording":
        """Lazy clipping effect with optional oversampling (reference: recording.py:937)."""
        transforms = self.transforms.copy() if self.transforms is not None else []
        if oversampling is not None:
            transforms.append(
                Resample(
                    source_sampling_rate=self.sampling_rate,
                    target_sampling_rate=self.sampling_rate * oversampling,
                )
            )
        transforms.append(Clipping(hard, gain_db, normalize))
        if oversampling is not None:
            transforms.append(
                Resample(
                    source_sampling_rate=self.sampling_rate * oversampling,
                    target_sampling_rate=self.sampling_rate,
                )
            )
        return fastcopy(
            self,
            id=f"{self.id}_cl{gain_db:.1f}" if affix_id else self.id,
            transforms=transforms,
        )

    def compress(self, codec: str = "opus", compression_level: float = 0.99) -> "Recording":
        """Lazy lossy-codec compression effect."""
        if codec not in Compress.supported_codecs:
            raise ValueError(
                f"Invalid codec: {codec}. Must be one of: {', '.join(Compress.supported_codecs)}"
            )
        if not 0.0 <= compression_level <= 1.0:
            raise ValueError(
                f"Compression level must be between 0.0 and 1.0, got {compression_level}"
            )
        transforms = self.transforms.copy() if self.transforms is not None else []
        if codec == "gsm" and self.sampling_rate != 8000:
            transforms.append(
                Resample(source_sampling_rate=self.sampling_rate, target_sampling_rate=8000)
            )
            transforms.append(Compress(codec=codec, compression_level=compression_level))
            transforms.append(
                Resample(source_sampling_rate=8000, target_sampling_rate=self.sampling_rate)
            )
        else:
            transforms.append(Compress(codec=codec, compression_level=compression_level))
        return fastcopy(self, transforms=transforms)

    @staticmethod
    def from_dict(data: dict) -> "Recording":
        raw_sources = data.pop("sources")
        try:
            transforms = data.pop("transforms")
            transforms = [AudioTransform.from_dict(t) for t in transforms]
        except KeyError:
            transforms = None
        return Recording(
            sources=[AudioSource.from_dict(s) for s in raw_sources],
            transforms=transforms,
            **data,
        )


def assert_and_maybe_fix_num_samples(
    audio: np.ndarray,
    offset: Seconds,
    duration: Optional[Seconds],
    recording: Recording,
    tolerance: Optional[Seconds] = None,
    pad_mode: str = "reflect",
) -> np.ndarray:
    """
    Transformation chains can introduce small sample-count mismatches; fix
    them within tolerance or raise (reference: recording.py:1032).
    """
    if tolerance is None:
        tolerance = get_audio_duration_mismatch_tolerance()
    expected_num_samples = compute_num_samples(
        duration=duration if duration is not None else recording.duration - offset,
        sampling_rate=recording.sampling_rate,
    )
    diff = expected_num_samples - audio.shape[1]
    if diff == 0:
        return audio
    allowed_diff = int(ceil(tolerance * recording.sampling_rate))
    if 0 < diff <= allowed_diff:
        return np.pad(audio, ((0, 0), (0, diff)), mode=pad_mode)
    elif -allowed_diff <= diff < 0:
        return audio[:, :diff]
    else:
        raise AudioLoadingError(
            "The number of declared samples in the recording diverged from the one "
            f"obtained when loading audio (offset={offset}, duration={duration}). "
            f"diff={diff}, audio.shape={audio.shape}, recording={recording}"
        )
