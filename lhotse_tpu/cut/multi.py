"""
MultiCut: a cut over multiple channels of a recording.

Reference behavior: `/root/reference/lhotse/cut/multi.py` — per-channel
feature/audio loads (:87), ``from_mono`` merge (:403), ``to_mono``
(per-channel MonoCuts or downmix) (:435), per-channel-group supervision
merging (:239).
"""
from __future__ import annotations

import logging
import warnings
from dataclasses import dataclass, field
from functools import partial, reduce
from itertools import groupby
from operator import add
from typing import Any, Callable, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from lhotse_tpu.audio import Recording
from lhotse_tpu.cut.data import DataCut
from lhotse_tpu.features.base import Features
from lhotse_tpu.supervision import SupervisionSegment
from lhotse_tpu.utils import (
    add_durations,
    fastcopy,
    hash_str_to_int,
    is_equal_or_contains,
    merge_items_with_delimiter,
    overlaps,
    rich_exception_info,
    to_list,
    uuid4,
)


@dataclass
class MultiCut(DataCut):
    """
    A multi-channel cut (e.g. a microphone-array segment): the Recording has
    multiple channels and supervisions may be tied to any subset of them. The
    cut's channels may be a subset of the Recording's and must be a superset
    of the supervisions'.
    """

    channel: List[int] = field(default_factory=list)

    @property
    def num_channels(self) -> int:
        return len(to_list(self.channel))

    @rich_exception_info
    def load_features(self, channel: Optional[Union[int, List[int]]] = None) -> Optional[np.ndarray]:
        """Load features for this cut's span (optionally a channel subset),
        forgiving off-by-one frame mismatches."""
        if self.has_features:
            feats = self.features.load(
                start=self.start,
                duration=self.duration,
                channel_id=self.channel if channel is None else channel,
            )
            if feats.shape[0] - self.num_frames == 1:
                feats = feats[: self.num_frames, ...]
            elif feats.shape[0] - self.num_frames == -1:
                feats = np.concatenate((feats, feats[-1:, ...]), axis=0)
            return feats
        return None

    @rich_exception_info
    def load_audio(self, channel: Optional[Union[int, List[int]]] = None) -> Optional[np.ndarray]:
        """Load audio: shape (C, N)."""
        if self.has_recording:
            return self.recording.load_audio(
                channels=self.channel if channel is None else channel,
                offset=self.start,
                duration=self.duration,
            )
        return None

    @rich_exception_info
    def load_video(
        self, channel: Optional[Union[int, List[int]]] = None, with_audio: bool = True
    ):
        if self.has_video:
            return self.recording.load_video(
                channels=self.channel if channel is None else channel,
                offset=self.start,
                duration=self.duration,
                with_audio=with_audio,
            )
        return None

    def reverb_rir(
        self,
        rir_recording: Optional[Union[Recording, DataCut]] = None,
        normalize_output: bool = True,
        early_only: bool = False,
        affix_id: bool = True,
        rir_channels: Sequence[int] = (0,),
        room_rng_seed: Optional[int] = None,
        source_rng_seed: Optional[int] = None,
    ) -> "MultiCut":
        """Lazy reverberation; synthetic RIRs are supported only for
        single-channel MultiCuts."""
        assert self.has_recording, "Cannot apply reverberation on a MultiCut without Recording."
        if self.has_features:
            logging.warning(
                "Reverberating a MultiCut with pre-computed features: the feature "
                "manifest will be detached."
            )
            self.features = None
        if rir_recording is None:
            assert self.num_channels == 1, (
                "Reverberation simulation for multi-channel recordings is not "
                "supported; provide an impulse response."
            )
            if room_rng_seed is None:
                room_rng_seed = hash_str_to_int(str(uuid4()) + self.id, max_value=2**31)
            if source_rng_seed is None:
                source_rng_seed = room_rng_seed
        else:
            assert all(
                c < rir_recording.num_channels for c in rir_channels
            ), "Invalid channel index in `rir_channels`."
        recording_rvb = self.recording.reverb_rir(
            rir_recording=rir_recording,
            normalize_output=normalize_output,
            early_only=early_only,
            affix_id=affix_id,
            rir_channels=rir_channels,
            room_rng_seed=room_rng_seed,
            source_rng_seed=source_rng_seed,
        )
        supervisions_rvb = [s.reverb_rir(affix_id=affix_id) for s in self.supervisions]
        return fastcopy(
            self,
            id=f"{self.id}_rvb" if affix_id else self.id,
            recording=recording_rvb,
            supervisions=supervisions_rvb,
        )

    def merge_supervisions(
        self,
        merge_policy: str = "delimiter",
        merge_channels: bool = True,
        custom_merge_fn: Optional[Callable[[str, Iterable[Any]], Any]] = None,
    ) -> "MultiCut":
        """
        Merge supervisions into one segment (channel = union of channels), or
        one per channel group when ``merge_channels=False``.
        """
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

        if merge_channels:
            all_channels = set()
            for s in sups:
                all_channels.update(set(to_list(s.channel)))
            sups_by_channel = {tuple(sorted(all_channels)): sups}
        else:
            sups_by_channel = {
                tuple(to_list(c)): list(csups)
                for c, csups in groupby(
                    sorted(sups, key=lambda s: to_list(s.channel)),
                    key=lambda s: s.channel,
                )
            }

        msups = []
        text_overlap_warning = False
        for channel, csups in sups_by_channel.items():
            mstart = csups[0].start
            mend = max(s.end for s in csups)
            mduration = add_durations(mend, -mstart, sampling_rate=self.sampling_rate)
            custom_keys = set(k for s in csups if s.custom is not None for k in s.custom.keys())
            alignment_keys = set(
                k for s in csups if s.alignment is not None for k in s.alignment.keys()
            )
            if (
                any(overlaps(s1, s2) for s1, s2 in zip(csups, csups[1:]))
                and any(s.text is not None for s in csups)
                and not text_overlap_warning
            ):
                warnings.warn(
                    "You are merging overlapping supervisions with text transcripts; "
                    f"the result may be unusable for ASR training (cut id: {self.id})."
                )
                text_overlap_warning = True
            msups.append(
                SupervisionSegment(
                    id=merge_func_(s.id for s in csups),
                    recording_id=csups[0].recording_id,
                    start=mstart,
                    duration=mduration,
                    channel=list(channel),
                    text=" ".join(s.text for s in csups if s.text),
                    speaker=merge_func_(s.speaker for s in csups if s.speaker),
                    language=merge_func_(s.language for s in csups if s.language),
                    gender=merge_func_(s.gender for s in csups if s.gender),
                    custom={
                        k: merge_custom(
                            k,
                            (s.custom[k] for s in csups if s.custom is not None and k in s.custom),
                        )
                        for k in custom_keys
                    },
                    alignment={
                        k: reduce(
                            add,
                            (
                                s.alignment[k]
                                for s in csups
                                if s.alignment is not None and k in s.alignment
                            ),
                        )
                        for k in alignment_keys
                    },
                )
            )
        return fastcopy(self, supervisions=msups)

    def with_channels(self, channels: Union[List[int], int]) -> DataCut:
        """Select a subset of channels: MonoCut for one, MultiCut otherwise."""
        channel_is_int = isinstance(channels, int)
        assert set([channels] if channel_is_int else channels).issubset(
            set(self.recording.channel_ids)
        ), f"Cannot select {channels=}: not a subset of {self.recording.channel_ids=}"
        mono = channel_is_int or len(channels) == 1
        if mono:
            from lhotse_tpu.cut.mono import MonoCut

            if not channel_is_int:
                (channels,) = channels
            return MonoCut(
                id=f"{self.id}-{channels}",
                recording=self.recording,
                start=self.start,
                duration=self.duration,
                channel=channels,
                supervisions=[
                    fastcopy(s, channel=channels)
                    for s in self.supervisions
                    if is_equal_or_contains(s.channel, channels)
                ],
                custom=self.custom,
            )
        return fastcopy(self, channel=channels)

    @staticmethod
    def from_mono(*cuts: DataCut) -> "MultiCut":
        """
        Merge one or more MonoCuts (matching in everything but channel, each
        with a distinct channel) into a MultiCut.
        """
        from lhotse_tpu.cut.mono import MonoCut

        assert all(isinstance(c, MonoCut) for c in cuts), "All cuts must be MonoCuts"
        assert (
            sum(1 for _ in groupby(cuts, key=lambda c: (c.recording_id, c.start, c.end))) == 1
        ), "Cuts must match in all fields except channel"
        assert len(set(c.channel for c in cuts)) == len(cuts), (
            "All cuts must have a distinct channel"
        )
        first = cuts[0]
        return MultiCut(
            id=first.id,
            start=first.start,
            duration=first.duration,
            channel=sorted(c.channel for c in cuts),
            supervisions=[s for c in cuts for s in c.supervisions],
            features=first.features,
            recording=first.recording,
            custom=first.custom,
        )

    def to_mono(self, mono_downmix: bool = False) -> Union["DataCut", List["DataCut"]]:
        """One MonoCut per channel, or a single downmixed cut when
        ``mono_downmix=True``."""
        from lhotse_tpu.cut.mixed import MixedCut, MixTrack
        from lhotse_tpu.cut.mono import MonoCut

        mono_cuts = [
            MonoCut(
                id=f"{self.id}-{channel}",
                recording=self.recording,
                start=self.start,
                duration=self.duration,
                channel=channel,
                supervisions=[
                    fastcopy(s, channel=channel)
                    for s in self.supervisions
                    if is_equal_or_contains(s.channel, channel)
                ],
                custom=self.custom,
            )
            for channel in to_list(self.channel)
        ]
        if not mono_downmix:
            return mono_cuts
        mixed_cut = MixedCut(
            id=self.id,
            tracks=[MixTrack(cut=mono_cut, offset=0.0, snr=None) for mono_cut in mono_cuts],
        )
        return mixed_cut.to_mono()

    @staticmethod
    def from_dict(data: dict) -> "MultiCut":
        from lhotse_tpu.serialization import deserialize_custom_field

        data.pop("type", None)
        features = Features.from_dict(data.pop("features")) if "features" in data else None
        recording = Recording.from_dict(data.pop("recording")) if "recording" in data else None
        supervision_infos = data.pop("supervisions") if "supervisions" in data else []
        if "custom" in data:
            deserialize_custom_field(data["custom"])
        return MultiCut(
            **data,
            features=features,
            recording=recording,
            supervisions=[SupervisionSegment.from_dict(s) for s in supervision_infos],
        )
