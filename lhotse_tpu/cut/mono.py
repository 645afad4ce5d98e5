"""
MonoCut: a single-channel concrete cut.

Reference behavior: `/root/reference/lhotse/cut/mono.py` — ``load_audio``
slices [start, start+duration] with channel selection (:69), RIR with channel
fan-out returning a MultiCut for multi-channel RIRs (:151),
``merge_supervisions`` (:269).
"""
from __future__ import annotations

import logging
import warnings
from dataclasses import dataclass
from functools import partial, reduce
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
    uuid4,
)


@dataclass
class MonoCut(DataCut):
    """A Cut of a single channel of a Recording — the most common cut type."""

    channel: int = 0

    @property
    def num_channels(self) -> int:
        return 1

    @rich_exception_info
    def load_features(self) -> Optional[np.ndarray]:
        """Load features trimmed to this cut's [start, start+duration] span,
        forgiving off-by-one frame count mismatches."""
        if self.has_features:
            feats = self.features.load(start=self.start, duration=self.duration)
            if feats.shape[0] - self.num_frames == 1:
                feats = feats[: self.num_frames, :]
            elif feats.shape[0] - self.num_frames == -1:
                feats = np.concatenate((feats, feats[-1:, :]), axis=0)
            return feats
        return None

    @rich_exception_info
    def load_audio(self) -> Optional[np.ndarray]:
        """Load this cut's audio span: shape (1, num_samples)."""
        if self.has_recording:
            return self.recording.load_audio(
                channels=self.channel,
                offset=self.start,
                duration=self.duration,
            )
        return None

    @rich_exception_info
    def load_video(self, with_audio: bool = True):
        if self.has_video:
            return self.recording.load_video(
                channels=self.channel,
                offset=self.start,
                duration=self.duration,
                with_audio=with_audio,
            )
        return None

    def with_channels(self, channels: Union[List[int], int]) -> DataCut:
        """Select channels available in the underlying Recording; returns
        MonoCut for one channel, MultiCut otherwise."""
        channel_is_int = isinstance(channels, int)
        assert set([channels] if channel_is_int else channels).issubset(
            set(self.recording.channel_ids)
        ), f"Cannot select {channels=}: not a subset of {self.recording.channel_ids=}"
        mono = channel_is_int or len(channels) == 1
        if mono:
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
        from lhotse_tpu.cut.multi import MultiCut

        return MultiCut(
            id=f"{self.id}-{len(channels)}chan",
            recording=self.recording,
            start=self.start,
            duration=self.duration,
            channel=channels,
            supervisions=[
                s for s in self.supervisions if is_equal_or_contains(channels, s.channel)
            ],
            custom=self.custom,
        )

    def reverb_rir(
        self,
        rir_recording: Optional[Union[Recording, DataCut]] = None,
        normalize_output: bool = True,
        early_only: bool = False,
        affix_id: bool = True,
        rir_channels: Sequence[int] = (0,),
        room_rng_seed: Optional[int] = None,
        source_rng_seed: Optional[int] = None,
    ) -> DataCut:
        """
        Lazy reverberation: mono RIR (or a synthetic FRA-RIR) keeps a MonoCut;
        multi-channel RIR selections return a MultiCut with fanned-out channels.
        """
        assert self.has_recording, "Cannot apply reverberation on a MonoCut without Recording."
        if self.has_features:
            logging.warning(
                "Reverberating a MonoCut with pre-computed features: the feature "
                "manifest will be detached."
            )
            self.features = None
        assert rir_recording is None or all(
            c < rir_recording.num_channels for c in rir_channels
        ), "Invalid channel index in `rir_channels`."

        if rir_recording is None:
            rir_channels = [0]
            if room_rng_seed is None:
                room_rng_seed = hash_str_to_int(str(uuid4()) + self.id, max_value=2**31)
            if source_rng_seed is None:
                source_rng_seed = room_rng_seed

        if len(rir_channels) == 1:
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
        else:
            from lhotse_tpu.cut.multi import MultiCut

            channels = list(range(len(rir_channels)))
            recording_rvb = self.recording.reverb_rir(
                rir_recording=rir_recording,
                normalize_output=normalize_output,
                early_only=early_only,
                affix_id=affix_id,
                rir_channels=rir_channels,
                room_rng_seed=room_rng_seed,
                source_rng_seed=source_rng_seed,
            )
            supervisions_rvb = [
                s.reverb_rir(affix_id=affix_id, channel=channels) for s in self.supervisions
            ]
            return fastcopy(
                MultiCut.from_mono(self),
                recording=recording_rvb,
                supervisions=supervisions_rvb,
                channel=channels,
            )

    def merge_supervisions(
        self,
        merge_policy: str = "delimiter",
        custom_merge_fn: Optional[Callable[[str, Iterable[Any]], Any]] = None,
    ) -> "MonoCut":
        """
        Merge all supervisions into one spanning segment; texts joined with
        whitespace, other string fields joined with "#" (or first kept, per
        ``merge_policy``); alignments concatenated.
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
            recording_id=sups[0].recording_id,
            start=mstart,
            duration=mduration,
            channel=sups[0].channel,
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
        return fastcopy(self, supervisions=[msup])

    @staticmethod
    def from_dict(data: dict) -> "MonoCut":
        from lhotse_tpu.serialization import deserialize_custom_field

        data.pop("type", None)
        features = Features.from_dict(data.pop("features")) if "features" in data else None
        recording = Recording.from_dict(data.pop("recording")) if "recording" in data else None
        supervision_infos = data.pop("supervisions") if "supervisions" in data else []
        if "custom" in data:
            deserialize_custom_field(data["custom"])
        return MonoCut(
            **data,
            features=features,
            recording=recording,
            supervisions=[SupervisionSegment.from_dict(s) for s in supervision_infos],
        )
