"""
SupervisionSegment / SupervisionSet: segment-level annotations.

Reference behavior: `/root/reference/lhotse/supervision.py` —
``AlignmentItem`` (:40), ``SupervisionSegment`` (:121) with trim/with_offset/
perturb mirrors (:236-368), ``SupervisionSet`` (:475) with cached
``find()`` temporal search (:813,854), RTTM import (:551), CTM import/export
(:616,689).
"""
from __future__ import annotations

import logging
from collections import defaultdict
from dataclasses import dataclass
from itertools import groupby, islice
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, NamedTuple, Optional, Union

from lhotse_tpu.custom import CustomFieldMixin
from lhotse_tpu.lazy import AlgorithmMixin
from lhotse_tpu.serialization import Serializable
from lhotse_tpu.utils import (
    Pathlike,
    Seconds,
    TimeSpan,
    add_durations,
    asdict_nonull,
    compute_num_samples,
    exactly_one_not_null,
    fastcopy,
    ifnone,
    is_equal_or_contains,
    overspans,
    perturb_num_samples,
    split_manifest_lazy,
    split_sequence,
)


class AlignmentItem(NamedTuple):
    """
    One alignment item (e.g. a word or phone) with its start time (w.r.t. the
    start of the recording) and duration, plus an optional confidence score.
    """

    symbol: str
    start: Seconds
    duration: Seconds
    score: Optional[float] = None

    @staticmethod
    def deserialize(data: Union[List, Dict]) -> "AlignmentItem":
        if isinstance(data, dict):
            # Legacy dict-based alignment format.
            return AlignmentItem(*list(data.values()))
        return AlignmentItem(*data)

    def serialize(self) -> list:
        return list(self)

    @property
    def end(self) -> Seconds:
        return round(self.start + self.duration, ndigits=8)

    def with_offset(self, offset: Seconds) -> "AlignmentItem":
        return AlignmentItem(
            start=add_durations(self.start, offset, sampling_rate=48000),
            duration=self.duration,
            symbol=self.symbol,
            score=self.score,
        )

    def perturb_speed(self, factor: float, sampling_rate: int) -> "AlignmentItem":
        start_sample = compute_num_samples(self.start, sampling_rate)
        num_samples = compute_num_samples(self.duration, sampling_rate)
        new_start = perturb_num_samples(start_sample, factor) / sampling_rate
        new_duration = perturb_num_samples(num_samples, factor) / sampling_rate
        return AlignmentItem(
            symbol=self.symbol, start=new_start, duration=new_duration, score=self.score
        )

    def trim(self, end: Seconds, start: Seconds = 0) -> "AlignmentItem":
        assert start >= 0
        start_exceeds_by = abs(min(0, self.start - start))
        end_exceeds_by = max(0, self.end - end)
        return AlignmentItem(
            symbol=self.symbol,
            start=max(start, self.start),
            duration=add_durations(
                self.duration, -end_exceeds_by, -start_exceeds_by, sampling_rate=48000
            ),
        )

    def transform(self, transform_fn: Callable[[str], str]) -> "AlignmentItem":
        return AlignmentItem(
            symbol=transform_fn(self.symbol),
            start=self.start,
            duration=self.duration,
            score=self.score,
        )


@dataclass
class SupervisionSegment(CustomFieldMixin):
    """
    A time interval annotated with supervision labels/metadata: transcript,
    speaker, language, gender, a free-form ``custom`` dict, and optional
    alignments keyed by type ('word', 'phone', ...).
    """

    id: str
    recording_id: str
    start: Seconds
    duration: Seconds
    channel: Union[int, List[int]] = 0
    text: Optional[str] = None
    language: Optional[str] = None
    speaker: Optional[str] = None
    gender: Optional[str] = None
    custom: Optional[Dict[str, Any]] = None
    alignment: Optional[Dict[str, List[AlignmentItem]]] = None

    @property
    def end(self) -> Seconds:
        return round(self.start + self.duration, ndigits=8)

    def with_alignment(self, kind: str, alignment: List[AlignmentItem]) -> "SupervisionSegment":
        # Copy the dict so the original segment's alignment is not mutated.
        alis = dict(self.alignment) if self.alignment is not None else {}
        alis[kind] = alignment
        return fastcopy(self, alignment=alis)

    def with_offset(self, offset: Seconds) -> "SupervisionSegment":
        """Return an identical segment with ``offset`` added to ``start``."""
        return fastcopy(self, start=round(self.start + offset, ndigits=8))

    def perturb_speed(
        self, factor: float, sampling_rate: int, affix_id: bool = True
    ) -> "SupervisionSegment":
        """Match the time boundaries of a speed-perturbed recording/cut."""
        start_sample = compute_num_samples(self.start, sampling_rate)
        num_samples = compute_num_samples(self.duration, sampling_rate)
        new_start = perturb_num_samples(start_sample, factor) / sampling_rate
        new_duration = perturb_num_samples(num_samples, factor) / sampling_rate
        return fastcopy(
            self,
            id=f"{self.id}_sp{factor}" if affix_id else self.id,
            recording_id=f"{self.recording_id}_sp{factor}" if affix_id else self.recording_id,
            start=new_start,
            duration=new_duration,
            alignment={
                kind: [
                    item.perturb_speed(factor=factor, sampling_rate=sampling_rate)
                    for item in ali
                ]
                for kind, ali in self.alignment.items()
            }
            if self.alignment
            else None,
        )

    def perturb_tempo(
        self, factor: float, sampling_rate: int, affix_id: bool = True
    ) -> "SupervisionSegment":
        # Speed and tempo perturbation have identical effect on supervisions.
        perturbed = self.perturb_speed(factor, sampling_rate, affix_id=False)
        return fastcopy(
            perturbed,
            id=f"{self.id}_tp{factor}" if affix_id else self.id,
            recording_id=f"{self.recording_id}_tp{factor}" if affix_id else self.recording_id,
        )

    def perturb_volume(self, factor: float, affix_id: bool = True) -> "SupervisionSegment":
        return fastcopy(
            self,
            id=f"{self.id}_vp{factor}" if affix_id else self.id,
            recording_id=f"{self.recording_id}_vp{factor}" if affix_id else self.recording_id,
        )

    def narrowband(self, codec: str, affix_id: bool = True) -> "SupervisionSegment":
        return fastcopy(
            self,
            id=f"{self.id}_nb_{codec}" if affix_id else self.id,
            recording_id=f"{self.recording_id}_nb_{codec}" if affix_id else self.recording_id,
        )

    def reverb_rir(
        self, affix_id: bool = True, channel: Optional[Union[int, List[int]]] = None
    ) -> "SupervisionSegment":
        return fastcopy(
            self,
            id=f"{self.id}_rvb" if affix_id else self.id,
            recording_id=f"{self.recording_id}_rvb" if affix_id else self.recording_id,
            channel=channel if channel is not None else self.channel,
        )

    def trim(self, end: Seconds, start: Seconds = 0) -> "SupervisionSegment":
        """
        Clamp the segment to [start, end] (both relative to the same reference
        as ``self.start``); useful to keep supervisions within a cut's bounds.
        """
        assert start >= 0
        start_exceeds_by = abs(min(0, self.start - start))
        end_exceeds_by = max(0, self.end - end)
        return fastcopy(
            self,
            start=max(start, self.start),
            duration=add_durations(
                self.duration, -end_exceeds_by, -start_exceeds_by, sampling_rate=48000
            ),
            alignment={
                kind: [item.trim(end=end, start=start) for item in ali]
                for kind, ali in self.alignment.items()
            }
            if self.alignment
            else None,
        )

    def map(self, transform_fn: Callable[["SupervisionSegment"], "SupervisionSegment"]):
        return transform_fn(self)

    def transform_text(self, transform_fn: Callable[[str], str]) -> "SupervisionSegment":
        if self.text is None:
            return self
        return fastcopy(self, text=transform_fn(self.text))

    def transform_alignment(
        self, transform_fn: Callable[[str], str], type: Optional[str] = "word"
    ) -> "SupervisionSegment":
        if self.alignment is None:
            return self
        return fastcopy(
            self,
            alignment={
                ali_type: [
                    item.transform(transform_fn=transform_fn) if ali_type == type else item
                    for item in ali
                ]
                for ali_type, ali in self.alignment.items()
            },
        )

    def to_dict(self) -> dict:
        if self.alignment is None:
            return asdict_nonull(self)
        alis = {
            kind: [item.serialize() for item in ali]
            for kind, ali in self.alignment.items()
        }
        data = asdict_nonull(fastcopy(self, alignment=None))
        data["alignment"] = alis
        return data

    @staticmethod
    def from_dict(data: dict) -> "SupervisionSegment":
        from lhotse_tpu.serialization import deserialize_custom_field

        if "custom" in data:
            deserialize_custom_field(data["custom"])
        if "alignment" in data:
            data["alignment"] = {
                k: [AlignmentItem.deserialize(x) for x in v]
                for k, v in data["alignment"].items()
            }
        return SupervisionSegment(**data)


class SupervisionSet(Serializable, AlgorithmMixin):
    """
    A collection of :class:`SupervisionSegment` (eager list or lazy iterable)
    with serialization, splitting/subsetting, temporal ``find()`` search, and
    RTTM/CTM interop. Think of it as Kaldi's ``segments`` + ``text`` +
    ``utt2spk`` combined.
    """

    def __init__(self, segments: Optional[Iterable[SupervisionSegment]] = None) -> None:
        self.segments = ifnone(segments, {})
        self._segments_by_recording_id: Optional[Dict[str, List[SupervisionSegment]]] = None

    def __eq__(self, other: "SupervisionSet") -> bool:
        return self.segments == other.segments

    @property
    def data(self) -> Union[Dict[str, SupervisionSegment], Iterable[SupervisionSegment]]:
        return self.segments

    @property
    def ids(self) -> Iterable[str]:
        return (s.id for s in self)

    @staticmethod
    def from_segments(segments: Iterable[SupervisionSegment]) -> "SupervisionSet":
        return SupervisionSet(list(segments))

    from_items = from_segments

    @staticmethod
    def from_dicts(data: Iterable[Dict]) -> "SupervisionSet":
        return SupervisionSet.from_segments(SupervisionSegment.from_dict(s) for s in data)

    @staticmethod
    def from_rttm(path: Union[Pathlike, Iterable[Pathlike]]) -> "SupervisionSet":
        """Read RTTM file(s) — one SPEAKER turn per line — into supervisions."""
        path = [path] if isinstance(path, (Path, str)) else path
        segments = []
        for file in path:
            with open(file, "r") as f:
                for idx, line in enumerate(f):
                    parts = line.strip().split()
                    assert len(parts) == 10, f"Invalid RTTM line in file {file}: {line}"
                    recording_id = parts[1]
                    if float(parts[4]) == 0:
                        continue
                    segments.append(
                        SupervisionSegment(
                            id=f"{recording_id}-{idx:06d}",
                            recording_id=recording_id,
                            channel=int(parts[2]),
                            start=float(parts[3]),
                            duration=float(parts[4]),
                            speaker=parts[7],
                        )
                    )
        return SupervisionSet.from_segments(segments)

    def with_alignment_from_ctm(
        self,
        ctm_file: Pathlike,
        type: str = "word",
        match_channel: bool = False,
        verbose: bool = False,
    ) -> "SupervisionSet":
        """Attach alignments read from a CTM file to matching segments."""
        ctm_words = []
        with open(ctm_file) as f:
            if verbose:
                from tqdm.auto import tqdm

                f = tqdm(f, desc="Reading words from CTM file")
            for line in f:
                reco_id, channel, start, duration, symbol, *score = line.strip().split()
                ctm_words.append(
                    (
                        reco_id,
                        int(channel),
                        float(start),
                        float(duration),
                        symbol,
                        float(score[0]) if score else None,
                    )
                )
        ctm_words = sorted(ctm_words, key=lambda x: (x[0], x[2]))
        reco_to_ctm = defaultdict(
            list, {k: list(v) for k, v in groupby(ctm_words, key=lambda x: x[0])}
        )
        segments = []
        num_total = len(ctm_words)
        num_overspanned = 0
        recordings = set(s.recording_id for s in self)
        if verbose:
            from tqdm.auto import tqdm

            recordings = tqdm(recordings, desc="Adding alignments")
        for reco_id in recordings:
            if reco_id in reco_to_ctm:
                for seg in self.find(recording_id=reco_id):
                    alignment = [
                        AlignmentItem(
                            symbol=word[4], start=word[2], duration=word[3], score=word[5]
                        )
                        for word in reco_to_ctm[reco_id]
                        if overspans(seg, TimeSpan(word[2], word[2] + word[3]))
                        and (seg.channel == word[1] or not match_channel)
                    ]
                    num_overspanned += len(alignment)
                    segments.append(fastcopy(seg, alignment={type: alignment}))
            else:
                segments.extend(
                    fastcopy(s, alignment={type: []}) for s in self.find(recording_id=reco_id)
                )
        logging.info(
            f"{num_overspanned} alignments added out of {num_total} total. "
            "If many are missing, there may be a mismatch problem."
        )
        return SupervisionSet.from_segments(segments)

    def write_alignment_to_ctm(self, ctm_file: Pathlike, type: str = "word") -> None:
        """Write alignments of the given type to a CTM file."""
        with open(ctm_file, "w") as f:
            for s in self:
                if type in s.alignment:
                    for ali in s.alignment[type]:
                        c = s.channel[0] if isinstance(s.channel, list) else s.channel
                        if ali.score is None:
                            f.write(
                                f"{s.recording_id} {c} {ali.start:.02f} {ali.duration:.02f} {ali.symbol}\n"
                            )
                        else:
                            f.write(
                                f"{s.recording_id} {c} {ali.start:.02f} {ali.duration:.02f} "
                                f"{ali.symbol} {ali.score:.02f}\n"
                            )

    def to_dicts(self) -> Iterable[dict]:
        return (s.to_dict() for s in self)

    def split(
        self, num_splits: int, shuffle: bool = False, drop_last: bool = False
    ) -> List["SupervisionSet"]:
        """Split into ``num_splits`` pieces of (near-)equal size."""
        return [
            SupervisionSet.from_segments(subset)
            for subset in split_sequence(
                self, num_splits=num_splits, shuffle=shuffle, drop_last=drop_last
            )
        ]

    def split_lazy(
        self, output_dir: Pathlike, chunk_size: int, prefix: str = ""
    ) -> List["SupervisionSet"]:
        """Split into fixed-size chunks saved to disk as the input is consumed."""
        return split_manifest_lazy(
            self, output_dir=output_dir, chunk_size=chunk_size, prefix=prefix
        )

    def subset(
        self, first: Optional[int] = None, last: Optional[int] = None
    ) -> "SupervisionSet":
        """Keep only the first or last N segments."""
        assert exactly_one_not_null(first, last), "subset() can handle only one non-None arg."
        if first is not None:
            assert first > 0
            return SupervisionSet.from_items(islice(self, first))
        if last is not None:
            assert last > 0
            if last > len(self):
                return self
            return SupervisionSet.from_segments(islice(self, len(self) - last, len(self)))

    def transform_text(self, transform_fn: Callable[[str], str]) -> "SupervisionSet":
        return SupervisionSet.from_segments(s.transform_text(transform_fn) for s in self)

    def transform_alignment(
        self, transform_fn: Callable[[str], str], type: str = "word"
    ) -> "SupervisionSet":
        return SupervisionSet.from_segments(
            s.transform_alignment(transform_fn, type=type) for s in self
        )

    def find(
        self,
        recording_id: str,
        channel: Optional[int] = None,
        start_after: Seconds = 0,
        end_before: Optional[Seconds] = None,
        adjust_offset: bool = False,
        tolerance: Seconds = 0.001,
    ) -> Iterable[SupervisionSegment]:
        """
        Temporal search over segments of ``recording_id`` (cached index),
        optionally restricted to a channel and a [start_after, end_before]
        window; ``adjust_offset`` re-bases starts to ``start_after`` (useful
        when creating Cuts). Reference: supervision.py:813.
        """
        segment_by_recording_id = self._index_by_recording_id_and_cache()
        return (
            segment.with_offset(-start_after) if adjust_offset else segment
            for segment in segment_by_recording_id.get(recording_id, [])
            if (channel is None or is_equal_or_contains(segment.channel, channel))
            and segment.start >= start_after - tolerance
            and (end_before is None or segment.end <= end_before + tolerance)
        )

    def _index_by_recording_id_and_cache(self):
        if self._segments_by_recording_id is None:
            index: Dict[str, List[SupervisionSegment]] = defaultdict(list)
            for seg in self:
                index[seg.recording_id].append(seg)
            self._segments_by_recording_id = dict(index)
        return self._segments_by_recording_id

    def __repr__(self) -> str:
        return f"SupervisionSet(len={len(self)})"

    def __getitem__(self, index_or_id: Union[int, str]) -> SupervisionSegment:
        try:
            return self.segments[index_or_id]
        except TypeError:
            if self.is_lazy:
                return next(item for idx, item in enumerate(self) if idx == index_or_id)
            return next(item for item in self if item.id == index_or_id)

    def __contains__(self, other: Union[str, SupervisionSegment]) -> bool:
        if isinstance(other, str):
            return any(other == item.id for item in self)
        return any(other.id == item.id for item in self)

    def __iter__(self) -> Iterable[SupervisionSegment]:
        yield from self.segments

    def __len__(self) -> int:
        return len(self.segments)
