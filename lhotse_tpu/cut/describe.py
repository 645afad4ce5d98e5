"""
CutSet statistics accumulation and the ``describe()`` report.

Reference behavior: `/root/reference/lhotse/cut/describe.py:13` — accumulates
duration/supervision/speech stats (optionally per speaker count) across cut
sets, combinable for parallel gathering; ``find_segments_with_speaker_count``
(:265) sweeps supervision boundaries to find intervals with N active speakers.
Falls back to plain-text tables when `tabulate` is not installed.
"""
from __future__ import annotations

from collections import Counter, defaultdict
from copy import deepcopy
from math import ceil
from typing import List, Optional, Tuple

import numpy as np

from lhotse_tpu.utils import Seconds, TimeSpan, ifnone, is_module_available


def _tabulate(rows, headers=None, tablefmt="fancy_grid"):
    if is_module_available("tabulate"):
        from tabulate import tabulate

        if headers == "firstrow":
            return tabulate(rows, headers="firstrow", tablefmt=tablefmt)
        return tabulate(rows, tablefmt=tablefmt)
    # Plain fallback: pad columns to equal width.
    all_rows = rows
    widths = [
        max(len(str(r[i])) for r in all_rows if len(r) > i)
        for i in range(max(len(r) for r in all_rows))
    ]
    lines = []
    for r in all_rows:
        lines.append(" | ".join(str(v).ljust(w) for v, w in zip(r, widths)))
    return "\n".join(lines)


class CutSetStatistics:
    """
    Accumulate an overview of a CutSet (cut/supervision counts, durations,
    speech/silence/overlap breakdown); multiple instances can be combined
    (e.g. gathered in parallel) before calling :meth:`describe`.
    """

    def __init__(self, full: bool = False):
        self.full = full
        self.counters = defaultdict(int)
        self.cut_custom, self.sup_custom = Counter(), Counter()
        self.cut_durations = []
        self.speaking_time_durations, self.speech_durations = [], []
        if self.full:
            self.durations_by_num_speakers = defaultdict(list)
            self.single_durations, self.overlapped_durations = [], []

    def combine(self, *other: "CutSetStatistics") -> "CutSetStatistics":
        """Combine multiple statistics into a new object (self unmodified)."""
        lhs = deepcopy(self)
        for rhs in other:
            assert lhs.full == rhs.full, (
                "Cannot combine statistics gathered with full=True and full=False."
            )
            for attr in ("counters", "cut_custom", "sup_custom"):
                for k in getattr(rhs, attr):
                    getattr(lhs, attr)[k] += getattr(rhs, attr)[k]
            for attr in (
                "cut_durations",
                "speaking_time_durations",
                "speech_durations",
            ) + (("single_durations", "overlapped_durations") if lhs.full else ()):
                getattr(lhs, attr).extend(getattr(rhs, attr))
            if lhs.full:
                for k in rhs.durations_by_num_speakers:
                    lhs.durations_by_num_speakers[k].extend(rhs.durations_by_num_speakers[k])
        return lhs

    def accumulate(self, cuts) -> "CutSetStatistics":
        """Gather statistics from a cut set."""

        def total_duration_(segments: List[TimeSpan]) -> float:
            return sum(segment.duration for segment in segments)

        for c in cuts:
            self.cut_durations.append(c.duration)
            if hasattr(c, "custom"):
                for key in ifnone(c.custom, ()):
                    self.cut_custom[key] += 1
            self.counters["recordings"] += int(c.has_recording)
            self.counters["features"] += int(c.has_features)
            for s in c.trimmed_supervisions:
                self.speaking_time_durations.append(s.duration)
                self.counters["supervisions"] += 1
                for key in ifnone(s.custom, ()):
                    self.sup_custom[key] += 1
            self.speech_durations.append(
                total_duration_(find_segments_with_speaker_count(c, min_speakers=1))
            )
            if self.full:
                self.single_durations.append(
                    total_duration_(
                        find_segments_with_speaker_count(c, min_speakers=1, max_speakers=1)
                    )
                )
                self.overlapped_durations.append(
                    total_duration_(
                        find_segments_with_speaker_count(c, min_speakers=2, max_speakers=None)
                    )
                )
                self.durations_by_num_speakers[1].append(self.single_durations[-1])
                # Overlaps between at most 4 speakers are assumed.
                for num_spk in range(2, 5):
                    self.durations_by_num_speakers[num_spk].append(
                        total_duration_(
                            find_segments_with_speaker_count(
                                c, min_speakers=num_spk, max_speakers=num_spk
                            )
                        )
                    )
        return self

    def describe(self) -> None:
        """Print the accumulated statistics."""

        def convert_(seconds: Seconds) -> Tuple[int, int, int]:
            hours, seconds = divmod(seconds, 3600)
            minutes, seconds = divmod(seconds, 60)
            return int(hours), int(minutes), ceil(seconds)

        def time_as_str_(seconds: Seconds) -> str:
            h, m, s = convert_(seconds)
            return f"{h:02d}:{m:02d}:{s:02d}"

        cut_durations = self.cut_durations
        total_sum = np.array(cut_durations).sum()

        cut_stats = []
        cut_stats.append(["Cuts count:", len(cut_durations)])
        cut_stats.append(["Total duration (hh:mm:ss)", time_as_str_(total_sum)])
        cut_stats.append(["mean", f"{np.mean(cut_durations):.1f}"])
        cut_stats.append(["std", f"{np.std(cut_durations):.1f}"])
        cut_stats.append(["min", f"{np.min(cut_durations):.1f}"])
        cut_stats.append(["25%", f"{np.percentile(cut_durations, 25):.1f}"])
        cut_stats.append(["50%", f"{np.median(cut_durations):.1f}"])
        cut_stats.append(["75%", f"{np.percentile(cut_durations, 75):.1f}"])
        cut_stats.append(["99%", f"{np.percentile(cut_durations, 99):.1f}"])
        cut_stats.append(["99.5%", f"{np.percentile(cut_durations, 99.5):.1f}"])
        cut_stats.append(["99.9%", f"{np.percentile(cut_durations, 99.9):.1f}"])
        cut_stats.append(["max", f"{np.max(cut_durations):.1f}"])
        for key, val in self.counters.items():
            cut_stats.append([f"{key.title()} available:", val])
        print("Cut statistics:")
        print(_tabulate(cut_stats))

        if self.cut_custom:
            print("CUT custom fields:")
            for key, val in self.cut_custom.most_common():
                print(f"- {key} (in {val} cuts)")
        if self.sup_custom:
            print("SUPERVISION custom fields:")
            for key, val in self.sup_custom.most_common():
                print(f"- {key} (in {val} cuts)")

        total_speech = np.array(self.speech_durations).sum()
        total_speaking_time = np.array(self.speaking_time_durations).sum()
        total_silence = total_sum - total_speech
        speech_stats = []
        speech_stats.append(
            [
                "Total speech duration",
                time_as_str_(total_speech),
                f"{total_speech / total_sum:.2%} of recording",
            ]
        )
        speech_stats.append(
            [
                "Total speaking time duration",
                time_as_str_(total_speaking_time),
                f"{total_speaking_time / total_sum:.2%} of recording",
            ]
        )
        speech_stats.append(
            [
                "Total silence duration",
                time_as_str_(total_silence),
                f"{total_silence / total_sum:.2%} of recording",
            ]
        )
        if self.full:
            total_single = np.array(self.single_durations).sum()
            total_overlap = np.array(self.overlapped_durations).sum()
            speech_stats.append(
                [
                    "Single-speaker duration",
                    time_as_str_(total_single),
                    f"{total_single / total_sum:.2%} "
                    f"({total_single / total_speech:.2%} of speech)",
                ]
            )
            speech_stats.append(
                [
                    "Overlapped speech duration",
                    time_as_str_(total_overlap),
                    f"{total_overlap / total_sum:.2%} "
                    f"({total_overlap / total_speech:.2%} of speech)",
                ]
            )
        print("Speech duration statistics:")
        print(_tabulate(speech_stats))

        if not self.full:
            return

        speaker_stats = [
            [
                "Number of speakers",
                "Duration (hh:mm:ss)",
                "Speaking time (hh:mm:ss)",
                "% of speech",
                "% of speaking time",
            ]
        ]
        for num_spk, durations in self.durations_by_num_speakers.items():
            speaker_sum = np.array(durations).sum()
            speaking_time = num_spk * speaker_sum
            speaker_stats.append(
                [
                    num_spk,
                    time_as_str_(speaker_sum),
                    time_as_str_(speaking_time),
                    f"{speaker_sum / total_speech:.2%}",
                    f"{speaking_time / total_speaking_time:.2%}",
                ]
            )
        speaker_stats.append(
            [
                "Total",
                time_as_str_(total_speech),
                time_as_str_(total_speaking_time),
                "100.00%",
                "100.00%",
            ]
        )
        print("Speech duration statistics by number of speakers:")
        print(_tabulate(speaker_stats, headers="firstrow"))


def find_segments_with_speaker_count(
    cut, min_speakers: int = 0, max_speakers: Optional[int] = None
) -> List[TimeSpan]:
    """
    Sweep the supervision boundaries of a cut to find the intervals with a
    speaker count within [min_speakers, max_speakers].
    """
    if max_speakers is None:
        max_speakers = float("inf")
    assert 0 <= min_speakers <= max_speakers, (
        f"min_speakers={min_speakers} and max_speakers={max_speakers} are not valid."
    )
    if min_speakers == 0 and max_speakers == float("inf"):
        return [TimeSpan(0, cut.duration)]
    if len(cut.supervisions) == 0:
        return [] if min_speakers > 0 else [TimeSpan(0, cut.duration)]

    # Timestamps: (time, is_speaker_start); None marks cut boundaries.
    timestamps = [(0.0, None)]
    for segment in cut.supervisions:
        timestamps.append((segment.start, True))
        timestamps.append((segment.end, False))
    timestamps.append((cut.duration, None))
    # Priority at equal time marks: None < False < True.
    timestamps.sort(key=lambda x: (x[0], x[1] is not None, x[1] is True))

    cut_boundary_indices = [i for i, t in enumerate(timestamps) if t[1] is None]
    cut_start_idx, cut_end_idx = cut_boundary_indices[0], cut_boundary_indices[-1]
    timestamps = timestamps[cut_start_idx : cut_end_idx + 1]

    num_speakers = 0
    seg_start = 0.0
    intervals = []
    for timestamp, is_start in timestamps[1:]:
        if min_speakers <= num_speakers <= max_speakers:
            intervals.append((seg_start, timestamp))
        if is_start is not None:
            num_speakers += 1 if is_start else -1
        seg_start = timestamp

    merged_intervals = []
    for start, end in intervals:
        if start == end:
            continue
        if merged_intervals and merged_intervals[-1][1] == start:
            merged_intervals[-1] = (merged_intervals[-1][0], end)
        else:
            merged_intervals.append((start, end))
    return [TimeSpan(start, end) for start, end in merged_intervals]
