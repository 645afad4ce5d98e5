"""
CTC forced-alignment math (model-free, numpy).

Implements the standard CTC trellis + backtracking algorithm the reference
uses inside its wav2vec2 aligner
(`/root/reference/lhotse/workflows/forced_alignment/asr_aligner.py:80-202`,
itself the torchaudio forced-alignment tutorial): given per-frame log
probabilities ``emission (num_frames, num_labels)`` and the token id
sequence of the transcript, find the maximum-probability monotone path that
either stays (emits blank) or advances one token per frame, then merge
repeated frames into per-character segments and characters into words at the
``"|"`` separator.

Kept separate from any acoustic model so it is directly testable with
synthetic emissions; the model wrappers in :mod:`.asr_aligner` feed it.
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

from lhotse_tpu.workflows.forced_alignment.base import FailedToAlign


class Point(NamedTuple):
    token_index: int
    time_index: int
    score: float


class Segment(NamedTuple):
    label: str
    start: int  # frame index, inclusive
    end: int  # frame index, exclusive
    score: float

    @property
    def length(self) -> int:
        return self.end - self.start


def ctc_forced_align(emission: np.ndarray, tokens: Sequence[int], blank_id: int = 0) -> List[Point]:
    """
    Viterbi-style CTC alignment. Returns one :class:`Point` per frame on the
    optimal path (time-ascending), each carrying the frame's emission
    probability for the chosen symbol.
    """
    emission = np.asarray(emission, dtype=np.float64)
    num_frames, _ = emission.shape
    tokens = list(tokens)
    num_tokens = len(tokens)
    if num_tokens == 0:
        raise FailedToAlign("Empty transcript.")
    if num_frames < num_tokens:
        raise FailedToAlign(
            f"Transcript longer than the emission: {num_tokens} tokens vs "
            f"{num_frames} frames."
        )

    token_ids = np.asarray(tokens)
    blank_scores = emission[:, blank_id]
    token_scores = emission[np.arange(num_frames)[:, None], token_ids[None, :]]

    # trellis[t, j] = best log-prob of consuming the first j tokens within the
    # first t frames. Row/column 0 are the start-of-sentence padding.
    trellis = np.full((num_frames + 1, num_tokens + 1), -np.inf)
    trellis[0, 0] = 0.0
    trellis[1:, 0] = np.cumsum(blank_scores)
    for t in range(num_frames):
        stay = trellis[t, 1:] + blank_scores[t]
        advance = trellis[t, :-1] + token_scores[t]
        trellis[t + 1, 1:] = np.maximum(stay, advance)

    if not np.isfinite(trellis[:, -1]).any():
        raise FailedToAlign("No feasible alignment path.")

    j = num_tokens
    t = int(np.argmax(trellis[:, -1]))
    path: List[Point] = []
    while t > 0:
        stayed = trellis[t - 1, j] + blank_scores[t - 1]
        changed = trellis[t - 1, j - 1] + token_scores[t - 1, j - 1]
        prob = float(np.exp(emission[t - 1, tokens[j - 1] if changed > stayed else blank_id]))
        path.append(Point(j - 1, t - 1, prob))
        if changed > stayed:
            j -= 1
            if j == 0:
                break
        t -= 1
    if j != 0:
        raise FailedToAlign("Backtracking failed to consume the transcript.")
    return path[::-1]


def merge_repeats(path: List[Point], transcript: str) -> List[Segment]:
    """Collapse consecutive path points of the same token into one segment
    labeled with the transcript character, scored by the mean frame prob."""
    segments: List[Segment] = []
    i1 = 0
    while i1 < len(path):
        i2 = i1
        while i2 < len(path) and path[i2].token_index == path[i1].token_index:
            i2 += 1
        score = sum(p.score for p in path[i1:i2]) / (i2 - i1)
        segments.append(
            Segment(
                transcript[path[i1].token_index],
                path[i1].time_index,
                path[i2 - 1].time_index + 1,
                score,
            )
        )
        i1 = i2
    return segments


def merge_words(segments: List[Segment], separator: str = "|") -> List[Segment]:
    """Join character segments into words at the separator label, scoring
    each word by the duration-weighted mean of its characters."""
    words: List[Segment] = []
    current: List[Segment] = []
    for seg in list(segments) + [Segment(separator, -1, -1, 0.0)]:
        if seg.label == separator:
            if current:
                total = sum(s.length for s in current)
                score = sum(s.score * s.length for s in current) / total
                words.append(
                    Segment(
                        "".join(s.label for s in current),
                        current[0].start,
                        current[-1].end,
                        score,
                    )
                )
            current = []
        else:
            current.append(seg)
    return words


def align_ctc_emission(
    emission: np.ndarray, transcript: str, dictionary, blank_id: int = 0, separator: str = "|",
) -> List[Segment]:
    """Transcript string → word segments (frame units), one call."""
    tokens = [dictionary[c] for c in transcript]
    path = ctc_forced_align(emission, tokens, blank_id=blank_id)
    return merge_words(merge_repeats(path, transcript), separator=separator)
