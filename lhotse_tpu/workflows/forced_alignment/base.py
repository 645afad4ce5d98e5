"""
Forced-alignment framework: the aligner contract and per-cut plumbing.

Parity target: `/root/reference/lhotse/workflows/forced_alignment/base.py:21-77`
(`ForcedAligner` ABC) — an aligner exposes ``sample_rate``,
``normalize_text`` and ``align(audio, transcript) -> List[AlignmentItem]``;
``__call__(cut)`` trims the cut to its supervisions, aligns each
non-overlapping supervision's audio, offsets the word timings back into cut
coordinates and attaches them via ``SupervisionSegment.with_alignment``.

Unlike the reference there is no torch dependency: audio flows as numpy and
the CTC trellis math lives in :mod:`.ctc` (numpy; the emissions come from
whatever acoustic model the concrete aligner wraps).
"""
from __future__ import annotations

import abc
import logging
from typing import List, Optional, Tuple, Union

import numpy as np

from lhotse_tpu.supervision import AlignmentItem
from lhotse_tpu.utils import fastcopy


class FailedToAlign(RuntimeError):
    pass


class ForcedAligner(abc.ABC):
    """Abstract base class for forced aligners."""

    def __init__(self, device: str = "cpu"):
        self.device = device

    @property
    @abc.abstractmethod
    def sample_rate(self) -> int:
        ...

    @abc.abstractmethod
    def normalize_text(
        self, text: str, language: Optional[str] = None,
    ) -> Union[str, List[str], List[Tuple[str, str]]]:
        ...

    @abc.abstractmethod
    def align(
        self, audio: np.ndarray, transcript: Union[str, List[Tuple[str, str]]],
    ) -> List[AlignmentItem]:
        ...

    def __call__(self, cut, normalize: bool = True):
        cut = fastcopy(cut, supervisions=list(cut.supervisions))

        for idx, subcut in enumerate(cut.trim_to_supervisions(keep_overlapping=False)):
            audio = subcut.resample(self.sample_rate).load_audio()
            sup = subcut.supervisions[0]
            transcript = (
                self.normalize_text(sup.text, language=sup.language)
                if normalize
                else sup.text
            )
            try:
                pre_alignment = self.align(audio, transcript)
            except FailedToAlign:
                logging.exception(
                    f"Failed to align supervision '{sup.id}' for cut "
                    f"'{cut.id}'. Writing it without alignment."
                )
                continue

            alignment = [item._replace(start=item.start + subcut.start) for item in pre_alignment]
            # Reference the original supervision (the trimmed one has start=0).
            cut.supervisions[idx] = cut.supervisions[idx].with_alignment(
                kind="word", alignment=alignment)

        return cut
