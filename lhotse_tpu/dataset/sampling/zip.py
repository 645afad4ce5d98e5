"""
ZipSampler: lockstep iteration over several samplers.

Reference behavior: `/root/reference/lhotse/dataset/sampling/zip.py`
(ZipSampler :10-214). Yields merged CutSets (or tuples) with one batch from
each sub-sampler per step; stops when any sub-sampler is depleted.
"""
from functools import reduce
from operator import add
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

from lhotse_tpu.cut import Cut, CutSet
from lhotse_tpu.dataset.sampling.base import CutSampler, SamplingDiagnostics


class ZipSampler(CutSampler):
    """
    Concatenates the mini-batches of several samplers into one CutSet (or a
    tuple of CutSets with ``merge_batches=False``) — useful to guarantee each
    batch holds a fixed proportion of data from different sources::

        >>> sampler = ZipSampler(
        ...     SimpleCutSampler(cuts_corpusA, max_duration=250, shuffle=True),
        ...     SimpleCutSampler(cuts_corpusB, max_duration=100, shuffle=True),
        ... )
    """

    def __init__(self, *samplers: CutSampler, merge_batches: bool = True) -> None:
        super().__init__(rank=0, world_size=1)
        self.samplers = samplers
        self.merge_batches = merge_batches

    @property
    def remaining_duration(self) -> Optional[float]:
        """Minimum of the sub-samplers' remaining durations (None if lazy)."""
        try:
            return min(s.remaining_duration for s in self.samplers)
        except TypeError:
            return None

    @property
    def remaining_cuts(self) -> Optional[int]:
        try:
            return min(s.remaining_cuts for s in self.samplers)
        except TypeError:
            return None

    @property
    def num_cuts(self) -> Optional[int]:
        try:
            return min(s.num_cuts for s in self.samplers)
        except TypeError:
            return None

    def allow_iter_to_reset_state(self):
        super().allow_iter_to_reset_state()
        for s in self.samplers:
            s.allow_iter_to_reset_state()

    def state_dict(self) -> Dict[str, Any]:
        state_dict = super().state_dict()
        state_dict.update(
            {
                "merge_batches": self.merge_batches,
                "samplers": [s.state_dict() for s in self.samplers],
            }
        )
        return state_dict

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        self.merge_batches = state_dict.pop("merge_batches")
        samplers_sd = state_dict.pop("samplers")
        assert len(self.samplers) == len(samplers_sd), (
            "Error in ZipSampler.load_state_dict(): Inconsistent number of "
            f"samplers: current ZipSampler has {len(self.samplers)}, the "
            f"state_dict has {len(samplers_sd)}."
        )
        for sampler, sampler_sd in zip(self.samplers, samplers_sd):
            sampler.load_state_dict(sampler_sd)
        super().load_state_dict(state_dict)

    def __iter__(self):
        for sampler in self.samplers:
            iter(sampler)
        return self

    def _next_batch(self) -> Union[CutSet, Tuple[CutSet]]:
        self.allow_iter_to_reset_state()
        if self.merge_batches:
            # One batch from each sampler, flattened into a single CutSet
            # (or, for pair-samplers, element-wise merged tuples of CutSets).
            cuts: List[Union[CutSet, Tuple[CutSet]]] = []
            for sampler in self.samplers:
                batch = next(sampler)
                cuts.append(batch)
            if not cuts:
                return CutSet()
            if isinstance(batch, CutSet):
                return CutSet.from_cuts(c for batch in cuts for c in batch)
            else:
                tuple_len = len(batch)
                cut_sets = []
                for i in range(tuple_len):
                    cut_sets.append(CutSet.from_cuts(c for batch in cuts for c in batch[i]))
                return tuple(cut_sets)
        else:
            cuts: List[CutSet] = []
            for sampler in self.samplers:
                cuts.append(next(sampler))
            return tuple(cuts)

    def set_epoch(self, epoch: int) -> None:
        for s in self.samplers:
            s.set_epoch(epoch)
        super().set_epoch(epoch)

    def filter(self, predicate: Callable[[Cut], bool]) -> None:
        for sampler in self.samplers:
            sampler.filter(predicate)

    def _log_diagnostics(self, batch: Union[CutSet, Tuple[CutSet, ...]]) -> None:
        return  # sub-samplers log their own

    @property
    def diagnostics(self) -> SamplingDiagnostics:
        return reduce(add, (s.diagnostics for s in self.samplers))

    def get_report(self) -> str:
        return self.diagnostics.get_report()
