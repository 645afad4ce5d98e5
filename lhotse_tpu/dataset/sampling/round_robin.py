"""
RoundRobinSampler: alternate mini-batches between several samplers.

Reference behavior: `/root/reference/lhotse/dataset/sampling/round_robin.py`
(RoundRobinSampler :13-261): in-order or probability-weighted selection,
worker-offset start index, depleted samplers skipped until all exhaust
(or ``stop_early``).
"""
from functools import reduce
from operator import add
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import numpy as np

from lhotse_tpu.cut import Cut, CutSet
from lhotse_tpu.dataset.sampling.base import CutSampler, SamplingDiagnostics


class RoundRobinSampler(CutSampler):
    """
    Yields one mini-batch from each input sampler in turn — useful for
    alternating between datasets or manually mixing batch sizes::

        >>> sampler = RoundRobinSampler(
        ...     SimpleCutSampler(cuts_corpusA, max_cuts=32, shuffle=True),
        ...     SimpleCutSampler(cuts_corpusB, max_cuts=64, shuffle=True),
        ... )
    """

    def __init__(
        self,
        *samplers: CutSampler,
        stop_early: bool = False,
        randomize: Union[bool, List[float]] = False,
        seed: int = 0,
    ) -> None:
        """
        :param samplers: samplers to draw batches from in turns.
        :param stop_early: finish the epoch as soon as any sampler depletes
            (balances datasets of different sizes).
        :param randomize: False = strict order; True = uniform random choice;
            a list of floats = per-sampler selection probabilities.
        :param seed: seed for the random selection (randomize only).
        """
        super().__init__(rank=0, world_size=1, seed=seed)
        self.samplers = samplers
        self.stop_early = stop_early
        self.rng = None

        self._nondepleted_samplers_indices = list(range(len(self.samplers)))
        self._cur_sampler_idx = 0
        self._num_dl_workers = 1

        if isinstance(randomize, list):
            assert len(randomize) == len(self.samplers)
        elif randomize is True:
            randomize = [1.0 / len(self.samplers)] * len(self.samplers)
        self.randomize = randomize

    @property
    def remaining_duration(self) -> Optional[float]:
        try:
            return sum(s.remaining_duration for s in self.samplers)
        except TypeError:
            return None

    @property
    def remaining_cuts(self) -> Optional[int]:
        try:
            return sum(s.remaining_cuts for s in self.samplers)
        except TypeError:
            return None

    @property
    def num_cuts(self) -> Optional[int]:
        try:
            return sum(s.num_cuts for s in self.samplers)
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
                "samplers": [s.state_dict() for s in self.samplers],
                "stop_early": self.stop_early,
                "randomize": self.randomize,
                "_cur_sampler_idx": self._cur_sampler_idx,
                "_num_dl_workers": self._num_dl_workers,
                # List copy allows in-process restore.
                "_nondepleted_samplers_indices": list(self._nondepleted_samplers_indices),
            }
        )
        return state_dict

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        self.stop_early = state_dict.pop("stop_early")
        self.randomize = state_dict.pop("randomize")
        self._cur_sampler_idx = state_dict.pop("_cur_sampler_idx")
        self._num_dl_workers = state_dict.pop("_num_dl_workers")
        self._nondepleted_samplers_indices = state_dict.pop(
            "_nondepleted_samplers_indices"
        )
        samplers_sd = state_dict.pop("samplers")
        assert len(self.samplers) == len(samplers_sd), (
            "Error in RoundRobinSampler.load_state_dict(): Inconsistent number "
            f"of samplers: current RoundRobinSampler has {len(self.samplers)}, "
            f"the state_dict has {len(samplers_sd)}."
        )
        for sampler, sampler_sd in zip(self.samplers, samplers_sd):
            sampler.load_state_dict(sampler_sd)
        super().load_state_dict(state_dict)

    def __iter__(self):
        from lhotse_tpu.dataset.dataloading import get_worker_info

        self.rng = np.random.default_rng(seed=self.seed + self.epoch)
        for sampler in self.samplers:
            iter(sampler)
        if self._just_restored_state:
            return self
        self._nondepleted_samplers_indices = list(range(len(self.samplers)))
        # Inside a dataloading worker, offset the starting index per worker so
        # N workers don't all pick the same sub-sampler for N consecutive
        # mini-batches.
        self._cur_sampler_idx = 0
        self._num_dl_workers = 1
        worker_info = get_worker_info()
        if worker_info is not None:
            self._cur_sampler_idx = worker_info.id % len(
                self._nondepleted_samplers_indices
            )
            self._num_dl_workers = worker_info.num_workers
        return self

    def _next_batch(self) -> Union[CutSet, Tuple[CutSet]]:
        if len(self._nondepleted_samplers_indices) == 0:
            raise StopIteration()

        sampler_idx = self._nondepleted_samplers_indices[self._cur_sampler_idx]
        sampler = self.samplers[sampler_idx]

        try:
            batch = next(sampler)
        except StopIteration:
            self._nondepleted_samplers_indices.pop(self._cur_sampler_idx)
            if self.stop_early or len(self._nondepleted_samplers_indices) == 0:
                raise
            self._set_next_idx()
            return self._next_batch()

        self._set_next_idx()
        return batch

    def _set_next_idx(self) -> None:
        if self.randomize is not False and len(self._nondepleted_samplers_indices) > 1:
            N = range(len(self._nondepleted_samplers_indices))
            p = [self.randomize[i] for i in self._nondepleted_samplers_indices]
            p = [x / sum(p) for x in p]
            self._cur_sampler_idx = int(self.rng.choice(N, size=1, replace=False, p=p)[0])
        else:
            self._cur_sampler_idx = (
                self._cur_sampler_idx + self._num_dl_workers
            ) % max(1, len(self._nondepleted_samplers_indices))

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
