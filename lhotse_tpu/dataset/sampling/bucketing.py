"""
BucketingSampler: eager bucketing over an in-memory CutSet.

Reference behavior: `/root/reference/lhotse/dataset/sampling/bucketing.py`
(BucketingSampler :15-334, create_buckets_equal_duration :337-427).
Sorts cuts by duration into equal-cumulative-duration buckets (filled from
both ends toward the median to avoid overflow pile-up), runs one sub-sampler
per bucket, and selects buckets with approximate proportional sampling (two
random candidates, weighted by remaining duration).
"""
import random
from copy import deepcopy
from functools import reduce
from operator import add
from typing import Any, Callable, Dict, List, Optional, Tuple, Type, Union

import numpy as np

from lhotse_tpu.cut import Cut, CutSet
from lhotse_tpu.dataset.sampling.base import CutSampler, SamplingDiagnostics
from lhotse_tpu.dataset.sampling.simple import SimpleCutSampler


class BucketingSampler(CutSampler):
    """
    Buckets an eager CutSet by duration and runs a per-bucket sub-sampler
    (default :class:`SimpleCutSampler`). Yields batches from a random
    non-depleted bucket until all buckets are exhausted.

    Examples::

        >>> sampler = BucketingSampler(
        ...    cuts, sampler_type=SimpleCutSampler, num_buckets=20,
        ...    max_duration=200,
        ... )
    """

    def __init__(
        self,
        *cuts: CutSet,
        sampler_type: Type = SimpleCutSampler,
        num_buckets: int = 10,
        drop_last: bool = False,
        seed: int = 0,
        **kwargs: Any,
    ) -> None:
        # Distributed dedup is handled by the per-bucket sub-samplers, not here.
        super().__init__(drop_last=drop_last, world_size=1, rank=0, seed=seed)
        self.num_buckets = num_buckets
        self.sampler_type = sampler_type
        self.sampler_kwargs = kwargs
        self.cut_sets = cuts
        if any(cs.is_lazy for cs in self.cut_sets):
            raise ValueError(
                "BucketingSampler does not support working with lazy CutSet. "
                "Please use lhotse_tpu.dataset.DynamicBucketingSampler instead."
            )

        self.buckets = create_buckets_equal_duration(
            *self.cut_sets, num_buckets=num_buckets
        )
        self.bucket_samplers = [
            self.sampler_type(*bucket_cut_sets, drop_last=drop_last, **self.sampler_kwargs)
            for bucket_cut_sets in self.buckets
        ]
        self.bucket_rng = random.Random(self.seed + self.epoch)
        self.depleted = [False] * num_buckets

    @property
    def remaining_duration(self) -> Optional[float]:
        """Sum of remaining duration over non-depleted buckets (None if lazy)."""
        try:
            return sum(
                s.remaining_duration for _, s in self._nondepleted_samplers_with_idxs
            )
        except TypeError:
            return None

    @property
    def remaining_cuts(self) -> Optional[int]:
        try:
            return sum(s.remaining_cuts for _, s in self._nondepleted_samplers_with_idxs)
        except TypeError:
            return None

    @property
    def num_cuts(self) -> Optional[int]:
        try:
            return sum(s.num_cuts for s in self.bucket_samplers)
        except TypeError:
            return None

    def set_epoch(self, epoch: int) -> None:
        for s in self.bucket_samplers:
            s.set_epoch(epoch)
        super().set_epoch(epoch)

    def filter(self, predicate: Callable[[Cut], bool]) -> None:
        for sampler in self.bucket_samplers:
            sampler.filter(predicate)

    def allow_iter_to_reset_state(self):
        super().allow_iter_to_reset_state()
        for s in self.bucket_samplers:
            s.allow_iter_to_reset_state()

    def state_dict(self) -> Dict[str, Any]:
        state_dict = super().state_dict()
        state_dict.update(
            {
                "num_buckets": self.num_buckets,
                "depleted": deepcopy(self.depleted),
                "bucket_samplers": [s.state_dict() for s in self.bucket_samplers],
                "sampler_kwargs": deepcopy(self.sampler_kwargs),
                "bucket_rng_state": self.bucket_rng.getstate(),
            }
        )
        return state_dict

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        num_buckets = state_dict.pop("num_buckets")
        assert self.num_buckets == num_buckets, (
            "Error in BucketingSampler.load_state_dict(): Inconsistent number "
            f"of buckets: current sampler has {self.num_buckets}, the "
            f"state_dict has {num_buckets}."
        )
        self.sampler_kwargs = state_dict.pop("sampler_kwargs")
        self.depleted = state_dict.pop("depleted")
        rng_state = state_dict.pop("bucket_rng_state")
        # JSON round-trips turn tuples into lists; random.setstate needs tuples.
        if isinstance(rng_state, list):
            rng_state = (rng_state[0], tuple(rng_state[1]), rng_state[2])
        self.bucket_rng.setstate(rng_state)

        samplers_sd = state_dict.pop("bucket_samplers")
        assert len(self.bucket_samplers) == len(samplers_sd), (
            "Error in BucketingSampler.load_state_dict(): Inconsistent number "
            f"of samplers: current sampler has {len(self.bucket_samplers)}, "
            f"the state_dict has {len(samplers_sd)}."
        )
        for sampler, sampler_sd in zip(self.bucket_samplers, samplers_sd):
            sampler.load_state_dict(sampler_sd)

        super().load_state_dict(state_dict)

    def __iter__(self) -> "BucketingSampler":
        if self._just_restored_state:
            return self
        self.diagnostics.reset_current_epoch()
        self.bucket_rng.seed(self.seed + self.epoch)
        for b in self.bucket_samplers:
            iter(b)
        self.depleted = [False] * self.num_buckets
        return self

    def _select_bucket_with_idx(self) -> Tuple[int, CutSampler]:
        if self.cut_sets[0].is_lazy:
            return self.bucket_rng.choice(self._nondepleted_samplers_with_idxs)
        idx_sampler_pairs = self._nondepleted_samplers_with_idxs
        if len(idx_sampler_pairs) == 1:
            return idx_sampler_pairs[0]
        # Approximate proportional sampling: draw two candidate buckets and
        # prefer the one with more data left, so buckets deplete together.
        idx1, sampler1 = self.bucket_rng.choice(idx_sampler_pairs)
        idx2, sampler2 = self.bucket_rng.choice(idx_sampler_pairs)
        try:
            prob1 = sampler1.remaining_duration / (
                sampler1.remaining_duration + sampler2.remaining_duration
            )
        except ZeroDivisionError:
            # Both candidates are empty but not yet marked depleted (that only
            # happens when next() raises). Just pick one.
            return idx1, sampler1
        if self.bucket_rng.random() > prob1:
            return idx2, sampler2
        else:
            return idx1, sampler1

    def _next_batch(self):
        self.allow_iter_to_reset_state()
        while not self.is_depleted:
            idx, sampler = self._select_bucket_with_idx()
            try:
                return next(sampler)
            except StopIteration:
                self.depleted[idx] = True
        raise StopIteration()

    @property
    def is_depleted(self) -> bool:
        return all(self.depleted)

    @property
    def _nondepleted_samplers_with_idxs(self):
        return [
            (idx, bs)
            for idx, (bs, depleted) in enumerate(zip(self.bucket_samplers, self.depleted))
            if not depleted
        ]

    def _log_diagnostics(self, batch: Union[CutSet, Tuple[CutSet, ...]]) -> None:
        return  # sub-samplers log their own

    @property
    def diagnostics(self) -> SamplingDiagnostics:
        return reduce(add, (bucket.diagnostics for bucket in self.bucket_samplers))

    def get_report(self) -> str:
        return self.diagnostics.get_report()


def create_buckets_equal_duration(
    *cuts: CutSet, num_buckets: int
) -> List[Tuple[CutSet, ...]]:
    """
    Partition CutSets into buckets of equal cumulative duration. The first
    CutSet defines the bucketing; additional CutSets (paired by cut ID)
    follow its assignment.
    """
    first_cut_set = cuts[0].sort_by_duration(ascending=True)
    buckets_per_cutset = [
        _create_buckets_equal_duration_single(first_cut_set, num_buckets=num_buckets)
    ]
    for cut_set in cuts[1:]:
        buckets_per_cutset.append(
            [
                cut_set.subset(cut_ids=bucket.ids)
                for bucket in buckets_per_cutset[0]
            ]
        )
    return list(zip(*buckets_per_cutset))


def _create_buckets_equal_duration_single(
    cuts: CutSet, num_buckets: int
) -> List[CutSet]:
    """
    Fill buckets from both ends of the duration-sorted list toward the middle,
    so overflow near the median is split between the two central buckets
    instead of piling up in the last one.
    """
    total_duration = np.sum([c.duration for c in cuts])
    bucket_duration = total_duration / num_buckets
    order = list(range(0, len(cuts), 2)) + list(
        range(len(cuts) - (1 + len(cuts) % 2), 0, -2)
    )
    order2idx = {o_idx: i for i, o_idx in enumerate(order)}
    durations = [c.duration for c in cuts]

    ordered_cut_durations = sorted(zip(order, durations), key=lambda x: x[0])
    first_bucket = 0
    last_bucket = num_buckets - 1
    buckets_dict = {i: 0 for i in range(num_buckets)}
    buckets_cut_dict = {i: [] for i in range(num_buckets)}
    middle_bucket = None
    idx_to_bucket_id = {}
    for i, (order_idx, duration) in enumerate(ordered_cut_durations, 1):
        if middle_bucket is None and first_bucket == last_bucket:
            middle_bucket = first_bucket

        if i % 2:  # fill from the left (short cuts)
            if buckets_dict[first_bucket] + duration > bucket_duration:
                if middle_bucket is not None and first_bucket == middle_bucket:
                    first_bucket = max(0, min(middle_bucket - 1, num_buckets - 1))
                else:
                    first_bucket = min(first_bucket + 1, num_buckets - 1)
            buckets_dict[first_bucket] += duration
            idx_to_bucket_id[order2idx[order_idx]] = first_bucket
        else:  # fill from the right (long cuts)
            if buckets_dict[last_bucket] + duration > bucket_duration:
                if middle_bucket is not None and last_bucket == middle_bucket:
                    last_bucket = max(middle_bucket + 1, 0)
                else:
                    last_bucket = max(last_bucket - 1, 0)
            buckets_dict[last_bucket] += duration
            idx_to_bucket_id[order2idx[order_idx]] = last_bucket

    for cut_idx, cut in enumerate(cuts):
        buckets_cut_dict[idx_to_bucket_id[cut_idx]].append(cut)
    return [CutSet.from_cuts(buckets_cut_dict[i]) for i in range(num_buckets)]
