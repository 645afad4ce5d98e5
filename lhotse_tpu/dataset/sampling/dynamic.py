"""
DynamicCutSampler: streaming constraint-batching over one or more CutSets.

Reference behavior: `/root/reference/lhotse/dataset/sampling/dynamic.py`
(DynamicCutSampler :35-288, DurationBatcher :292-385, Filter :388-417).
Supports lazy inputs, joint iteration of multiple CutSets (pairs/triplets),
buffered streaming shuffle per epoch, and two checkpoint-restore paths
(O(1) indexed graph restore, O(N) replay) via
:mod:`lhotse_tpu.dataset.sampling.checkpoint_backends`.
"""
import random
import warnings
from collections import deque
from typing import (
    Any,
    Callable,
    Dict,
    Generator,
    Iterable,
    List,
    Optional,
    Tuple,
    Union,
)

from lhotse_tpu.cut import Cut, CutSet
from lhotse_tpu.dataset.dataloading import resolve_seed
from lhotse_tpu.dataset.sampling.base import (
    CutSampler,
    SamplingConstraint,
    SamplingDiagnostics,
    TimeConstraint,
    capture_sources_state,
    restore_sources_state,
)
from lhotse_tpu.dataset.sampling.checkpoint_backends import plan_resume
from lhotse_tpu.lazy import LazyShuffler, resolve_iterator_source
from lhotse_tpu.utils import Seconds, ifnone


class DynamicCutSampler(CutSampler):
    """
    Streaming sampler with no stratification: zips one or more (lazy) CutSets,
    filters, and batches by a :class:`SamplingConstraint`. With multiple input
    CutSets it yields tuples of CutSets (for paired-utterance tasks); the
    constraint is measured on the first CutSet only.

    Single-CutSet use::

        >>> sampler = DynamicCutSampler(cuts, max_duration=100)
        >>> for batch in sampler: assert isinstance(batch, CutSet)

    Paired use (cut IDs must line up; checked unless consistent_ids=False)::

        >>> sampler = DynamicCutSampler(src_cuts, tgt_cuts, max_duration=100)
    """

    def __init__(
        self,
        *cuts: Iterable,
        max_duration: Optional[Seconds] = None,
        max_cuts: Optional[int] = None,
        constraint: Optional[SamplingConstraint] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        consistent_ids: bool = True,
        shuffle_buffer_size: int = 20000,
        quadratic_duration: Optional[Seconds] = None,
        world_size: Optional[int] = None,
        rank: Optional[int] = None,
        seed: Union[int, str] = 0,
    ) -> None:
        super().__init__(
            drop_last=drop_last, world_size=world_size, rank=rank, seed=seed
        )
        if not all(cs.is_lazy for cs in cuts if isinstance(cs, CutSet)):
            warnings.warn(
                "You are using DynamicCutSampler with an eagerly read CutSet. "
                "You won't see any memory/speed benefits with that setup. "
                "Use e.g. 'CutSet.from_jsonl_lazy' to read the CutSet lazily."
            )
        self.cuts = cuts
        self.max_duration = max_duration
        self.max_cuts = max_cuts
        self.constraint = constraint
        self.shuffle = shuffle
        self.consistent_ids = consistent_ids
        self.shuffle_buffer_size = shuffle_buffer_size
        self.quadratic_duration = quadratic_duration
        self._active_cuts = None

    def state_dict(self) -> Dict[str, Any]:
        # Custom constraint objects are reconstructed from config, not stored;
        # the iteration state (epoch/diagnostics/source-graph) drives resume.
        sd = super().state_dict()
        sd.update(
            {
                "max_duration": self.max_duration,
                "max_cuts": self.max_cuts,
                "consistent_ids": self.consistent_ids,
                "shuffle_buffer_size": self.shuffle_buffer_size,
                "quadratic_duration": self.quadratic_duration,
            }
        )
        return sd

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.max_duration = sd.pop("max_duration")
        self.max_cuts = sd.pop("max_cuts")
        self.consistent_ids = sd.pop("consistent_ids")
        self.shuffle_buffer_size = sd.pop("shuffle_buffer_size")
        self.quadratic_duration = sd.pop("quadratic_duration")
        super().load_state_dict(sd)
        # Defer the restore work to __iter__ so the sampler stays picklable
        # for multiprocess dataloading.
        self._needs_fast_forward = True

    def _fast_forward(self):
        current_epoch = self.diagnostics.current_epoch
        num_batches_to_iter = self.diagnostics.current_epoch_stats.total_batches
        self.set_epoch(current_epoch)
        plan_resume(
            self, "dynamic", epoch=current_epoch, steps_done=num_batches_to_iter
        ).run()

    def _initialize_replay_iterator(self) -> None:
        self._cuts_state = None
        self._just_restored_state = False
        self._active_cuts = None
        self._initialize_epoch_iterator(rebuild_sources=True)

    def _replay_step(self) -> None:
        next(self)

    def _make_epoch_sources(self):
        if not self.shuffle:
            return list(self.cuts)

        seed = resolve_seed(self.seed)
        epoch_sources = []
        for src in self.cuts:
            shuffler = LazyShuffler(
                resolve_iterator_source(src),
                buffer_size=self.shuffle_buffer_size,
                rng=random.Random(seed + self.epoch),
            )
            if isinstance(src, CutSet):
                epoch_sources.append(CutSet(shuffler))
            else:
                epoch_sources.append(shuffler)
        return epoch_sources

    def _initialize_epoch_iterator(self, *, rebuild_sources: bool) -> None:
        if rebuild_sources or self._active_cuts is None:
            self._active_cuts = self._make_epoch_sources()
        self.cuts_iter = [iter(resolve_iterator_source(cs)) for cs in self._active_cuts]
        self.cuts_iter = Filter(
            iterator=zip(*self.cuts_iter),
            predicate=lambda tpl: all(self._filter_fn(c) for c in tpl),
            diagnostics=self.diagnostics,
        )
        self.cuts_iter = DurationBatcher(
            self.cuts_iter,
            max_duration=self.max_duration,
            max_cuts=self.max_cuts,
            constraint=self.constraint,
            drop_last=self.drop_last,
            quadratic_duration=self.quadratic_duration,
            diagnostics=self.diagnostics,
        )
        self.cuts_iter = iter(self.cuts_iter)

    def _capture_cuts_state(self) -> Optional[list]:
        sources = self._active_cuts if self._active_cuts is not None else self.cuts
        return capture_sources_state(sources)

    def _restore_cuts_state(self, cuts_state: list) -> None:
        self._active_cuts = self._make_epoch_sources()
        restore_sources_state(self._active_cuts, cuts_state)

    def __iter__(self) -> "DynamicCutSampler":
        if getattr(self, "_needs_fast_forward", False):
            self._needs_fast_forward = False
            self._fast_forward()
            return self
        if self._just_restored_state:
            return self
        # Re-iterating the current epoch resets its stats (otherwise restore
        # would replay more steps than the epoch contains).
        if getattr(self, "_skip_diagnostics_reset_once", False):
            self._skip_diagnostics_reset_once = False
        else:
            self.diagnostics.reset_current_epoch()
        self._initialize_epoch_iterator(rebuild_sources=True)
        return self

    def _next_batch(self) -> Union[CutSet, Tuple[CutSet]]:
        batch = next(self.cuts_iter)
        if self.consistent_ids and isinstance(batch, tuple):
            for cuts in zip(*batch):
                expected_id = cuts[0].id
                assert all(c.id == expected_id for c in cuts[1:]), (
                    f"The input CutSets are not sorted by cut ID in the same way. "
                    f"We sampled the following mismatched cut IDs: "
                    f"{', '.join(c.id for c in cuts)}. If this is expected, pass "
                    f"'consistent_ids=False'."
                )
        return batch

    @property
    def remaining_duration(self) -> Optional[float]:
        return None

    @property
    def remaining_cuts(self) -> Optional[int]:
        return None

    @property
    def num_cuts(self) -> Optional[int]:
        return None


class DurationBatcher:
    """Greedy constraint-batching over a cut (or cut-tuple) iterator."""

    def __init__(
        self,
        datapipe: Iterable[Union[Cut, Tuple[Cut]]],
        max_duration: Seconds = None,
        max_cuts: Optional[int] = None,
        constraint: Optional[SamplingConstraint] = None,
        drop_last: bool = False,
        quadratic_duration: Optional[Seconds] = None,
        diagnostics: Optional[SamplingDiagnostics] = None,
    ) -> None:
        self.datapipe = datapipe
        self.reuse_cuts_buffer = deque()
        self.drop_last = drop_last
        self.diagnostics = ifnone(diagnostics, SamplingDiagnostics())
        check_constraint(constraint, max_duration, max_cuts)
        if constraint is not None:
            self.constraint = constraint
        else:
            self.constraint = TimeConstraint(
                max_duration=max_duration,
                max_cuts=max_cuts,
                quadratic_duration=quadratic_duration,
            )

    def __iter__(self) -> Generator[Union[CutSet, Tuple[CutSet]], None, None]:
        self.cuts_iter = iter(self.datapipe)
        try:
            while True:
                yield self._collect_batch()
        except StopIteration:
            pass
        self.cuts_iter = None

    def _collect_batch(self) -> Union[CutSet, Tuple[CutSet]]:
        def detuplify(cuts: List[Union[Cut, Tuple[Cut]]]) -> Union[CutSet, Tuple[CutSet]]:
            if isinstance(cuts[0], tuple):
                if len(cuts[0]) == 1:
                    return CutSet.from_cuts(cs[0] for cs in cuts)
                tuple_of_cut_lists = list(zip(*cuts))
                return tuple(CutSet.from_cuts(cs) for cs in tuple_of_cut_lists)
            return CutSet.from_cuts(cuts)

        self.constraint.reset()
        cuts = []
        while True:
            try:
                next_cut_or_tpl = next(self.cuts_iter)
            except StopIteration:
                if cuts and (not self.drop_last or self.constraint.close_to_exceeding()):
                    return detuplify(cuts)
                else:
                    try:
                        self.diagnostics.discard(cuts)
                    except AttributeError:  # cuts may hold tuples
                        self.diagnostics.discard(cuts[0])
                    raise StopIteration()

            cuts.append(next_cut_or_tpl)
            self.constraint.add(
                next_cut_or_tpl[0]
                if isinstance(next_cut_or_tpl, tuple)
                else next_cut_or_tpl
            )

            if self.constraint.close_to_exceeding():
                if self.constraint.exceeded() and len(cuts) == 1:
                    warnings.warn(
                        "We have exceeded the max_duration constraint during "
                        "sampling but have only 1 cut. This is likely because "
                        "max_duration was set to a very low value ~10s, or "
                        "you're using a CutSet with very long cuts (e.g. 100s "
                        "of seconds long)."
                    )
                break

        return detuplify(cuts)


class Filter(Iterable):
    """Lazy filter that also records discarded items in the diagnostics."""

    def __init__(
        self,
        iterator: Iterable,
        predicate: Callable[[Cut], bool],
        diagnostics: Optional[SamplingDiagnostics] = None,
    ) -> None:
        self.iterator = iterator
        self.predicate = predicate
        self.diagnostics = ifnone(diagnostics, SamplingDiagnostics())
        assert callable(self.predicate), (
            f"Filter: 'predicate' arg must be callable (got {predicate})."
        )

    def __iter__(self) -> Iterable:
        for item in self.iterator:
            if self.predicate(item):
                yield item
            else:
                if isinstance(item, tuple):
                    for c in item:
                        self.diagnostics.discard_single(c)
                else:
                    self.diagnostics.discard_single(item)


def check_constraint(constraint, max_duration, max_cuts) -> None:
    if constraint is not None:
        assert max_duration is None and max_cuts is None, (
            "Cannot specify both constraint= and max_duration=/max_cuts="
        )
    else:
        assert max_duration is not None or max_cuts is not None, (
            "At least one of max_duration= or max_cuts= has to be defined "
            "(or provide constraint=)."
        )
