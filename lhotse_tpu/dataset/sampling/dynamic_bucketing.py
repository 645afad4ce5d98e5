"""
DynamicBucketingSampler: streaming bucketing by duration with bounded memory.

Reference behavior: `/root/reference/lhotse/dataset/sampling/dynamic_bucketing.py`
(DynamicBucketingSampler :48-383, FixedBucketBatchSizeConstraint :386-492,
estimate_duration_buckets :495-536, BucketSelectionState :539-574,
DynamicBucketer :577-980, pick_at_random :983-998).

Algorithm: estimate K duration-bin boundaries from the first N cuts, keep a
buffer of M cuts split across K+1 bucket queues, sample a batch from one
bucket per step and refill by the same amount. Rank-synchronized bucket
selection uses a dedicated RNG consumed identically on every rank
(``sync_buckets``), with a checkpointed scan fallback so ranks can never
drift. Checkpointing supports O(1) indexed restore: bucket contents are
saved as graph-origin tokens and re-fetched via constant-time source access.

TPU-first note: the duration bins double as the **shape vocabulary** — every
batch drawn from bucket *i* pads to that bucket's upper bound, so XLA compiles
exactly ``num_buckets`` programs instead of one per unique batch shape
(see the collators in :mod:`lhotse_tpu.dataset.collation`).
"""
import random
import threading
import time
import warnings
from dataclasses import asdict, dataclass
from itertools import islice
from queue import Queue
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

import numpy as np

from lhotse_tpu.cut import Cut, CutSet
from lhotse_tpu.dataset.dataloading import resolve_seed
from lhotse_tpu.dataset.sampling.base import (
    CutSampler,
    SamplingConstraint,
    SamplingDiagnostics,
    TimeConstraint,
)
from lhotse_tpu.dataset.sampling.checkpoint_backends import plan_resume
from lhotse_tpu.dataset.sampling.dynamic import (
    DurationBatcher,
    Filter,
    check_constraint,
)
from lhotse_tpu.lazy import (
    IteratorNode,
    require_graph_origin,
    resolve_iterator_source,
    supports_graph_restore,
)
from lhotse_tpu.utils import Seconds, ifnone


class DynamicBucketingSampler(CutSampler):
    """
    Streaming bucketing sampler: bounded-memory alternative to
    :class:`~lhotse_tpu.dataset.sampling.bucketing.BucketingSampler` that never
    materializes the full CutSet. Supports single CutSets and zipped
    tuples of CutSets (paired utterances)::

        >>> sampler = DynamicBucketingSampler(cuts, max_duration=100)
        >>> for batch in sampler: assert isinstance(batch, CutSet)
    """

    def __init__(
        self,
        *cuts: Iterable,
        max_duration: Optional[Seconds] = None,
        max_cuts: Optional[int] = None,
        constraint: Optional[SamplingConstraint] = None,
        num_buckets: Optional[int] = 10,
        shuffle: bool = False,
        drop_last: bool = False,
        consistent_ids: bool = True,
        duration_bins: List[Seconds] = None,
        num_cuts_for_bins_estimate: int = 10000,
        buffer_size: int = 20000,
        quadratic_duration: Optional[Seconds] = None,
        world_size: Optional[int] = None,
        rank: Optional[int] = None,
        seed: Union[int, str] = 0,
        sync_buckets: bool = True,
        concurrent: bool = False,
    ) -> None:
        super().__init__(
            drop_last=drop_last, world_size=world_size, rank=rank, seed=seed
        )
        if not all(cs.is_lazy for cs in cuts if isinstance(cs, CutSet)):
            warnings.warn(
                "You are using DynamicBucketingSampler with an eagerly read CutSet. "
                "You won't see any memory/speed benefits with that setup. "
                "Either use 'CutSet.from_jsonl_lazy' to read the CutSet lazily, or "
                "use a BucketingSampler instead."
            )
        self.cuts = cuts
        self.max_duration = max_duration
        self.max_cuts = max_cuts
        self.constraint = constraint
        self.shuffle = shuffle
        self.consistent_ids = consistent_ids
        self.num_cuts_for_bins_estimate = num_cuts_for_bins_estimate
        self.buffer_size = buffer_size
        self.quadratic_duration = quadratic_duration
        self.sync_buckets = sync_buckets
        self.concurrent = concurrent
        self.rng = None
        check_constraint(constraint, max_duration, max_cuts)

        if duration_bins is not None:
            assert list(duration_bins) == sorted(duration_bins), (
                "Duration bins must be sorted ascendingly."
            )
            self.duration_bins = duration_bins
            self.num_buckets = len(duration_bins) + 1
        else:
            if constraint is None:
                constraint = TimeConstraint(
                    max_duration=self.max_duration,
                    max_cuts=self.max_cuts,
                    quadratic_duration=self.quadratic_duration,
                )
            self.duration_bins = estimate_duration_buckets(
                islice(self.cuts[0], num_cuts_for_bins_estimate),
                num_buckets=num_buckets,
                constraint=constraint,
            )
            self.num_buckets = len(self.duration_bins) + 1

    def state_dict(self) -> Dict[str, Any]:
        # The custom-constraint object is reconstructed from config each run;
        # rng_state + bucketer_state + diagnostics drive exact resume.
        sd = super().state_dict()
        sd.update(
            {
                "max_duration": self.max_duration,
                "max_cuts": self.max_cuts,
                "consistent_ids": self.consistent_ids,
                "buffer_size": self.buffer_size,
                "num_cuts_for_bins_estimate": self.num_cuts_for_bins_estimate,
                "quadratic_duration": self.quadratic_duration,
            }
        )
        # Only save bucketer internals after its iteration started — before
        # that the buckets are empty and restoring them would look like an
        # exhausted iterator.
        bucketer = getattr(self, "_bucketer", None)
        if (
            bucketer is not None
            and self.rng is not None
            and getattr(bucketer, "_selection_state", None) is not None
        ):
            try:
                bucketer_state = bucketer.get_state()
                sd["rng_state"] = self.rng.getstate()
                sd["bucketer_state"] = bucketer_state
            except RuntimeError:
                # O(N) fallback is acceptable only for an all-streaming
                # pipeline; one restorable leaf means a wiring bug — surface
                # it now rather than silently degrading.
                if any(_leaf_constant_time_flags(self.cuts)):
                    raise
            except (AttributeError, TypeError):
                pass  # fall back to O(N) replay on load
        if "rng_state" not in sd and "bucketer_state" not in sd:
            # Preserve a pending (deferred) O(1) payload so that
            # state_dict() round-trips before the next __iter__.
            pending_rng_state = getattr(self, "_rng_state", None)
            pending_bucketer_state = getattr(self, "_bucketer_state", None)
            if pending_rng_state is not None and pending_bucketer_state is not None:
                sd["rng_state"] = pending_rng_state
                sd["bucketer_state"] = pending_bucketer_state
        return sd

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.max_duration = sd.pop("max_duration")
        self.max_cuts = sd.pop("max_cuts")
        self.consistent_ids = sd.pop("consistent_ids")
        self.num_cuts_for_bins_estimate = sd.pop("num_cuts_for_bins_estimate")
        self.buffer_size = sd.pop("buffer_size")
        self.quadratic_duration = sd.pop("quadratic_duration", None)
        self._rng_state = sd.pop("rng_state", None)
        self._bucketer_state = sd.pop("bucketer_state", None)
        super().load_state_dict(sd)
        # Defer the restore to __iter__ so the sampler stays picklable.
        self._needs_fast_forward = True

    def _fast_forward(self):
        current_epoch = self.diagnostics.current_epoch
        num_batches_to_iter = self.diagnostics.current_epoch_stats.total_batches
        self.set_epoch(current_epoch)
        plan_resume(
            self, "bucketing", epoch=current_epoch, steps_done=num_batches_to_iter
        ).run()

    def _initialize_replay_iterator(self) -> None:
        self._cuts_state = None
        self._rng_state = None
        self._bucketer_state = None
        self._just_restored_state = False
        iter(self)

    def _replay_step(self) -> None:
        next(self)

    def __iter__(self) -> "DynamicBucketingSampler":
        if getattr(self, "_needs_fast_forward", False):
            self._needs_fast_forward = False
            self._fast_forward()
            return self
        if self._just_restored_state:
            return self
        seed = resolve_seed(self.seed)
        self.rng = random.Random(seed + self.epoch)
        if self.sync_buckets:
            # Dedicated bucket-selection RNG seeded identically across ranks
            # (per worker-id when inside a dataloading worker) so all ranks
            # draw from matching duration buckets each step.
            from lhotse_tpu.dataset.dataloading import get_worker_info

            bucket_rng_seed = 1234
            worker_info = get_worker_info()
            if worker_info is not None:
                bucket_rng_seed += worker_info.id
            bucket_rng = random.Random(bucket_rng_seed)
        else:
            bucket_rng = None
        # Re-iterating the current epoch resets its stats (otherwise restore
        # would replay more steps than the epoch contains).
        if getattr(self, "_skip_diagnostics_reset_once", False):
            self._skip_diagnostics_reset_once = False
        else:
            self.diagnostics.reset_current_epoch()
        restore_sources = [resolve_iterator_source(cs) for cs in self.cuts]
        cuts_iter = [iter(src) for src in restore_sources]
        cuts_iter = Filter(
            iterator=zip(*cuts_iter),
            predicate=lambda tpl: all(self._filter_fn(c) for c in tpl),
            diagnostics=self.diagnostics,
        )
        self._bucketer = DynamicBucketer(
            cuts_iter,
            duration_bins=self.duration_bins,
            world_size=self.world_size,
            max_duration=self.max_duration,
            max_cuts=self.max_cuts,
            constraint=self.constraint,
            drop_last=self.drop_last,
            buffer_size=self.buffer_size,
            quadratic_duration=self.quadratic_duration,
            shuffle=self.shuffle,
            rng=self.rng,
            bucket_rng=bucket_rng,
            concurrent=self.concurrent,
            diagnostics=self.diagnostics,
            restore_sources=restore_sources,
        )
        self.cuts_iter = iter(self._bucketer)
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


@dataclass
class FixedBucketBatchSizeConstraint(SamplingConstraint):
    """
    Pre-defined batch size per bucket: the example's length selects the
    bucket, and the batch size is locally static within it. On TPU this is
    the most compiler-friendly constraint — each bucket yields a fixed
    (batch, length) shape, so XLA compiles one program per bucket.
    Examples longer than the last bucket's bound raise an error.
    """

    max_seq_len_buckets: List[float]
    batch_sizes: List[int]
    current_bucket: Union[int, None] = None
    num_cuts: int = 0

    def __post_init__(self):
        assert sorted(self.max_seq_len_buckets) == list(self.max_seq_len_buckets)

    def is_active(self) -> bool:
        return True

    def add(self, example: Cut) -> None:
        seqlen = self.measure_length(example)
        bucket_idx = self.select_bucket(
            buckets=self.max_seq_len_buckets, example_len=seqlen
        )
        assert bucket_idx < len(self.max_seq_len_buckets), (
            f"Received example with sequence length {seqlen} that exceeds "
            f"the highest allowed length {self.max_seq_len_buckets[-1]}."
        )
        if self.current_bucket is None:
            self.current_bucket = bucket_idx
        else:
            assert self.current_bucket == bucket_idx, (
                f"User error: FixedBucketBatchSizeConstraint is supposed to be "
                f"used only on one bucket. The example we received has sequence "
                f"length {seqlen} which is outside of the allowed bounds for "
                f"bucket index {bucket_idx} in buckets {self.max_seq_len_buckets}."
            )
        self.num_cuts += 1

    def exceeded(self) -> bool:
        return self.num_cuts > self.batch_sizes[self.current_bucket]

    def close_to_exceeding(self) -> bool:
        return self.num_cuts >= self.batch_sizes[self.current_bucket]

    def reset(self) -> None:
        self.current_bucket = None
        self.num_cuts = 0

    def measure_length(self, example: Cut) -> float:
        return example.duration

    def state_dict(self) -> Dict[str, Any]:
        return asdict(self)

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        self.max_seq_len_buckets = state_dict.pop("max_seq_len_buckets")
        self.batch_sizes = state_dict.pop("batch_sizes")
        self.current_bucket = state_dict.pop("current_bucket")
        self.num_cuts = state_dict.pop("num_cuts")
        assert len(state_dict) == 0, (
            "Error in FixedBucketBatchSizeConstraint.load_state_dict(): "
            "Unexpected keys:\n- " + "\n- ".join(state_dict.keys())
        )

    def __add__(
        self, other: "FixedBucketBatchSizeConstraint"
    ) -> "FixedBucketBatchSizeConstraint":
        for key in ("max_seq_len_buckets", "batch_sizes", "current_bucket"):
            self_attr = getattr(self, key)
            other_attr = getattr(other, key)
            is_none = self_attr is None and other_attr is None
            assert is_none or self_attr == other_attr, (
                f"To add two FixedBucketBatchSizeConstraint objects, they need "
                f"to represent the same constraint "
                f"(got self.{key}={self_attr} != other.{key}={other_attr})."
            )
        return FixedBucketBatchSizeConstraint(
            max_seq_len_buckets=self.max_seq_len_buckets,
            batch_sizes=self.batch_sizes,
            current_bucket=self.current_bucket,
            num_cuts=self.num_cuts + other.num_cuts,
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, FixedBucketBatchSizeConstraint)
            and self.max_seq_len_buckets == other.max_seq_len_buckets
            and self.batch_sizes == other.batch_sizes
            and self.current_bucket == other.current_bucket
        )


def estimate_duration_buckets(
    cuts: Iterable[Cut],
    num_buckets: int,
    constraint: Optional[SamplingConstraint] = None,
) -> List[float]:
    """
    Select ``num_buckets - 1`` boundary lengths such that each bucket holds
    roughly equal total size. Bucket ``i`` contains examples with
    ``bins[i-1] <= len < bins[i]`` (first bucket from 0, last to infinity).
    """
    assert num_buckets > 1

    if constraint is None:
        constraint = TimeConstraint()

    sizes = np.array([constraint.measure_length(c) for c in cuts])
    sizes.sort()
    assert num_buckets <= sizes.shape[0], (
        f"The number of buckets ({num_buckets}) must be smaller than "
        f"or equal to the number of cuts ({sizes.shape[0]})."
    )
    size_per_bucket = sizes.sum() / num_buckets

    bins = []
    tot = 0.0
    for size in sizes:
        if tot > size_per_bucket:
            bins.append(size)
            tot = 0.0
        tot += size

    return bins


class BucketSelectionState:
    """
    Rank-synchronized bucket choice: with a map-style dataset the sampler runs
    in the training process and draws ``world_size`` batches per step, so the
    same bucket index must be reused ``world_size`` times to keep all ranks on
    matching buckets.
    """

    def __init__(
        self, bucket_rng: random.Random, num_buckets: int, world_size: int
    ) -> None:
        self._bucket_rng = bucket_rng
        self._num_buckets = num_buckets
        self._world_size = world_size
        self._usage_count = 0
        self._bucket_idx = None

    def select_bucket_idx(self) -> int:
        if self._bucket_idx is None or self._usage_count == self._world_size:
            self._bucket_idx = self._bucket_rng.randrange(self._num_buckets)
            self._usage_count = 0
        self._usage_count += 1
        return self._bucket_idx

    def save(self) -> Dict[str, Any]:
        return {
            "_bucket_rng": self._bucket_rng.getstate(),
            "_bucket_idx": self._bucket_idx,
            "_usage_count": self._usage_count,
        }

    def restore(self, ckpt: Dict[str, Any]) -> None:
        self._bucket_rng.setstate(ckpt["_bucket_rng"])
        self._bucket_idx = ckpt["_bucket_idx"]
        self._usage_count = ckpt["_usage_count"]


class DynamicBucketer:
    """Bounded-memory bucket buffer + per-step batch draw and refill."""

    def __init__(
        self,
        cuts: Iterable[Union[Cut, Tuple[Cut]]],
        duration_bins: List[Seconds],
        world_size: int,
        max_duration: Optional[Seconds] = None,
        max_cuts: Optional[int] = None,
        constraint: Optional[SamplingConstraint] = None,
        drop_last: bool = False,
        buffer_size: int = 10000,
        quadratic_duration: Optional[Seconds] = None,
        shuffle: bool = False,
        rng: random.Random = None,
        bucket_rng: random.Random = None,
        concurrent: bool = False,
        diagnostics: Optional[SamplingDiagnostics] = None,
        restore_sources: Optional[List[Iterable]] = None,
    ) -> None:
        self.cuts = cuts
        self.restore_sources = restore_sources
        self.duration_bins = duration_bins
        self.world_size = world_size
        self.max_duration = max_duration
        self.max_cuts = max_cuts
        self.constraint = constraint
        self.drop_last = drop_last
        self.buffer_size = buffer_size
        self.quadratic_duration = quadratic_duration
        self.diagnostics = ifnone(diagnostics, SamplingDiagnostics())
        if rng is None:
            rng = random.Random()
        self.rng = rng
        self.bucket_rng = bucket_rng
        self.shuffle = shuffle
        self.concurrent = concurrent

        assert duration_bins == sorted(duration_bins), (
            f"Argument list for 'duration_bins' is expected to be in "
            f"sorted order (got: {duration_bins})."
        )
        check_constraint(constraint, max_duration, max_cuts)

        if self.constraint is None:
            self.constraint = TimeConstraint(
                max_duration=self.max_duration,
                max_cuts=self.max_cuts,
                quadratic_duration=self.quadratic_duration,
            )

        # Heuristic sanity check for the buffer/batch size relation.
        if max_duration is not None and len(duration_bins) > 0:
            mean_duration = np.mean(duration_bins)
            expected_buffer_duration = buffer_size * mean_duration
            expected_bucket_duration = expected_buffer_duration / (
                len(duration_bins) + 1
            )
            if expected_bucket_duration < max_duration:
                warnings.warn(
                    f"Your 'buffer_size' setting of {buffer_size} might be too "
                    f"low to satisfy a 'max_duration' of {max_duration} (given "
                    f"our best guess)."
                )

        # num_buckets = len(duration_bins) + 1
        self.buckets: List[Queue] = [Queue() for _ in range(len(duration_bins) + 1)]

        self._producer_thread = None
        self._source_exhausted = False
        self._saved_state = None
        self._selection_state = None

    @staticmethod
    def _supports_graph_restore(source: Any) -> bool:
        return source is not None and supports_graph_restore(source)

    def _capture_item_token(self, item: Cut, source: Any) -> Any:
        if not self._supports_graph_restore(source):
            raise RuntimeError(
                "DynamicBucketer checkpoint requires graph-restorable sources "
                "when saving buffered O(1) restore state."
            )
        return require_graph_origin(item, "DynamicBucketer checkpoint", "buffered items")

    def _restore_item_token(self, token: Any, source: Any) -> Cut:
        if not self._supports_graph_restore(source):
            raise RuntimeError(
                "DynamicBucketer checkpoint captured a graph-local restore token, "
                "but the current iterator graph does not support constant-time "
                "restoration."
            )
        return source[token]

    # --- O(1) indexed checkpoint state -----------------------------------

    def get_state(self) -> Dict[str, Any]:
        """Capture bucket contents (as graph tokens) + RNG + selection state."""
        from lhotse_tpu.checkpoint import _rng_state_to_json

        bucket_tokens: List[List] = []
        for bucket in self.buckets:
            tokens = []
            with bucket.mutex:
                for item in bucket.queue:
                    cuts = item if isinstance(item, tuple) else (item,)
                    item_tokens = []
                    for cut_idx, cut in enumerate(cuts):
                        source = None
                        if self.restore_sources is not None:
                            source = self.restore_sources[cut_idx]
                        item_tokens.append(self._capture_item_token(cut, source))
                    tokens.append(item_tokens)
            bucket_tokens.append(tokens)

        state = {
            "bucket_tokens": bucket_tokens,
            "rng_state": _rng_state_to_json(self.rng.getstate()),
        }
        if self._selection_state is not None:
            state["selection_state"] = self._selection_state.save()
        return state

    def set_state(self, state: Dict[str, Any]) -> None:
        """Stash state; consumed at the top of the next __iter__ call."""
        self._saved_state = state

    def _restore_from_saved_state(self) -> "BucketSelectionState":
        from lhotse_tpu.checkpoint import _rng_state_from_json

        state = self._saved_state
        self._saved_state = None

        self.rng.setstate(_rng_state_from_json(state["rng_state"]))

        bucket_tokens = state["bucket_tokens"]
        if len(bucket_tokens) != len(self.buckets):
            raise RuntimeError(
                "DynamicBucketer checkpoint is inconsistent: "
                f"saved {len(bucket_tokens)} buckets, expected {len(self.buckets)}."
            )
        for bucket, tokens in zip(self.buckets, bucket_tokens):
            with bucket.mutex:
                bucket.queue.clear()
            for item_tokens in tokens:
                items = []
                for cut_idx, token in enumerate(item_tokens):
                    source = None
                    if self.restore_sources is not None:
                        source = self.restore_sources[cut_idx]
                    items.append(self._restore_item_token(token, source))
                # zip(*sources) always yields tuples even for one source;
                # keep the queue type-uniform across fill/refill/restore.
                bucket.put(tuple(items))

        selection_state = BucketSelectionState(
            bucket_rng=self.bucket_rng,
            num_buckets=len(self.buckets),
            world_size=self.world_size,
        )
        if "selection_state" in state:
            selection_state.restore(state["selection_state"])
        return selection_state

    # ---------------------------------------------------------------------

    def __iter__(self) -> Generator[CutSet, None, None]:
        self.cuts_iter = iter(self.cuts)

        if self._saved_state is not None:
            state = self._restore_from_saved_state()
            self._selection_state = state
        else:
            if self.concurrent:
                self._source_exhausted = False
                self._start_data_producer_thread()
                self._maybe_wait_for_producer()
            else:
                self._collect_cuts_in_buckets(self.buffer_size)

            state = BucketSelectionState(
                bucket_rng=self.bucket_rng,
                num_buckets=len(self.buckets),
                world_size=self.world_size,
            )
            self._selection_state = state

        try:
            while True:
                sampling_bucket = self._select_bucket(self._selection_state)
                maybe_shuffled = sampling_bucket
                indexes_used = []
                if self.shuffle:
                    maybe_shuffled = pick_at_random(
                        maybe_shuffled, rng=self.rng, out_indexes_used=indexes_used
                    )
                else:
                    with sampling_bucket.mutex:
                        maybe_shuffled = list(sampling_bucket.queue)
                batcher = DurationBatcher(
                    maybe_shuffled,
                    constraint=self.constraint.copy(),
                    diagnostics=self.diagnostics,
                )
                batch = next(iter(batcher))
                if isinstance(batch, tuple):
                    batch_size = len(batch[0])
                else:
                    batch_size = len(batch)
                # Commit the sampled batch before yielding so checkpoints
                # always point at the next batch.
                if indexes_used:
                    indexes_used.sort(reverse=True)
                    with sampling_bucket.mutex:
                        _q = sampling_bucket.queue
                        for idx in indexes_used:
                            del _q[idx]
                else:
                    for _ in range(batch_size):
                        sampling_bucket.get()
                stop_after_yield = False
                if self.concurrent:
                    try:
                        self._maybe_wait_for_producer()
                    except StopIteration:
                        stop_after_yield = True
                else:
                    try:
                        self._collect_cuts_in_buckets(batch_size)
                    except StopIteration:
                        stop_after_yield = True
                yield batch
                if stop_after_yield:
                    break
        except StopIteration:
            pass
        finally:
            if self.concurrent and self._producer_thread is not None and self._producer_thread.is_alive():
                self._source_exhausted = True
                self._producer_thread.join()
                self._producer_thread = None
            self.cuts_iter = None

    def _select_bucket(self, state: BucketSelectionState) -> Queue:
        if self.bucket_rng is None:
            # Algo 1: one RNG for everything; sample among buckets that hold
            # at least a full batch. No cross-rank sync guarantees.
            ready_buckets = [b for b in self.buckets if self._is_ready(b)]
            if not ready_buckets:
                non_empty_buckets = [b for b in self.buckets if b.qsize() > 0]
                if self.drop_last or len(non_empty_buckets) == 0:
                    raise StopIteration()
                ready_buckets = non_empty_buckets
            return self.rng.choice(ready_buckets)
        else:
            # Algo 2: dedicated, identically-seeded bucket RNG per rank.
            # A rank whose chosen bucket isn't ready scans outward through
            # neighbours; selection-state checkpointing guarantees the RNG is
            # consumed the same number of times on every rank even in the
            # partial-batch fallback.

            def scan_buckets(predicate: Callable[[Queue], bool]) -> int:
                bucket_idx = state.select_bucket_idx()

                def valid_idx() -> bool:
                    return 0 <= bucket_idx < len(self.buckets)

                num_attempts = 0
                seen_min, seen_max = bucket_idx, bucket_idx
                while not (valid_idx() and predicate(self.buckets[bucket_idx])):
                    if seen_min < 0 and seen_max >= len(self.buckets):
                        raise BucketsDontHaveEnoughData()
                    num_attempts += 1
                    bucket_idx = (
                        bucket_idx + (1 if num_attempts % 2 == 0 else -1) * num_attempts
                    )
                    seen_min = min(seen_min, bucket_idx)
                    seen_max = max(seen_max, bucket_idx)

                return bucket_idx

            ckpt = state.save()
            try:
                selected_bucket_idx = scan_buckets(self._is_ready)
            except BucketsDontHaveEnoughData:
                if self.drop_last:
                    raise StopIteration()
                try:
                    state.restore(ckpt)
                    selected_bucket_idx = scan_buckets(lambda b: b.qsize() > 0)
                except BucketsDontHaveEnoughData:
                    raise StopIteration()

            return self.buckets[selected_bucket_idx]

    def _is_ready(self, bucket: Queue) -> bool:
        tot = self.constraint.copy()
        tot.reset()
        with bucket.mutex:
            contents = list(bucket.queue)
        for c in contents:
            tot.add(c[0] if isinstance(c, tuple) else c)
            if tot.close_to_exceeding():
                return True
        return False

    def _start_data_producer_thread(self):
        """Concurrent buffer filling in a daemon thread (non-deterministic)."""

        def producer():
            try:
                while not self._source_exhausted:
                    if sum(b.qsize() for b in self.buckets) == self.buffer_size:
                        time.sleep(0.1)
                        continue
                    cuts = next(self.cuts_iter)
                    bucket_idx = self.constraint.select_bucket(
                        buckets=self.duration_bins,
                        example=cuts[0] if isinstance(cuts, tuple) else cuts,
                    )
                    self.buckets[bucket_idx].put(cuts)
            except StopIteration:
                self._source_exhausted = True

        self._producer_thread = threading.Thread(target=producer, daemon=True)
        self._producer_thread.start()

    def _maybe_wait_for_producer(self):
        """Block until the buffers are at least 10% utilized (or exhausted)."""
        while (
            sum(b.qsize() for b in self.buckets) < self.buffer_size / 10
            and not self._source_exhausted
        ):
            time.sleep(1.0)

    def _collect_cuts_in_buckets(self, n_cuts: int) -> None:
        """Synchronously fetch ``n_cuts`` items into their duration buckets."""
        try:
            for _ in range(n_cuts):
                cuts = next(self.cuts_iter)
                bucket_idx = self.constraint.select_bucket(
                    buckets=self.duration_bins,
                    example=cuts[0] if isinstance(cuts, tuple) else cuts,
                )
                self.buckets[bucket_idx].put(cuts)
        except StopIteration:
            pass

    def __del__(self):
        if (
            self.concurrent
            and self._producer_thread is not None
            and self._producer_thread.is_alive()
        ):
            self._source_exhausted = True
            self._producer_thread.join()


def pick_at_random(
    bucket: Queue,
    rng: random.Random,
    out_indexes_used: list,
) -> Generator[Union[Cut, Tuple[Cut, ...]], None, None]:
    """Yield bucket items in random order, recording used indexes."""
    with bucket.mutex:
        bucket = list(bucket.queue)
    indexes = list(range(len(bucket)))
    rng.shuffle(indexes)
    for idx in indexes:
        out_indexes_used.append(idx)
        yield bucket[idx]


class BucketsDontHaveEnoughData(Exception):
    pass


def _leaf_constant_time_flags(cuts) -> List[bool]:
    """One ``has_constant_time_access`` flag per leaf data source in the
    iterator graphs of ``cuts``; wrappers delegate the flag, so recurse."""
    flags: List[bool] = []

    def _walk(node):
        if hasattr(node, "data") and not callable(getattr(node, "data")):
            node = node.data
        children = None
        if isinstance(node, IteratorNode):
            srcs = getattr(node, "sources", None)
            if isinstance(srcs, (list, tuple)) and srcs:
                children = list(srcs)
            else:
                src = getattr(node, "source", None)
                if src is not None and not callable(src):
                    children = [src]
        if children:
            for c in children:
                _walk(c)
        else:
            flags.append(bool(getattr(node, "has_constant_time_access", False)))

    for cs in cuts:
        _walk(cs)
    return flags
