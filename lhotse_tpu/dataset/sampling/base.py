"""
CutSampler base: mini-batch sampling with distributed dedup + checkpointing.

Reference behavior: `/root/reference/lhotse/dataset/sampling/base.py` —
map-style DDP handling: sample ``world_size`` batches and return
``batches[rank]`` with deterministic end-of-data redistribution/duplication
(:396-451); rank/world_size resolution order explicit args → env →
distributed runtime → (1, 0) (:143); ``.filter``/``.map`` hooks (:188,207);
checkpointing incl. source graph state + transform RNG states (:215-316);
``SamplingConstraint``/``TimeConstraint``/``TokenConstraint`` (:490-780);
sampling diagnostics (:783-970).

TPU-native notes: the sampler is a plain iterable (no torch Sampler base);
rank discovery uses env vars then ``jax.process_index`` (via
:mod:`lhotse_tpu.dataset.dataloading`). ``TimeConstraint`` doubles as the
**static-shape contract**: its padded-batch cost model (num_cuts × longest
seen) is exactly the padded tensor size XLA will compile for.
"""
from __future__ import annotations

import copy
import warnings
from abc import ABCMeta, abstractmethod
from bisect import bisect_left
from copy import deepcopy
from dataclasses import asdict, dataclass
from math import isclose
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple, Union

from lhotse_tpu.cut import Cut, CutSet
from lhotse_tpu.cut.text import TextExample
from lhotse_tpu.lazy import Dillable, IteratorNode
from lhotse_tpu.utils import Seconds, exactly_one_not_null, ifnone, is_none_or_gt


def _capture_source_state(src) -> Optional[dict]:
    from lhotse_tpu.checkpoint import collect_state_dict

    if isinstance(src, CutSet):
        return src.state_dict()
    if isinstance(src, IteratorNode):
        return collect_state_dict(src)
    return None


def capture_sources_state(sources) -> Optional[list]:
    if not isinstance(sources, (list, tuple)):
        return None
    states = []
    has_any_state = False
    for src in sources:
        try:
            state = _capture_source_state(src)
        except Exception:
            state = None
        states.append(state)
        has_any_state = has_any_state or state is not None
    return states if has_any_state else None


def restore_sources_state(sources, cuts_state: Optional[list]) -> None:
    from lhotse_tpu.checkpoint import restore_state_dict

    if cuts_state is None:
        return
    for src, state in zip(sources, cuts_state):
        if state is None:
            continue
        if isinstance(src, CutSet):
            src.load_state_dict(state)
        elif isinstance(src, IteratorNode):
            restore_state_dict(src, state)


class CutSampler(Dillable):
    """
    Collects batches of cuts given constraints; metadata-only (no I/O).
    Distributed handling mirrors PyTorch DistributedSampler semantics but with
    dynamic batch sizes: every step samples ``world_size`` batches and keeps
    ``batches[rank]``. With ``shuffle=True``, call ``set_epoch(epoch)`` for a
    new ordering each epoch.
    """

    def __init__(
        self,
        shuffle: bool = False,
        drop_last: bool = False,
        world_size: Optional[int] = None,
        rank: Optional[int] = None,
        seed: Union[int, str] = 0,
    ) -> None:
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self._diagnostics = SamplingDiagnostics()
        # Set after load_state_dict so the next iter() doesn't reset state.
        self._just_restored_state = False
        self._maybe_init_distributed(world_size=world_size, rank=rank)
        self._filter_fn: Callable[[Cut], bool] = _filter_nothing()
        self._transforms = []

    @property
    def diagnostics(self):
        """Counts of kept/discarded cuts and batches per epoch."""
        return self._diagnostics

    def _maybe_init_distributed(self, world_size: Optional[int], rank: Optional[int]):
        from lhotse_tpu.dataset.dataloading import get_rank, get_world_size

        if world_size is not None:
            assert world_size >= 1
        if rank is not None:
            assert rank >= 0
        # Precedence: explicit args > env vars > JAX process runtime > (1, 0).
        self.world_size = ifnone(world_size, get_world_size())
        self.rank = ifnone(rank, get_rank())
        assert self.rank < self.world_size

    def set_epoch(self, epoch: int) -> None:
        """Set the epoch (changes the shuffling order when shuffle=True)."""
        if self._just_restored_state or getattr(self, "_needs_fast_forward", False):
            # Don't clobber just-restored iteration state.
            return
        if self.epoch != epoch:
            self.allow_iter_to_reset_state()
        self.epoch = epoch
        self.diagnostics.set_epoch(epoch)

    def filter(self, predicate: Callable[[Cut], bool]) -> "CutSampler":
        """Add a per-cut constraint that must be satisfied to consider a cut."""
        if isinstance(self._filter_fn, _filter_nothing):
            self._filter_fn = predicate
        else:
            self._filter_fn = _and(self._filter_fn, predicate)
        return self

    def map(self, fn: Callable[[CutSet], CutSet]) -> "CutSampler":
        """Apply ``fn`` to each mini-batch CutSet before yielding it."""
        assert callable(fn), (
            f"Expected a callable accepting and returning a CutSet, received: '{fn}'"
        )
        self._transforms.append(fn)
        return self

    def state_dict(self) -> Dict[str, Any]:
        """
        Sampler state for exact resume: epoch/topology/diagnostics, the
        source iterator graph state (when available — enables O(1) restore),
        and stateful transform RNG states.
        """
        sd = {
            "epoch": self.epoch,
            "drop_last": self.drop_last,
            "world_size": self.world_size,
            "rank": self.rank,
            "seed": self.seed,
            "shuffle": self.shuffle,
            "diagnostics": self.diagnostics.state_dict(),
        }
        cuts_state = self._capture_cuts_state()
        if cuts_state is not None:
            sd["cuts_state"] = cuts_state
        if self._transforms:
            transforms_state = []
            for tfn in self._transforms:
                if hasattr(tfn, "state_dict"):
                    transforms_state.append(tfn.state_dict())
                else:
                    transforms_state.append(None)
            sd["transforms_state"] = transforms_state
        return sd

    def _capture_cuts_state(self) -> Optional[list]:
        return capture_sources_state(getattr(self, "cuts", None))

    def _restore_cuts_state(self, cuts_state: Optional[list]) -> None:
        restore_sources_state(getattr(self, "cuts", ()), cuts_state)

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        """
        Restore sampler state (mutates/consumes the input dict). The sampler
        must be constructed with the same CutSets, world_size, rank, and seed.
        """
        self.drop_last = state_dict.pop("drop_last")
        world_size = state_dict.pop("world_size")
        assert self.world_size == world_size, (
            f"Cannot restore sampler with a different world_size (current "
            f"{self.world_size}, checkpoint {world_size})."
        )
        saved_rank = state_dict.pop("rank")
        if saved_rank != self.rank:
            raise RuntimeError(
                f"CutSampler.load_state_dict: state was saved on rank={saved_rank} "
                f"but is being loaded on rank={self.rank}."
            )
        assert self.seed == state_dict.pop("seed")
        shuffle = state_dict.pop("shuffle")
        if self.shuffle != shuffle:
            warnings.warn(
                "Overriding the shuffle value in CutSampler based on state_dict "
                f"(initialized to {self.shuffle}; restored to {shuffle})."
            )
        self.shuffle = shuffle
        self.epoch = state_dict.pop("epoch")
        self.diagnostics.load_state_dict(state_dict.pop("diagnostics"))
        self._cuts_state = state_dict.pop("cuts_state", None)
        self._transforms_state = state_dict.pop("transforms_state", None)
        assert len(state_dict) == 0, (
            "Error in CutSampler.load_state_dict(): Unexpected keys:\n- "
            + "\n- ".join(state_dict.keys())
        )
        self._just_restored_state = True

    def __iter__(self):
        raise NotImplementedError("Sub-classes of CutSampler must implement __iter__()")

    def _next_batch(self):
        raise NotImplementedError(
            "Sub-classes of CutSampler must implement self._next_batch()"
        )

    @property
    def remaining_duration(self) -> Optional[float]:
        raise NotImplementedError

    @property
    def remaining_cuts(self) -> Optional[int]:
        raise NotImplementedError

    @property
    def num_cuts(self) -> Optional[int]:
        raise NotImplementedError

    def _restore_transforms_state(self) -> None:
        """Restore stateful transform RNGs (O(1) indexed restore path only;
        the O(N) replay path advances them naturally)."""
        transforms_state = getattr(self, "_transforms_state", None)
        if transforms_state is None:
            return
        for tfn, ts in zip(self._transforms, transforms_state):
            if ts is not None and hasattr(tfn, "load_state_dict"):
                tfn.load_state_dict(ts)
        self._transforms_state = None

    def allow_iter_to_reset_state(self):
        """Discard restored in-epoch progress; the next iter() restarts the epoch."""
        self._just_restored_state = False
        if hasattr(self, "_needs_fast_forward"):
            self._needs_fast_forward = False
        for attr in ("_cuts_state", "_transforms_state", "_rng_state", "_bucketer_state"):
            if hasattr(self, attr):
                setattr(self, attr, None)

    def __next__(self):
        self._just_restored_state = False
        # Sample world_size batches, keep batches[rank]; at end-of-data either
        # redistribute+duplicate (drop_last=False) or stop early (True).
        from lhotse_tpu.manipulation import combine

        batches = []
        for _ in range(self.world_size):
            try:
                batch = self._next_batch()
                batches.append(batch)
            except StopIteration:
                if self.world_size == 1 or self.drop_last:
                    raise

        def _num_cuts(b):
            return len(b[0]) if isinstance(b, tuple) else len(b)

        self.diagnostics.consumed(sum(_num_cuts(b) for b in batches))

        if len(batches) == 0:
            raise StopIteration()
        elif len(batches) != self.world_size:
            # End of data with some ranks empty: deterministically redistribute
            # (duplicating examples if fewer than world_size remain).
            combined = combine([b for b in batches if b is not None])
            chunk = 0
            while (diff := self.world_size - len(combined)) > 0:
                combined = combined + combined.subset(first=diff).modify_ids(
                    mark_as_duplicate(chunk)
                )
                chunk += 1
            batches = combined.split(self.world_size)

        selected = batches[self.rank]
        self._log_diagnostics(selected)
        for tfn in self._transforms:
            selected = tfn(selected)
        attach_dataloading_info(selected, rank=self.rank, world_size=self.world_size)
        return selected

    def _log_diagnostics(self, batch: Union[CutSet, Tuple[CutSet, ...]]) -> None:
        if isinstance(batch, CutSet):
            self.diagnostics.keep(batch)
        elif isinstance(batch, tuple) and isinstance(batch[0], CutSet):
            self.diagnostics.keep(batch[0])
        else:
            raise ValueError(f"Object with unexpected type: {batch}")

    def get_report(self) -> str:
        """A string describing the sampling statistics so far."""
        return self.diagnostics.get_report()


def mark_as_duplicate(iteration: int) -> Callable[[str], str]:
    def inner(cut_id: str) -> str:
        return f"{cut_id}_dup{iteration}"

    return inner


def attach_dataloading_info(cuts: CutSet, rank: int, world_size: int) -> None:
    """Stamp each cut with {rank, world_size, worker_id} under
    ``dataloading_info``."""
    from lhotse_tpu.dataset.dataloading import get_worker_info

    wi = get_worker_info()
    worker_id = wi.id if wi is not None else None
    info = {"rank": rank, "world_size": world_size, "worker_id": worker_id}
    for cut in cuts:
        cut.dataloading_info = info


class SamplingConstraint(metaclass=ABCMeta):
    """Tracks sampled examples and tells the sampler when to yield a batch."""

    @abstractmethod
    def add(self, example: Any) -> None:
        ...

    @abstractmethod
    def exceeded(self) -> bool:
        ...

    @abstractmethod
    def close_to_exceeding(self) -> bool:
        ...

    @abstractmethod
    def reset(self) -> None:
        ...

    @abstractmethod
    def measure_length(self, example: Any) -> float:
        ...

    def select_bucket(self, buckets: Any, example: Any = None, example_len: Any = None) -> int:
        """Index of the first bucket boundary larger than the example length."""
        assert exactly_one_not_null(example, example_len), (
            f"select_bucket requires either example= or example_len= "
            f"(received {example=} and {example_len=})."
        )
        if example_len is None:
            example_len = self.measure_length(example)
        return bisect_left(buckets, example_len)

    def copy(self) -> "SamplingConstraint":
        return copy.copy(self)


@dataclass
class TimeConstraint(SamplingConstraint):
    """
    Max total batch duration and/or cut count. The duration criterion models a
    *padded* batch: cost = num_cuts × longest seen duration — which on TPU is
    literally the compiled tensor size. ``quadratic_duration`` penalizes long
    cuts for O(T^2) models: ``d + d^2/q``. ``concatenate_cuts`` switches to a
    plain duration sum (for gap-concatenated batches).
    """

    max_duration: Optional[Seconds] = None
    max_cuts: Optional[int] = None
    current: Union[int, Seconds] = 0
    num_cuts: int = 0
    longest_seen: Union[int, float] = 0
    quadratic_duration: Optional[Seconds] = None
    concatenate_cuts: bool = False

    def __post_init__(self) -> None:
        assert is_none_or_gt(self.max_duration, 0)
        assert is_none_or_gt(self.max_cuts, 0)
        assert is_none_or_gt(self.quadratic_duration, 0)

    def is_active(self) -> bool:
        return self.max_duration is not None or self.max_cuts is not None

    def add(self, example: Cut) -> None:
        if self.max_duration is not None:
            duration = self._maybe_apply_quadratic_correction(example.duration)
            self.current += duration
            self.longest_seen = max(self.longest_seen, duration)
        self.num_cuts += 1

    def _maybe_apply_quadratic_correction(self, duration: Seconds) -> Seconds:
        if self.quadratic_duration is None:
            return duration
        return duration + (duration**2) / self.quadratic_duration

    def exceeded(self) -> bool:
        if self.max_cuts is not None and self.num_cuts > self.max_cuts:
            return True
        if self.max_duration is None:
            return False
        if self.concatenate_cuts is True:
            return self.current > self.max_duration
        effective_duration = self.num_cuts * self.longest_seen
        return effective_duration > self.max_duration

    def close_to_exceeding(self) -> bool:
        """Would adding one more longest-seen-sized cut exceed the constraint?"""
        if self.max_cuts is not None and self.num_cuts >= self.max_cuts:
            return True
        if self.max_duration is not None and self.concatenate_cuts is True:
            return self.current > self.max_duration
        if self.max_duration is not None:
            effective_duration = (self.num_cuts + 1) * self.longest_seen
            return effective_duration > self.max_duration
        return False

    def reset(self) -> None:
        self.current = 0
        self.num_cuts = 0
        self.longest_seen = 0

    def measure_length(self, example: Cut) -> float:
        return example.duration

    def state_dict(self) -> Dict[str, Any]:
        return asdict(self)

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        self.max_duration = state_dict.pop("max_duration")
        self.max_cuts = state_dict.pop("max_cuts")
        self.current = state_dict.pop("current")
        self.num_cuts = state_dict.pop("num_cuts")
        self.longest_seen = state_dict.pop("longest_seen", 0)
        self.quadratic_duration = state_dict.pop("quadratic_duration", None)
        self.concatenate_cuts = state_dict.pop("concatenate_cuts", None)
        assert len(state_dict) == 0, (
            "Error in TimeConstraint.load_state_dict(): Unexpected keys:\n- "
            + "\n- ".join(state_dict.keys())
        )

    def __add__(self, other: "TimeConstraint") -> "TimeConstraint":
        for key in ("max_duration", "max_cuts", "quadratic_duration"):
            self_attr = getattr(self, key)
            other_attr = getattr(other, key)
            is_none = self_attr is None and other_attr is None
            assert is_none or isclose(self_attr, other_attr), (
                f"To add two TimeConstraint objects they must represent the same "
                f"constraint (self.{key}={self_attr} != other.{key}={other_attr})."
            )
        return TimeConstraint(
            max_duration=self.max_duration,
            max_cuts=self.max_cuts,
            current=self.current + other.current,
            num_cuts=self.num_cuts + other.num_cuts,
            longest_seen=max(self.longest_seen, other.longest_seen),
            quadratic_duration=self.quadratic_duration,
        )

    def __eq__(self, other: "TimeConstraint") -> bool:
        return (
            self.max_duration == other.max_duration
            and self.max_cuts == other.max_cuts
            and self.quadratic_duration == other.quadratic_duration
        )


@dataclass
class TokenConstraint(SamplingConstraint):
    """Max total tokens / examples per batch for text sampling, with an
    optional quadratic token penalty."""

    max_tokens: int = None
    max_examples: int = None
    current: int = 0
    num_examples: int = 0
    longest_seen: int = 0
    quadratic_length: Optional[int] = None

    def __post_init__(self) -> None:
        assert is_none_or_gt(self.max_tokens, 0)
        assert is_none_or_gt(self.max_examples, 0)
        assert is_none_or_gt(self.quadratic_length, 0)

    def add(self, example: TextExample) -> None:
        if self.max_tokens is not None:
            size = self._maybe_apply_quadratic_correction(self.measure_length(example))
            self.current += size
            self.longest_seen = max(self.longest_seen, size)
        self.num_examples += 1

    def _maybe_apply_quadratic_correction(self, size: int) -> int:
        if self.quadratic_length is None:
            return size
        return size + (size**2) / self.quadratic_length

    def exceeded(self) -> bool:
        if self.max_examples is not None and self.num_examples > self.max_examples:
            return True
        if self.max_tokens is None:
            return False
        effective_size = self.num_examples * self.longest_seen
        return effective_size > self.max_tokens

    def close_to_exceeding(self) -> bool:
        if self.max_examples is not None and self.num_examples >= self.max_examples:
            return True
        if self.max_tokens is not None:
            effective_size = (self.num_examples + 1) * self.longest_seen
            return effective_size > self.max_tokens
        return False

    def reset(self) -> None:
        self.current = 0
        self.num_examples = 0
        self.longest_seen = 0

    def measure_length(self, example: TextExample) -> float:
        return example.num_tokens


@dataclass
class EpochDiagnostics:
    epoch: int = 0
    kept_cuts: int = 0
    discarded_cuts: int = 0
    kept_batches: int = 0
    discarded_batches: int = 0
    # Cuts actually drawn from the data source into sampled batches this
    # epoch. With world_size > 1 this exceeds kept_cuts (each step samples
    # world_size batches but keeps one), and it is the correct replay
    # fast-forward amount. The reference fast-forwards by kept+discarded
    # (sampling/simple.py load_state_dict), which under-skips in DDP
    # map-style resume; we track the real consumption instead.
    source_cuts: int = 0

    @property
    def total_cuts(self) -> int:
        return self.kept_cuts + self.discarded_cuts

    @property
    def consumed_cuts(self) -> int:
        """Cuts drawn from the data source this epoch (batched + filtered
        out) — the replay fast-forward amount. Falls back to kept+discarded
        for states recorded before source_cuts existed."""
        if self.source_cuts == 0 and self.kept_cuts > 0:
            return self.total_cuts
        return self.source_cuts + self.discarded_cuts

    @property
    def total_batches(self) -> int:
        return self.kept_batches + self.discarded_batches

    def get_report(self) -> str:
        if self.total_batches == 0 or self.total_cuts == 0:
            return (
                "Sampling statistics unavailable: EpochDiagnostics received no "
                "cuts or batches."
            )
        return (
            f"| ep {self.epoch:>3d} | cuts kept {self.kept_cuts:d}/{self.total_cuts:d} "
            f"({self.kept_cuts / self.total_cuts:.2%}) "
            f"| cuts discarded {self.discarded_cuts:d} "
            f"| batches kept {self.kept_batches:d}/{self.total_batches:d} "
            f"({self.kept_batches / self.total_batches:.2%})"
            f"| batches discarded {self.discarded_batches:d} |"
        )

    def state_dict(self) -> Dict[str, Any]:
        return asdict(self)

    def load_state_dict(self, state_dict: Dict[str, Any]) -> "EpochDiagnostics":
        self.epoch = state_dict.pop("epoch")
        self.kept_batches = state_dict.pop("kept_batches")
        self.discarded_batches = state_dict.pop("discarded_batches")
        self.kept_cuts = state_dict.pop("kept_cuts")
        self.discarded_cuts = state_dict.pop("discarded_cuts")
        self.source_cuts = state_dict.pop("source_cuts", 0)
        assert len(state_dict) == 0, (
            "Error in EpochDiagnostics.load_state_dict(): Unexpected keys:\n- "
            + "\n- ".join(state_dict.keys())
        )
        return self

    def __add__(self, other: "EpochDiagnostics") -> "EpochDiagnostics":
        assert self.epoch == other.epoch
        return EpochDiagnostics(
            epoch=self.epoch,
            kept_cuts=self.kept_cuts + other.kept_cuts,
            kept_batches=self.kept_batches + other.kept_batches,
            discarded_cuts=self.discarded_cuts + other.discarded_cuts,
            discarded_batches=self.discarded_batches + other.discarded_batches,
            source_cuts=self.source_cuts + other.source_cuts,
        )


@dataclass
class SamplingDiagnostics:
    """Kept/discarded cut and batch counts per epoch."""

    current_epoch: int = 0
    stats_per_epoch: Dict[int, EpochDiagnostics] = None

    def __post_init__(self):
        if self.stats_per_epoch is None:
            self.stats_per_epoch = {}
            self.set_epoch(self.current_epoch)

    def reset_current_epoch(self) -> None:
        self.stats_per_epoch[self.current_epoch] = EpochDiagnostics(self.current_epoch)

    def set_epoch(self, epoch: int) -> None:
        self.current_epoch = epoch
        if epoch not in self.stats_per_epoch:
            self.stats_per_epoch[epoch] = EpochDiagnostics(epoch=epoch)

    def advance_epoch(self) -> None:
        self.set_epoch(self.current_epoch + 1)

    @property
    def current_epoch_stats(self) -> EpochDiagnostics:
        return self.stats_per_epoch[self.current_epoch]

    def keep(self, cuts: Iterable[Cut]) -> None:
        cntr = 0
        for cut in cuts:
            self.current_epoch_stats.kept_cuts += 1
            cntr += 1
        if not cntr:
            warnings.warn("Found and accepted batch with zero cuts. This could be an error.")
        self.current_epoch_stats.kept_batches += 1

    def consumed(self, num_cuts: int) -> None:
        """Record cuts drawn from the data source into sampled batches
        (including the batches other DDP ranks keep)."""
        self.current_epoch_stats.source_cuts += num_cuts

    def discard(self, cuts: Iterable[Cut]) -> None:
        cntr = 0
        for cut in cuts:
            self.current_epoch_stats.discarded_cuts += 1
            cntr += 1
        if cntr:
            self.current_epoch_stats.discarded_batches += 1

    def discard_single(self, cut: Cut) -> None:
        self.current_epoch_stats.discarded_cuts += 1

    @property
    def kept_cuts(self) -> int:
        return sum(s.kept_cuts for s in self.stats_per_epoch.values())

    @property
    def discarded_cuts(self) -> int:
        return sum(s.discarded_cuts for s in self.stats_per_epoch.values())

    @property
    def kept_batches(self) -> int:
        return sum(s.kept_batches for s in self.stats_per_epoch.values())

    @property
    def discarded_batches(self) -> int:
        return sum(s.discarded_batches for s in self.stats_per_epoch.values())

    @property
    def total_cuts(self) -> int:
        return sum(s.total_cuts for s in self.stats_per_epoch.values())

    @property
    def total_batches(self) -> int:
        return sum(s.total_batches for s in self.stats_per_epoch.values())

    def get_report(self, per_epoch: bool = False) -> str:
        if self.total_batches == 0 or self.total_cuts == 0:
            return (
                "Sampling statistics unavailable: the SamplerDiagnostics received "
                "no cuts or batches."
            )
        ret = []
        if per_epoch:
            for epoch in sorted(self.stats_per_epoch):
                ret.append(self.stats_per_epoch[epoch].get_report())
        ret.append(
            f"|  total  | cuts kept {self.kept_cuts:d}/{self.total_cuts:d} "
            f"({self.kept_cuts / self.total_cuts:.2%}) "
            f"| cuts discarded {self.discarded_cuts:d} "
            f"| batches kept {self.kept_batches:d}/{self.total_batches:d} "
            f"({self.kept_batches / self.total_batches:.2%})"
            f"| batches discarded {self.discarded_batches:d} |"
        )
        return "\n".join(ret)

    def state_dict(self) -> Dict[str, Any]:
        return asdict(self)

    def load_state_dict(self, state_dict: Dict[str, Any]) -> "SamplingDiagnostics":
        self.current_epoch = state_dict.pop("current_epoch")
        self.stats_per_epoch = {
            int(epoch): EpochDiagnostics().load_state_dict(sd)
            for epoch, sd in state_dict.pop("stats_per_epoch").items()
        }
        return self

    def __add__(self, other: "SamplingDiagnostics") -> "SamplingDiagnostics":
        stats_per_epoch = deepcopy(self.stats_per_epoch)
        for epoch, stats in other.stats_per_epoch.items():
            if epoch in stats_per_epoch:
                stats_per_epoch[epoch] = stats_per_epoch[epoch] + stats
            else:
                stats_per_epoch[epoch] = stats
        return SamplingDiagnostics(
            current_epoch=self.current_epoch, stats_per_epoch=stats_per_epoch
        )


class _filter_nothing:
    def __call__(self, cut: Cut) -> bool:
        return True


def _and(fn1: Callable[[Cut], bool], fn2: Callable[[Cut], bool]) -> Callable[[Cut], bool]:
    def _and_wrapper(cut: Cut) -> bool:
        return fn1(cut) and fn2(cut)

    return _and_wrapper
