"""
The lazy iterator runtime: a checkpointable graph of streaming combinators.

Reference behavior: `/root/reference/lhotse/lazy.py` — every node implements
``IteratorNode`` (lazy.py:62): an iterable with ``is_checkpointable`` /
``is_indexed`` / ``has_constant_time_access`` flags, ``state_dict()`` /
``load_state_dict()``, ``__getitem__(token)`` for O(1) restore, and child
traversal via ``source``/``sources``. Items can carry a **graph-origin
token** (lazy.py:185-232) identifying the leaf position that produced them,
enabling O(1) checkpoint of buffered items (shuffle buffers, bucket queues).

Node inventory mirrors the reference: ``Dillable`` (:27), ``AlgorithmMixin``
(:235), ``LazyTxtIterator`` (:435), ``LazyJsonlIterator`` (:467),
``LazyManifestIterator`` (:510), ``LazyIndexedManifestIterator`` (:549),
``LazyIteratorChain`` (:652), ``LazyIteratorMultiplexer`` (:881),
``LazyInfiniteApproximateMultiplexer`` (:1044), ``LazyShuffler`` (:1149),
``LazyFilter``/``LazyMapper``/``LazyFlattener``/``LazyRepeater``/``LazySlicer``
(:1293-1688).
"""
from __future__ import annotations

import os
import random
import types
import warnings
from collections import deque
from contextlib import contextmanager
from functools import partial
from json import JSONDecodeError
from typing import Any, Callable, Iterable, List, Optional, TypeVar, Union

from lhotse_tpu.serialization import (
    LazyMixin,
    decode_json_line,
    deserialize_item,
    open_best,
)
from lhotse_tpu.utils import Pathlike, fastcopy, is_module_available

T = TypeVar("T")


#################################################
# Dill-backed pickling mixin
#################################################


class Dillable:
    """
    Mix-in using ``dill`` instead of ``pickle`` when enabled via the
    ``LHOTSE_DILL_ENABLED`` env var — lets lambdas cross process boundaries.
    """

    def __getstate__(self):
        if is_dill_enabled():
            import dill

            return dill.dumps(self.__dict__)
        return self.__dict__

    def __setstate__(self, state):
        if is_dill_enabled():
            import dill

            self.__dict__ = dill.loads(state)
        else:
            self.__dict__ = state


def is_dill_enabled(_ENABLED_VALUES=frozenset(("1", "True", "true", "yes"))) -> bool:
    return (
        is_module_available("dill")
        and os.environ.get("LHOTSE_DILL_ENABLED", "0") in _ENABLED_VALUES
    )


def set_dill_enabled(value: bool) -> None:
    assert is_module_available("dill"), (
        "Cannot enable dill because dill is not installed."
    )
    os.environ["LHOTSE_DILL_ENABLED"] = "1" if value else "0"


@contextmanager
def dill_enabled(value: bool):
    previous = is_dill_enabled()
    set_dill_enabled(value)
    yield
    set_dill_enabled(previous)


#################################################
# Iterator node protocol + graph-origin tokens
#################################################


class IteratorNode(Dillable, Iterable):
    """
    Base protocol for nodes in the lazy iterator graph. Child-reference
    conventions: ``self.source`` (single child) / ``self.sources`` (list).
    Checkpointable nodes set ``is_checkpointable = True`` and implement
    ``state_dict``/``load_state_dict``. Instances are not thread-safe.
    """

    is_checkpointable = False
    is_indexed = False
    has_constant_time_access = False

    def state_dict(self) -> dict:
        raise NotImplementedError(
            f"{type(self).__name__} is not checkpointable and does not implement state_dict()."
        )

    def load_state_dict(self, sd: dict) -> None:
        raise NotImplementedError(
            f"{type(self).__name__} is not checkpointable and does not implement load_state_dict()."
        )

    def iter_children(self):
        if hasattr(self, "source"):
            yield getattr(self, "source")
        if hasattr(self, "sources"):
            yield from getattr(self, "sources")


def resolve_iterator_source(obj: Iterable) -> Iterable:
    """Unwrap manifest Set wrappers (e.g. CutSet) to their underlying iterator."""
    try:
        from lhotse_tpu.cut import CutSet
    except Exception:
        return obj
    return obj.data if isinstance(obj, CutSet) else obj


def _try_collect_child_state(obj: Any) -> Optional[dict]:
    if isinstance(obj, IteratorNode):
        if type(obj).state_dict is IteratorNode.state_dict:
            if any(True for _ in obj.iter_children()):
                raise NotImplementedError(
                    f"{type(obj).__name__} does not support checkpointing."
                )
            return None
        return obj.state_dict()
    if hasattr(obj, "state_dict") and callable(getattr(obj, "state_dict")):
        try:
            return obj.state_dict()
        except Exception:
            return None
    return None


def _try_restore_child_state(obj: Any, state: Optional[dict]) -> None:
    if state is None:
        return
    if isinstance(obj, IteratorNode):
        if type(obj).load_state_dict is IteratorNode.load_state_dict:
            raise NotImplementedError(
                f"{type(obj).__name__} does not support checkpoint restoration."
            )
        obj.load_state_dict(state)
        return
    if hasattr(obj, "load_state_dict") and callable(getattr(obj, "load_state_dict")):
        obj.load_state_dict(state)


class GraphOriginDict(dict):
    """dict subclass that can carry a ``_graph_origin`` attribute (plain dicts
    can't have attributes, so attach_graph_origin silently no-ops on them)."""

    __slots__ = ("_graph_origin",)


def _attach_runtime_metadata(item: Any, name: str, value: Any) -> Any:
    # Cut-like objects redirect unknown attributes into the serialized
    # `custom` dict via CustomFieldMixin.__setattr__; graph tokens must stay
    # process-local, so bypass __setattr__ when possible.
    try:
        object.__setattr__(item, name, value)
    except Exception:
        try:
            setattr(item, name, value)
        except Exception:
            pass
    return item


def normalize_graph_token(token: Any) -> Any:
    if isinstance(token, (list, tuple)):
        return tuple(normalize_graph_token(part) for part in token)
    return token


def attach_graph_origin(item: Any, token: Any) -> Any:
    return _attach_runtime_metadata(item, "_graph_origin", token)


def get_graph_origin(item: Any) -> Any:
    return getattr(item, "_graph_origin", None)


def maybe_attach_graph_origin(item: Any, token: Any) -> Any:
    if token is None:
        return item
    return attach_graph_origin(item, token)


def require_graph_origin(item: Any, owner: str, what: str = "items") -> Any:
    token = get_graph_origin(item)
    if token is None:
        raise RuntimeError(
            f"{owner} requires '_graph_origin' on {what} from graph-restorable sources."
        )
    return token


def supports_graph_restore(source: Any, *, require_length: bool = False) -> bool:
    if not getattr(source, "has_constant_time_access", False):
        return False
    if not hasattr(source, "__getitem__"):
        return False
    return not require_length or hasattr(source, "__len__")


def resolve_iteration_seed(seed: Optional[Union[int, str]]) -> int:
    from lhotse_tpu.dataset.dataloading import resolve_seed

    if seed is None:
        return random.getrandbits(31)
    return resolve_seed(seed)


#################################################
# AlgorithmMixin — user-facing combinators on Sets
#################################################


class AlgorithmMixin(LazyMixin, Iterable):
    """Combinators (filter/map/mux/shuffle/repeat/+) shared by all Set classes."""

    def filter(self, predicate: Callable[[T], bool]):
        """Keep only items satisfying ``predicate`` (lazily when self is lazy)."""
        cls = type(self)
        if self.is_lazy:
            return cls(LazyFilter(resolve_iterator_source(self), predicate=predicate))
        return cls.from_items(item for item in self if predicate(item))

    def map(self, transform_fn: Callable[[T], T]):
        """Apply ``transform_fn`` to each item (lazily when self is lazy)."""
        cls = type(self)
        ans = cls(LazyMapper(resolve_iterator_source(self), fn=transform_fn))
        if self.is_lazy:
            return ans
        return ans.to_eager()

    @classmethod
    def mux(
        cls,
        *manifests,
        stop_early: bool = False,
        weights: Optional[List[Union[int, float]]] = None,
        seed: Union[int, str] = 0,
    ):
        """Weighted random interleave of multiple manifests (always lazy)."""
        manifests = [resolve_iterator_source(m) for m in manifests]
        return cls(
            LazyIteratorMultiplexer(
                *manifests, stop_early=stop_early, weights=weights, seed=seed
            )
        )

    @classmethod
    def infinite_mux(
        cls,
        *manifests,
        weights: Optional[List[Union[int, float]]] = None,
        seed: Union[int, str] = 0,
        max_open_streams: Optional[int] = None,
    ):
        """Infinite sample-with-replacement multiplexing over a shard pool with
        bounded open streams."""
        manifests = [resolve_iterator_source(m) for m in manifests]
        return cls(
            LazyInfiniteApproximateMultiplexer(
                *manifests, weights=weights, seed=seed, max_open_streams=max_open_streams
            )
        )

    def shuffle(self, rng: Optional[random.Random] = None, buffer_size: int = 10000):
        """Shuffle items (streaming buffer shuffle when lazy)."""
        cls = type(self)
        if rng is None:
            rng = random
        if self.is_lazy:
            return cls(
                LazyShuffler(resolve_iterator_source(self), buffer_size=buffer_size, rng=rng)
            )
        new: List = self.data.copy()
        rng.shuffle(new)
        return cls(new)

    def repeat(self, times: Optional[int] = None, preserve_id: bool = False):
        """Iterate the original items ``times`` times (infinite by default)."""
        cls = type(self)
        return cls(
            LazyRepeater(resolve_iterator_source(self), times=times, preserve_id=preserve_id)
        )

    def __add__(self, other):
        cls = type(self)
        return cls(
            LazyIteratorChain(
                resolve_iterator_source(self), resolve_iterator_source(other)
            )
        )


#################################################
# Leaf iterators
#################################################


class LazyTxtIterator(IteratorNode):
    """Iterate lines of a (possibly compressed) text file as TextExamples."""

    def __init__(self, path: Pathlike, as_text_example: bool = True) -> None:
        self.path = path
        self.as_text_example = as_text_example
        self._len = None

    def __iter__(self):
        from lhotse_tpu.cut.text import TextExample

        tot = 0
        with open_best(self.path, "r") as f:
            for line in f:
                line = line.strip()
                if self.as_text_example:
                    line = TextExample(line)
                yield line
                tot += 1
        if self._len is None:
            self._len = tot

    def __len__(self) -> int:
        if self._len is None:
            self._len = count_newlines_fast(self.path)
        return self._len


class LazyJsonlIterator(IteratorNode):
    """Stream raw dicts from a JSONL file with a resumable position counter."""

    def __init__(self, path: Pathlike) -> None:
        self.path = path
        self._len = None
        self._position = 0
        self._restored = False

    def __iter__(self):
        start = self._position if self._restored else 0
        self._restored = False
        self._position = start
        tot = 0
        with open_best(self.path, "r") as f:
            for line in f:
                tot += 1
                if tot <= start:
                    continue
                data = decode_json_line(line)
                self._position = tot
                yield data
        if self._len is None:
            self._len = tot

    def __len__(self) -> int:
        if self._len is None:
            self._len = count_newlines_fast(self.path)
        return self._len

    def state_dict(self) -> dict:
        return {"position": self._position}

    def load_state_dict(self, sd: dict) -> None:
        self._position = sd["position"]
        self._restored = True


class LazyManifestIterator(IteratorNode):
    """
    Stream typed manifests from a JSONL file via ``deserialize_item``;
    checkpointable through the inner :class:`LazyJsonlIterator`.
    """

    is_checkpointable = True

    def __init__(self, path: Pathlike) -> None:
        self.source = LazyJsonlIterator(path)

    @property
    def path(self) -> Pathlike:
        return self.source.path

    def __iter__(self):
        yield from map(deserialize_item, self.source)

    def __len__(self) -> int:
        return len(self.source)

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def state_dict(self) -> dict:
        return {"source": self.source.state_dict()}

    def load_state_dict(self, sd: dict) -> None:
        self.source.load_state_dict(sd["source"])


class LazyIndexedManifestIterator(IteratorNode):
    """
    ``.idx``-backed manifest iterator: O(1) ``__getitem__``, partitioned and
    optionally Feistel-shuffled iteration, checkpointable by position.
    """

    is_checkpointable = True

    def __init__(
        self,
        path: Pathlike,
        shuffle: bool = False,
        seed: int = 0,
        index_path: Optional[Pathlike] = None,
        decode: Optional[Callable[[dict], Any]] = None,
        skip_decode_errors: bool = False,
        decode_error_callback: Optional[Callable] = None,
    ) -> None:
        from lhotse_tpu.dataset.dataloading import PartitionedIndexedIterator
        from lhotse_tpu.indexing import IndexedJsonlReader

        self.path = path
        self.shuffle = shuffle
        self.seed = seed
        self.index_path = index_path
        self.skip_decode_errors = skip_decode_errors
        self.decode_error_callback = decode_error_callback
        self._decode = decode if decode is not None else deserialize_item
        self._reader = IndexedJsonlReader(path, index_path=index_path)
        self._iter_state = PartitionedIndexedIterator(shuffle=shuffle, seed=seed)

    @property
    def is_indexed(self) -> bool:
        return True

    @property
    def has_constant_time_access(self) -> bool:
        return True

    def __getitem__(self, idx: int) -> Any:
        return self._decode_index(idx)

    def _decode_index(self, idx: int) -> Any:
        return attach_graph_origin(self._decode(self._reader[idx]), idx)

    def __iter__(self):
        for phys_idx in self._iter_state.iterate(len(self._reader)):
            try:
                yield self._decode_index(phys_idx)
            except (JSONDecodeError, UnicodeDecodeError) as ex:
                if not self.skip_decode_errors:
                    raise
                if self.decode_error_callback is not None:
                    self.decode_error_callback(ex, phys_idx, self.path)
                else:
                    warnings.warn(
                        f"Skipping malformed indexed JSONL record path={self.path!r} "
                        f"idx={phys_idx}: {type(ex).__name__}: {ex}"
                    )

    def __len__(self) -> int:
        return len(self._reader)

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def state_dict(self) -> dict:
        return {
            **self._iter_state.state_dict(),
            "shuffle": self.shuffle,
            "seed": self.seed,
        }

    def load_state_dict(self, sd: dict) -> None:
        if self.shuffle and "range" not in sd:
            raise ValueError(
                "LazyIndexedManifestIterator with shuffle=True requires 'range' "
                "in state_dict; the checkpoint may have been created without shuffling."
            )
        self._iter_state.load_state_dict(sd)
        self._restored = True


#################################################
# Composite iterators
#################################################


class LazyIteratorChain(IteratorNode):
    """
    Sequential concatenation of multiple iterables. ``shuffle_iters=True``
    shuffles the sub-iterator order per epoch (shard-level), or — when every
    source is indexed — switches to a Feistel-permuted *item-level* global
    shuffle with O(1) random access. Checkpointable.
    """

    is_checkpointable = True

    def __init__(
        self,
        *iterators: Iterable,
        shuffle_iters: bool = False,
        seed: Optional[Union[int, str]] = None,
    ) -> None:
        self.sources = []
        self.shuffle_iters = shuffle_iters
        self.seed = seed
        self.num_iters = 0
        for it in iterators:
            it = resolve_iterator_source(it)
            if isinstance(it, LazyIteratorChain):
                self.sources.extend(it.sources)
            else:
                self.sources.append(it)
        self._current_iter_idx = 0
        self._iter_order: Optional[list] = None
        self._restored = False
        self._global_position = 0
        self._global_seed = None
        self._cum_lens = None

    @property
    def is_indexed(self) -> bool:
        return all(getattr(s, "is_indexed", False) for s in self.sources)

    @property
    def has_constant_time_access(self) -> bool:
        if self.shuffle_iters and not self.is_indexed:
            return False
        return all(supports_graph_restore(s, require_length=True) for s in self.sources)

    def __getitem__(self, idx: Any) -> Any:
        idx = normalize_graph_token(idx)
        if isinstance(idx, tuple) and len(idx) == 2:
            src_idx, source_token = idx
            return attach_graph_origin(self.sources[src_idx][source_token], idx)
        from bisect import bisect_right

        cum = self._cumulative_lengths()
        total = cum[-1]
        if idx < 0:
            idx += total
        if idx < 0 or idx >= total:
            raise IndexError("index out of range for LazyIteratorChain")
        src_idx = bisect_right(cum, idx)
        offset = idx - cum[src_idx - 1] if src_idx > 0 else idx
        return attach_graph_origin(self.sources[src_idx][offset], idx)

    def _cumulative_lengths(self) -> list:
        if self._cum_lens is None:
            self._cum_lens = []
            total = 0
            for s in self.sources:
                total += len(s)
                self._cum_lens.append(total)
        return self._cum_lens

    def __iter__(self):
        if self.shuffle_iters and self.is_indexed:
            return self._iter_globally_shuffled()
        return self._iter_sequential()

    def _iter_sequential(self):
        from lhotse_tpu.dataset.dataloading import resolve_seed

        if self._restored:
            self._restored = False
            start_idx = self._current_iter_idx
            order = self._iter_order
            if order is None or len(order) != len(self.sources):
                order = list(range(len(self.sources)))
        else:
            start_idx = 0
            order = list(range(len(self.sources)))
            if self.shuffle_iters:
                if self.seed is None:
                    rng = random
                else:
                    rng = random.Random(resolve_seed(self.seed) + self.num_iters)
                rng.shuffle(order)
                self.num_iters += 1
            self._iter_order = order
            self._current_iter_idx = 0
        self._iter_order = order
        attach_tokens = self.has_constant_time_access and not self.shuffle_iters
        for idx in range(start_idx, len(order)):
            src_idx = order[idx]
            it = self.sources[src_idx]
            self._current_iter_idx = idx
            if isinstance(it, dict):
                it = it.values()
            for item in it:
                if attach_tokens:
                    maybe_attach_graph_origin(item, (src_idx, get_graph_origin(item)))
                yield item

    def _iter_globally_shuffled(self):
        from lhotse_tpu.dataset.dataloading import get_worker_partition
        from lhotse_tpu.indexing import LazyShuffledRange

        total = len(self)
        shard_id, num_shards = get_worker_partition()

        if self._restored:
            self._restored = False
            start = self._global_position
            base_seed = self._global_seed
            if base_seed is None:
                base_seed = resolve_iteration_seed(self.seed)
            saved_shard_id = getattr(self, "_global_shard_id", None)
            saved_num_shards = getattr(self, "_global_num_shards", None)
            if saved_num_shards is not None and (
                saved_shard_id != shard_id or saved_num_shards != num_shards
            ):
                raise ValueError(
                    f"LazyIteratorChain global-shuffle partition mismatch on resume: "
                    f"saved (shard_id={saved_shard_id}, num_shards={saved_num_shards}), "
                    f"current (shard_id={shard_id}, num_shards={num_shards})."
                )
        else:
            start = 0
            self._global_position = 0
            base_seed = resolve_iteration_seed(self.seed)
            self._global_seed = base_seed
        self._global_shard_id = shard_id
        self._global_num_shards = num_shards

        shuffled = LazyShuffledRange(
            total,
            seed=base_seed + self.num_iters,
            shard_id=shard_id,
            num_shards=num_shards,
        )
        for i in range(start, len(shuffled)):
            self._global_position = i + 1
            yield self[shuffled[i]]
        self.num_iters += 1

    def __len__(self) -> int:
        return sum(len(it) for it in self.sources)

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def state_dict(self) -> dict:
        return {
            "current_iter_idx": self._current_iter_idx,
            "num_iters": self.num_iters,
            "iter_order": self._iter_order,
            "global_position": self._global_position,
            "global_seed": getattr(self, "_global_seed", None),
            "global_shard_id": getattr(self, "_global_shard_id", None),
            "global_num_shards": getattr(self, "_global_num_shards", None),
            "inner_states": [_try_collect_child_state(s) for s in self.sources],
        }

    def load_state_dict(self, sd: dict) -> None:
        self._current_iter_idx = sd["current_iter_idx"]
        self.num_iters = sd["num_iters"]
        self._iter_order = sd.get("iter_order")
        self._global_position = sd.get("global_position", 0)
        self._global_seed = sd.get("global_seed")
        self._global_shard_id = sd.get("global_shard_id")
        self._global_num_shards = sd.get("global_num_shards")
        if self.shuffle_iters and self.is_indexed:
            self._restored = True
            return
        order = (
            self._iter_order
            if self._iter_order is not None
            else list(range(len(self.sources)))
        )
        active = set(order[self._current_iter_idx :])
        for i, (s, inner_sd) in enumerate(zip(self.sources, sd.get("inner_states", []))):
            if i not in active or inner_sd is None:
                continue
            _try_restore_child_state(s, inner_sd)
        self._restored = True


class LazyIteratorMultiplexer(IteratorNode):
    """
    Weighted random interleave of multiple iterables with a per-iteration RNG;
    exhausted sources drop out unless ``stop_early``. Checkpointable (RNG
    state + exhaustion mask + child states).
    """

    is_checkpointable = True

    def __init__(
        self,
        *iterators: Iterable,
        stop_early: bool = False,
        weights: Optional[List[Union[int, float]]] = None,
        seed: Union[int, str] = 0,
    ) -> None:
        self.sources = [resolve_iterator_source(it) for it in iterators]
        self.stop_early = stop_early
        self.seed = seed
        assert len(self.sources) > 1, "There have to be at least two iterables to multiplex."
        self.weights = weights if weights is not None else [1] * len(self.sources)
        assert len(self.sources) == len(self.weights)
        self._rng_state = None
        self._exhausted: Optional[list] = None
        self._restored = False

    @property
    def is_indexed(self) -> bool:
        return all(getattr(s, "is_indexed", False) for s in self.sources)

    @property
    def has_constant_time_access(self) -> bool:
        return all(supports_graph_restore(s) for s in self.sources)

    def __getitem__(self, token: Any) -> Any:
        token = normalize_graph_token(token)
        if not isinstance(token, tuple) or len(token) != 2:
            raise TypeError(
                "LazyIteratorMultiplexer expects graph tokens shaped like "
                "(source_index, source_token)."
            )
        source_idx, source_token = token
        return attach_graph_origin(self.sources[source_idx][source_token], token)

    def __iter__(self):
        from lhotse_tpu.dataset.dataloading import get_worker_partition, resolve_seed

        _, num_shards = get_worker_partition()
        if num_shards > 1 and self.seed == "randomized" and self.is_indexed:
            raise ValueError(
                "LazyIteratorMultiplexer cannot use seed='randomized' under "
                "multi-shard iteration with indexed sources: the weighted source "
                "distribution would drift across ranks. Use a fixed integer seed."
            )

        rng = random.Random(resolve_seed(self.seed))
        iters = [iter(it) for it in self.sources]
        if self._restored:
            self._restored = False
            exhausted = (
                list(self._exhausted)
                if self._exhausted is not None
                else [False] * len(iters)
            )
            if self._rng_state is not None:
                rng.setstate(self._rng_state)
        else:
            exhausted = [False] * len(iters)
        self._exhausted = exhausted

        def should_continue():
            return not any(exhausted) if self.stop_early else not all(exhausted)

        while should_continue():
            active_indexes, active_weights = zip(
                *[
                    (i, w)
                    for i, (done, w) in enumerate(zip(exhausted, self.weights))
                    if not done
                ]
            )
            idx = rng.choices(active_indexes, weights=active_weights, k=1)[0]
            self._rng_state = rng.getstate()
            try:
                item = next(iters[idx])
                graph_token = None
                if self.has_constant_time_access:
                    graph_token = require_graph_origin(
                        item, "LazyIteratorMultiplexer", "items"
                    )
                maybe_attach_graph_origin(
                    item, None if graph_token is None else (idx, graph_token)
                )
                yield item
            except StopIteration:
                exhausted[idx] = True
                continue

    def __len__(self) -> int:
        return sum(len(it) for it in self.sources)

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def state_dict(self) -> dict:
        return {
            "rng_state": self._rng_state,
            "exhausted": list(self._exhausted) if self._exhausted is not None else None,
            "inner_states": [_try_collect_child_state(s) for s in self.sources],
        }

    def load_state_dict(self, sd: dict) -> None:
        rng_state = sd["rng_state"]
        if rng_state is not None and not isinstance(rng_state, tuple):
            from lhotse_tpu.checkpoint import _rng_state_from_json

            rng_state = _rng_state_from_json(rng_state)
        self._rng_state = rng_state
        self._exhausted = sd["exhausted"]
        active = None
        if self._exhausted is not None:
            active = {i for i, done in enumerate(self._exhausted) if not done}
        for i, (s, inner_sd) in enumerate(zip(self.sources, sd.get("inner_states", []))):
            if active is not None and i not in active:
                continue
            _try_restore_child_state(s, inner_sd)
        self._restored = True


class LazyInfiniteApproximateMultiplexer(IteratorNode):
    """
    Infinite sample-with-replacement multiplexing over a pool of (typically
    sharded) sources, holding at most ``max_open_streams`` open iterators.
    Not checkpointable (approximate/infinite by design).
    """

    def __init__(
        self,
        *iterators: Iterable,
        stop_early: bool = False,
        weights: Optional[List[Union[int, float]]] = None,
        seed: Union[int, str] = 0,
        max_open_streams: Optional[int] = None,
    ) -> None:
        self.sources = [resolve_iterator_source(it) for it in iterators]
        self.stop_early = stop_early
        self.seed = seed
        self.max_open_streams = max_open_streams
        if max_open_streams is None or max_open_streams > len(self.sources):
            self.max_open_streams = len(self.sources)
        assert len(self.sources) > 0
        self.weights = weights if weights is not None else [1] * len(self.sources)
        assert len(self.sources) == len(self.weights)
        assert self.max_open_streams >= 1

    def __iter__(self):
        from lhotse_tpu.dataset.dataloading import resolve_seed

        rng = random.Random(resolve_seed(self.seed))
        indexes = list(range(len(self.sources)))

        def sample_stream():
            selected = rng.choices(indexes, self.weights, k=1)[0]
            return iter(self.sources[selected]), self.weights[selected]

        active_streams = []
        active_weights = []
        for _ in range(self.max_open_streams):
            s, w = sample_stream()
            active_streams.append(s)
            active_weights.append(w)
        stream_indexes = list(range(self.max_open_streams))

        while True:
            pos = rng.choices(
                stream_indexes,
                weights=active_weights if sum(active_weights) > 0 else None,
                k=1,
            )[0]
            try:
                yield next(active_streams[pos])
            except StopIteration:
                active_streams[pos], active_weights[pos] = sample_stream()
                yield next(active_streams[pos])


class LazyShuffler(IteratorNode):
    """
    Fixed-size reservoir streaming shuffle. With graph-restorable indexed
    sources, the shuffle buffer is checkpointed as graph-origin tokens and
    re-fetched on restore (O(buffer) token saves instead of item copies).
    """

    def __init__(
        self,
        iterator: Iterable,
        buffer_size: int = 10000,
        rng: Optional[random.Random] = None,
    ) -> None:
        self.source = resolve_iterator_source(iterator)
        self.buffer_size = buffer_size
        self.rng = rng if rng is not None else random.Random(random.getrandbits(64))
        self._buffer = deque()
        self._startup = True
        self._source_exhausted = False
        self._restored = False

    @property
    def is_checkpointable(self) -> bool:
        return supports_graph_restore(self.source)

    @property
    def is_indexed(self) -> bool:
        return getattr(self.source, "is_indexed", False)

    @property
    def has_constant_time_access(self) -> bool:
        return supports_graph_restore(self.source)

    def __getitem__(self, token: Any) -> Any:
        token = normalize_graph_token(token)
        return attach_graph_origin(self.source[token], token)

    def __iter__(self):
        source_iter = iter(self.source)
        if self._restored:
            self._restored = False
        else:
            self._buffer.clear()
            self._startup = True
            self._source_exhausted = False

        def next_item():
            try:
                return next(source_iter)
            except StopIteration:
                self._source_exhausted = True
                return None

        def top_up():
            if len(self._buffer) < self.buffer_size:
                item = next_item()
                if item is not None:
                    self._buffer.append(item)

        def swap(sample):
            if not self._buffer:
                return sample
            i = self.rng.randint(0, len(self._buffer) - 1)
            sample, self._buffer[i] = self._buffer[i], sample
            return sample

        # Startup: fill the buffer before yielding steadily.
        while self._startup and not self._source_exhausted:
            sample = next_item()
            if sample is None:
                break
            top_up()
            sample = swap(sample)
            if len(self._buffer) < self.buffer_size:
                self._buffer.append(sample)
                continue
            self._startup = False
            yield sample
        # Steady state: one in, one out.
        while not self._source_exhausted:
            sample = next_item()
            if sample is None:
                break
            top_up()
            yield swap(sample)
        # Drain.
        while self._buffer:
            yield self._buffer.popleft()

    def __len__(self) -> int:
        return len(self.source)

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def state_dict(self) -> dict:
        if not self.is_checkpointable:
            raise NotImplementedError(
                "LazyShuffler supports checkpointing only with graph-restorable sources."
            )
        from lhotse_tpu.checkpoint import _rng_state_to_json

        return {
            "buffer": [
                require_graph_origin(item, "LazyShuffler", "buffered items")
                for item in self._buffer
            ],
            "startup": self._startup,
            "source_exhausted": self._source_exhausted,
            "rng_state": _rng_state_to_json(self.rng.getstate()),
            "source": _try_collect_child_state(self.source),
        }

    def load_state_dict(self, sd: dict) -> None:
        if not self.is_checkpointable:
            raise NotImplementedError(
                "LazyShuffler supports checkpointing only with graph-restorable sources."
            )
        from lhotse_tpu.checkpoint import _rng_state_from_json

        _try_restore_child_state(self.source, sd.get("source"))
        self._buffer = deque(
            self.source[normalize_graph_token(token)] for token in sd.get("buffer", [])
        )
        self._startup = sd.get("startup", True)
        self._source_exhausted = sd.get("source_exhausted", False)
        self.rng.setstate(_rng_state_from_json(sd["rng_state"]))
        self._restored = True


#################################################
# Stateless combinators
#################################################


class LazyFilter(IteratorNode):
    """Lazy ``filter``; checkpointing delegates to the source."""

    is_checkpointable = True

    def __init__(self, iterator: Iterable, predicate: Callable[[Any], bool]) -> None:
        self.source = resolve_iterator_source(iterator)
        self.predicate = predicate
        assert callable(self.predicate), (
            f"LazyFilter: 'predicate' arg must be callable (got {predicate})."
        )
        if (
            isinstance(self.predicate, types.LambdaType)
            and self.predicate.__name__ == "<lambda>"
            and not is_module_available("dill")
        ):
            warnings.warn(
                "A lambda was passed to LazyFilter: it may prevent forking this "
                "process. Pass a regular function for multi-worker dataloading."
            )

    @property
    def is_indexed(self) -> bool:
        return getattr(self.source, "is_indexed", False)

    @property
    def has_constant_time_access(self) -> bool:
        return supports_graph_restore(self.source)

    def __getitem__(self, token: Any) -> Any:
        token = normalize_graph_token(token)
        item = self.source[token]
        if not self.predicate(item):
            raise RuntimeError(
                "LazyFilter received a graph restore token that does not satisfy "
                "its predicate."
            )
        return attach_graph_origin(item, token)

    def __iter__(self):
        return filter(self.predicate, self.source)

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def __len__(self) -> int:
        raise TypeError(
            "LazyFilter does not support __len__: it would require consuming "
            "the whole stream. Use .to_eager() first if you need the length."
        )

    def state_dict(self) -> dict:
        sd = {}
        source_state = _try_collect_child_state(self.source)
        if source_state is not None:
            sd["source"] = source_state
        return sd

    def load_state_dict(self, sd: dict) -> None:
        _try_restore_child_state(self.source, sd.get("source"))


class LazyMapper(IteratorNode):
    """Lazy ``map`` with an optional ``apply_fn`` gate; checkpointing delegates
    to the source."""

    is_checkpointable = True

    def __init__(
        self,
        iterator: Iterable,
        fn: Callable[[Any], Any],
        apply_fn: Optional[Callable[[Any], bool]] = None,
    ) -> None:
        self.source = resolve_iterator_source(iterator)
        self.fn = fn
        self.apply_fn = apply_fn
        assert callable(self.fn), f"LazyMapper: 'fn' arg must be callable (got {fn})."
        if self.apply_fn is not None:
            assert callable(self.apply_fn)
        if (
            isinstance(self.fn, types.LambdaType)
            and self.fn.__name__ == "<lambda>"
            and not is_dill_enabled()
        ):
            warnings.warn(
                "A lambda was passed to LazyMapper: it may prevent forking this "
                "process. Pass a regular function for multi-worker dataloading."
            )

    @property
    def is_indexed(self) -> bool:
        return getattr(self.source, "is_indexed", False)

    @property
    def has_constant_time_access(self) -> bool:
        return supports_graph_restore(self.source)

    def __getitem__(self, idx: Any) -> Any:
        graph_token = normalize_graph_token(idx)
        item = self.source[graph_token]
        if self.apply_fn is None or self.apply_fn(item):
            item = self.fn(item)
        return attach_graph_origin(item, graph_token)

    def __iter__(self):
        for item in self.source:
            graph_idx = get_graph_origin(item)
            if self.apply_fn is None or self.apply_fn(item):
                item = self.fn(item)
            yield maybe_attach_graph_origin(item, graph_idx)

    def __len__(self) -> int:
        return len(self.source)

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def state_dict(self) -> dict:
        sd = {}
        source_state = _try_collect_child_state(self.source)
        if source_state is not None:
            sd["source"] = source_state
        return sd

    def load_state_dict(self, sd: dict) -> None:
        _try_restore_child_state(self.source, sd.get("source"))


class LazyFlattener(IteratorNode):
    """
    Flattens an iterable of collections into an iterable of items. With
    graph-restorable outer sources, checkpoints (outer token, inner offset).
    """

    def __init__(self, iterator: Iterable) -> None:
        self.source = resolve_iterator_source(iterator)
        self._active_outer_token = None
        self._inner_position = 0
        self._restored = False

    @property
    def is_checkpointable(self) -> bool:
        return supports_graph_restore(self.source)

    @property
    def is_indexed(self) -> bool:
        return getattr(self.source, "is_indexed", False)

    @property
    def has_constant_time_access(self) -> bool:
        return supports_graph_restore(self.source)

    def _inner_token(self, item: Any, inner_idx: int) -> Any:
        token = get_graph_origin(item)
        return inner_idx if token is None else token

    def _restore_inner_item(self, collection: Any, token: Any) -> Any:
        collection = resolve_iterator_source(collection)
        token = normalize_graph_token(token)
        if isinstance(token, int):
            if hasattr(collection, "__getitem__"):
                return collection[token]
            for idx, item in enumerate(collection):
                if idx == token:
                    return item
            raise IndexError(
                f"LazyFlattener inner index {token} out of range for "
                f"{type(collection).__name__}."
            )
        if supports_graph_restore(collection):
            return collection[token]
        raise RuntimeError(
            "LazyFlattener received a non-integer inner graph token for a "
            "collection that does not support graph restoration."
        )

    def __getitem__(self, idx: Any) -> Any:
        token = normalize_graph_token(idx)
        if not isinstance(token, tuple) or len(token) != 2:
            raise TypeError(
                "LazyFlattener expects graph tokens shaped like (outer, inner)."
            )
        outer_token, inner_token = token
        collection = self.source[outer_token]
        item = self._restore_inner_item(collection, inner_token)
        return attach_graph_origin(item, token)

    def _iter_collection(self, collection, outer_token, start_inner: int = 0):
        collection = resolve_iterator_source(collection)
        for inner_idx, item in enumerate(collection):
            if inner_idx < start_inner:
                continue
            self._active_outer_token = outer_token
            self._inner_position = inner_idx + 1
            token = None
            if outer_token is not None:
                token = (outer_token, self._inner_token(item, inner_idx))
            yield maybe_attach_graph_origin(item, token)
        self._active_outer_token = None
        self._inner_position = 0

    def __iter__(self):
        if self._restored and self._active_outer_token is not None:
            collection = self.source[self._active_outer_token]
            yield from self._iter_collection(
                collection, self._active_outer_token, start_inner=self._inner_position
            )
        self._restored = False
        for cuts in self.source:
            outer_token = (
                require_graph_origin(cuts, "LazyFlattener", "outer collections")
                if self.is_checkpointable
                else None
            )
            yield from self._iter_collection(cuts, outer_token)

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def __len__(self) -> int:
        raise TypeError(
            "LazyFlattener does not support __len__: it would require consuming "
            "the whole stream."
        )

    def state_dict(self) -> dict:
        if not self.is_checkpointable:
            raise NotImplementedError(
                "LazyFlattener supports checkpointing only with graph-restorable "
                "outer sources."
            )
        return {
            "active_outer_token": self._active_outer_token,
            "inner_position": self._inner_position,
            "source": _try_collect_child_state(self.source),
        }

    def load_state_dict(self, sd: dict) -> None:
        if not self.is_checkpointable:
            raise NotImplementedError(
                "LazyFlattener supports checkpointing only with graph-restorable "
                "outer sources."
            )
        self._active_outer_token = normalize_graph_token(sd.get("active_outer_token"))
        self._inner_position = sd.get("inner_position", 0)
        _try_restore_child_state(self.source, sd.get("source"))
        self._restored = True


class LazyRepeater(IteratorNode):
    """Repeat the source N times or infinitely; checkpoints (epoch, source state)."""

    is_checkpointable = True

    def __init__(
        self, iterator: Iterable, times: Optional[int] = None, preserve_id: bool = False
    ) -> None:
        self.source = resolve_iterator_source(iterator)
        self.times = times
        self.preserve_id = preserve_id
        assert self.times is None or self.times > 0
        self._current_epoch = 0
        self._restored = False

    @property
    def is_indexed(self) -> bool:
        return getattr(self.source, "is_indexed", False)

    @property
    def has_constant_time_access(self) -> bool:
        return supports_graph_restore(self.source)

    def __getitem__(self, idx: Any) -> Any:
        graph_token = normalize_graph_token(idx)
        if isinstance(graph_token, tuple) and len(graph_token) == 2:
            repeat_idx, source_token = graph_token
            item = self.source[source_token]
        else:
            n = len(self.source)
            repeat_idx = graph_token // n
            item = self.source[graph_token % n]
        if self.preserve_id:
            return attach_graph_origin(item, graph_token)
        return attach_graph_origin(attach_repeat_idx_to_id(item, repeat_idx), graph_token)

    def __iter__(self):
        restored = self._restored
        epoch = self._current_epoch if restored else 0
        self._restored = False
        while self.times is None or epoch < self.times:
            self._current_epoch = epoch
            if self.preserve_id:
                iterator = self.source
            else:
                iterator = LazyMapper(self.source, partial(attach_repeat_idx_to_id, idx=epoch))
            at_least_once = False
            for item in iterator:
                at_least_once = True
                source_idx = get_graph_origin(item)
                maybe_attach_graph_origin(
                    item, None if source_idx is None else (epoch, source_idx)
                )
                yield item
            if not at_least_once and not restored:
                return  # avoid hanging on empty iterables
            restored = False
            epoch += 1

    def __len__(self) -> int:
        if self.times is None:
            raise TypeError(
                f"object of type '{type(self).__name__}' is an infinite iterator"
            )
        return len(self.source) * self.times

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def state_dict(self) -> dict:
        sd = {"current_epoch": self._current_epoch}
        source_state = _try_collect_child_state(self.source)
        if source_state is not None:
            sd["source"] = source_state
        return sd

    def load_state_dict(self, sd: dict) -> None:
        self._current_epoch = sd["current_epoch"]
        _try_restore_child_state(self.source, sd.get("source"))
        self._restored = True


class LazySlicer(IteratorNode):
    """Select every n-th item starting at k — the primitive for splitting work
    across processes. Checkpoints the source offset."""

    is_checkpointable = True

    def __init__(self, iterator: Iterable, k: int, n: int) -> None:
        self.source = resolve_iterator_source(iterator)
        assert k < n, (
            f"When selecting k-th element every n elements, k must be less than n "
            f"(got k={k} n={n})."
        )
        self.k = k
        self.n = n
        self._source_offset = 0
        self._restored = False

    @property
    def is_indexed(self) -> bool:
        return getattr(self.source, "is_indexed", False)

    @property
    def has_constant_time_access(self) -> bool:
        return supports_graph_restore(self.source)

    def __getitem__(self, idx: Any) -> Any:
        graph_token = normalize_graph_token(idx)
        if (
            isinstance(graph_token, tuple)
            and len(graph_token) == 2
            and graph_token[0] == "source"
        ):
            return attach_graph_origin(self.source[graph_token[1]], graph_token)
        if isinstance(graph_token, int):
            return attach_graph_origin(self.source[graph_token * self.n + self.k], idx)
        return attach_graph_origin(self.source[graph_token], graph_token)

    def __iter__(self):
        start = self._source_offset if self._restored else 0
        self._restored = False
        for idx, item in enumerate(self.source, start=start):
            self._source_offset = idx + 1
            if idx % self.n == self.k:
                source_idx = get_graph_origin(item)
                maybe_attach_graph_origin(
                    item, None if source_idx is None else ("source", source_idx)
                )
                yield item

    def __add__(self, other) -> "LazyIteratorChain":
        return LazyIteratorChain(self, other)

    def __len__(self) -> int:
        raise TypeError(
            "LazySlicer does not support __len__: it would require consuming "
            "the whole stream."
        )

    def state_dict(self) -> dict:
        sd = {"source_offset": self._source_offset}
        source_state = _try_collect_child_state(self.source)
        if source_state is not None:
            sd["source"] = source_state
        return sd

    def load_state_dict(self, sd: dict) -> None:
        self._source_offset = sd.get("source_offset", 0)
        _try_restore_child_state(self.source, sd.get("source"))
        self._restored = True


def attach_repeat_idx_to_id(item: Any, idx: int) -> Any:
    if not hasattr(item, "id"):
        return item
    return fastcopy(item, id=f"{item.id}_repeat{idx}")


def count_newlines_fast(path: Pathlike):
    """Count newlines with buffered chunk reads."""

    def _chunks(reader):
        b = reader(1 << 16)
        while b:
            yield b
            b = reader(1 << 16)

    read_mode = "rb" if not str(path) == "-" else "r"
    with open_best(path, read_mode) as f:
        count = sum(buf.count(b"\n") for buf in _chunks(f.read))
    return count
