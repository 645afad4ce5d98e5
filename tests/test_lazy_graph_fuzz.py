"""
Randomized lazy-graph checkpoint fuzzer: build random compositions of the
lazy combinators over indexed leaves, cut the stream at a random position,
checkpoint, rebuild fresh, restore, and require exact continuation.

Complements the deterministic sweeps in test_lazy_stateful_deep.py with
composition coverage (shuffler-over-chain, slicer-over-mux, nested
transforms, ...) the hand-written matrix cannot enumerate.
"""
import json
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from lhotse_tpu.checkpoint import collect_state_dict, restore_state_dict
from lhotse_tpu.indexing import create_jsonl_index
from lhotse_tpu.lazy import (
    LazyFilter,
    LazyIndexedManifestIterator,
    LazyIteratorChain,
    LazyIteratorMultiplexer,
    LazyMapper,
    LazyRepeater,
    LazyShuffler,
    LazySlicer,
)
from lhotse_tpu.testing.dummies import dummy_supervision
from lhotse_tpu.utils import fastcopy

_N_PER_SOURCE = 7
_SOURCE_DIRS = {}


def _sources(tmp_path_factory):
    """Two indexed jsonl manifests, created once per session."""
    key = "fuzz"
    if key not in _SOURCE_DIRS:
        d = tmp_path_factory.mktemp("lazy_fuzz")
        paths = []
        for src, base in (("a", 0), ("b", 100)):
            p = d / f"{src}.jsonl"
            with p.open("w") as f:
                for i in range(base, base + _N_PER_SOURCE):
                    print(json.dumps(dummy_supervision(i).to_dict()), file=f)
            create_jsonl_index(p)
            paths.append(p)
        _SOURCE_DIRS[key] = paths
    return _SOURCE_DIRS[key]


def _mark(sup):
    return fastcopy(sup, id=sup.id + "-m")


def _keep(sup):
    return not sup.id.endswith("2")


# A graph BLUEPRINT is a nested tuple the strategy can generate and we can
# replay deterministically to construct identical graphs twice.
def _leaf_bp():
    return st.tuples(
        st.just("leaf"), st.integers(0, 1), st.booleans(), st.integers(0, 3)
    )


def _graph_bp(depth):
    if depth == 0:
        return _leaf_bp()
    sub = _graph_bp(depth - 1)
    return st.one_of(
        _leaf_bp(),
        st.tuples(st.just("map"), sub),
        st.tuples(st.just("filter"), sub),
        st.tuples(st.just("shuffle"), st.integers(2, 5), st.integers(0, 3), sub),
        st.tuples(st.just("repeat"), st.integers(1, 2), sub),
        st.tuples(st.just("slice"), st.integers(0, 1), sub),
        st.tuples(st.just("chain"), st.booleans(), st.integers(0, 3), sub, sub),
        st.tuples(st.just("mux"), st.integers(0, 3), sub, sub),
    )


def _build(bp, paths):
    kind = bp[0]
    if kind == "leaf":
        _, which, shuffle, seed = bp
        return LazyIndexedManifestIterator(
            paths[which], shuffle=shuffle, seed=seed
        )
    if kind == "map":
        return LazyMapper(_build(bp[1], paths), _mark)
    if kind == "filter":
        return LazyFilter(_build(bp[1], paths), _keep)
    if kind == "shuffle":
        _, buf, seed, sub = bp
        return LazyShuffler(
            _build(sub, paths), buffer_size=buf, rng=random.Random(seed)
        )
    if kind == "repeat":
        return LazyRepeater(_build(bp[2], paths), times=bp[1])
    if kind == "slice":
        return LazySlicer(_build(bp[2], paths), bp[1], 2)
    if kind == "chain":
        _, shuffle_iters, seed, s1, s2 = bp
        return LazyIteratorChain(
            _build(s1, paths), _build(s2, paths),
            shuffle_iters=shuffle_iters, seed=seed)
    if kind == "mux":
        _, seed, s1, s2 = bp
        return LazyIteratorMultiplexer(_build(s1, paths), _build(s2, paths), seed=seed)
    raise AssertionError(bp)


def _ids(graph):
    return [item.id for item in graph]


@settings(max_examples=120, deadline=None)
@given(bp=_graph_bp(depth=3), cut_frac=st.floats(0.0, 1.0))
def test_random_graph_resumes_exactly(tmp_path_factory, bp, cut_frac):
    paths = _sources(tmp_path_factory)

    graph = _build(bp, paths)
    if not getattr(graph, "is_checkpointable", False):
        return  # e.g. shuffler over a non-restorable composite: out of scope

    try:
        baseline = _ids(_build(bp, paths))
    except Exception:
        return  # blueprint not iterable in this configuration: out of scope
    if not baseline:
        return

    k = int(round(cut_frac * len(baseline)))
    stream = iter(graph)
    head = [next(stream).id for _ in range(k)]
    try:
        state = collect_state_dict(graph)
    except NotImplementedError:
        return  # loud refusal is acceptable; silent wrong resume is not

    fresh = _build(bp, paths)
    restore_state_dict(fresh, state)
    tail = _ids(fresh)
    assert head + tail == baseline, (
        f"blueprint={bp} k={k}: {head + tail} != {baseline}"
    )


def test_repeat_over_chain_with_shuffler_resumes_at_pass_boundary(tmp_path_factory):
    """Regression (found by the fuzzer): checkpointing EXACTLY at a repeat
    pass boundary must carry the shuffler's advanced RNG into the restored
    graph even though the shuffler is not the chain's active child at that
    moment — otherwise the next pass replays the previous pass's order.
    Blueprint: repeat(2, chain(shuffle(leaf), leaf))."""
    paths = _sources(tmp_path_factory)
    bp = ("repeat", 2, ("chain", False, 0, ("shuffle", 2, 0, ("leaf", 0, False, 0)), ("leaf", 0, False, 0)))

    baseline = _ids(_build(bp, paths))
    pass_len = len(baseline) // 2

    for k in (pass_len - 1, pass_len, pass_len + 1):
        graph = _build(bp, paths)
        stream = iter(graph)
        head = [next(stream).id for _ in range(k)]
        state = collect_state_dict(graph)
        fresh = _build(bp, paths)
        restore_state_dict(fresh, state)
        tail = _ids(fresh)
        assert head + tail == baseline, f"k={k}"
