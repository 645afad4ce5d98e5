"""
Lazy iterator runtime nodes: chain, multiplexers, shuffler, filter/map/
flatten/repeat/slice, and their checkpoint (state_dict) protocol
(reference surface: lhotse/lazy.py; reference tests: test/test_lazy.py,
test/test_multiplexing_iterables.py, test/test_lazy_stateful.py).
"""
import pickle

import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.lazy import (
    LazyFilter,
    LazyFlattener,
    LazyInfiniteApproximateMultiplexer,
    LazyIteratorChain,
    LazyIteratorMultiplexer,
    LazyMapper,
    LazyRepeater,
    LazyShuffler,
    LazySlicer,
)
from lhotse_tpu.testing.dummies import DummyManifest


@pytest.fixture
def cuts10():
    return DummyManifest(CutSet, begin_id=0, end_id=10)


def ids(iterable):
    return [c.id for c in iterable]


def test_chain_concatenates_in_order(cuts10):
    a = DummyManifest(CutSet, begin_id=0, end_id=3)
    b = DummyManifest(CutSet, begin_id=3, end_id=7)
    chained = LazyIteratorChain(a, b)
    assert ids(chained) == ids(a) + ids(b)
    assert len(chained) == 7


def test_multiplexer_is_a_permutation_and_deterministic():
    a = DummyManifest(CutSet, begin_id=0, end_id=5)
    b = DummyManifest(CutSet, begin_id=100, end_id=105)
    mux = LazyIteratorMultiplexer(a, b, seed=7)
    first = ids(mux)
    assert sorted(first) == sorted(ids(a) + ids(b))
    assert ids(LazyIteratorMultiplexer(a, b, seed=7)) == first
    assert ids(LazyIteratorMultiplexer(a, b, seed=8)) != first


def test_multiplexer_weights_bias_the_interleave():
    a = DummyManifest(CutSet, begin_id=0, end_id=50)
    b = DummyManifest(CutSet, begin_id=100, end_id=150)
    mux = LazyIteratorMultiplexer(a, b, weights=[10, 1], seed=0)
    first_20 = ids(mux)[:20]
    n_from_a = sum(1 for i in first_20 if not i.startswith("dummy-mono-cut-01"))
    assert n_from_a > 14  # heavily weighted toward source a


def test_multiplexer_stop_early_ends_at_first_exhaustion():
    a = DummyManifest(CutSet, begin_id=0, end_id=2)
    b = DummyManifest(CutSet, begin_id=100, end_id=150)
    out = ids(LazyIteratorMultiplexer(a, b, stop_early=True, seed=3))
    assert len(out) < 52


def test_multiplexer_requires_two_sources(cuts10):
    with pytest.raises(AssertionError):
        LazyIteratorMultiplexer(cuts10)


def test_multiplexer_checkpoint_resumes_exactly(tmp_path):
    # Exact resume needs checkpointable children: lazy jsonl-backed sources.
    def lazy(begin, end, name):
        p = tmp_path / f"{name}.jsonl.gz"
        DummyManifest(CutSet, begin_id=begin, end_id=end).to_file(p)
        return CutSet.from_jsonl_lazy(p)

    a1, b1 = lazy(0, 20, "a"), lazy(100, 120, "b")
    full = ids(LazyIteratorMultiplexer(a1, b1, seed=42))

    a2, b2 = lazy(0, 20, "a2"), lazy(100, 120, "b2")
    mux2 = LazyIteratorMultiplexer(a2, b2, seed=42)
    it = iter(mux2)
    head = [next(it).id for _ in range(11)]
    state = pickle.loads(pickle.dumps(mux2.state_dict()))

    a3, b3 = lazy(0, 20, "a3"), lazy(100, 120, "b3")
    mux3 = LazyIteratorMultiplexer(a3, b3, seed=42)
    mux3.load_state_dict(state)
    tail = ids(mux3)
    assert head + tail == full


def test_infinite_mux_samples_endlessly_with_few_open_streams():
    sources = [DummyManifest(CutSet, begin_id=i * 10, end_id=i * 10 + 3) for i in range(4)]
    mux = LazyInfiniteApproximateMultiplexer(*sources, max_open_streams=2, seed=0)
    it = iter(mux)
    drawn = [next(it).id for _ in range(50)]
    assert len(drawn) == 50  # keeps producing past any single source's length
    assert len(set(drawn)) > 3  # mixes more than one source


def test_shuffler_permutes_within_buffer_deterministically(cuts10):
    import random

    shuf = LazyShuffler(cuts10, buffer_size=5, rng=random.Random(7))
    out = ids(shuf)
    assert sorted(out) == sorted(ids(cuts10))
    assert out != ids(cuts10)
    again = ids(LazyShuffler(cuts10, buffer_size=5, rng=random.Random(7)))
    assert again == out


def test_filter_map_flatten_repeat_slice(cuts10):
    kept = ids(LazyFilter(cuts10, lambda c: c.id.endswith(("1", "3"))))
    assert all(i.endswith(("1", "3")) for i in kept) and len(kept) == 2

    mapped = list(LazyMapper(cuts10, lambda c: c.id.upper()))
    assert mapped == [i.upper() for i in ids(cuts10)]

    flat = list(LazyFlattener([[1, 2], [3], [4, 5]]))
    assert flat == [1, 2, 3, 4, 5]

    # Repeated passes get "_repeatN" id suffixes unless preserve_id is set.
    twice = ids(LazyRepeater(cuts10, times=2, preserve_id=True))
    assert twice == ids(cuts10) * 2
    suffixed = ids(LazyRepeater(cuts10, times=2))
    assert sorted(set(i.rsplit("_repeat", 1)[0] for i in suffixed)) == sorted(ids(cuts10))

    sliced = ids(LazySlicer(cuts10, k=0, n=3))
    assert sliced == ids(cuts10)[0::3]


def test_cutset_algorithm_mixin_routes_through_lazy_nodes(cuts10):
    out = (
        cuts10.repeat(2, preserve_id=True)
        .filter(lambda c: c.id.endswith("2"))
        .map(lambda c: c.with_id(c.id + "-x"))
    )
    assert ids(out) == ["dummy-mono-cut-0002-x"] * 2


def test_mux_classmethod_equivalent(cuts10):
    a = DummyManifest(CutSet, begin_id=0, end_id=5)
    b = DummyManifest(CutSet, begin_id=100, end_id=105)
    assert ids(CutSet.mux(a, b, seed=11)) == ids(LazyIteratorMultiplexer(a, b, seed=11))


def test_multiplexer_pickling(tmp_path):
    import json
    import pickle

    from lhotse_tpu.indexing import create_jsonl_index
    from lhotse_tpu.lazy import LazyIndexedManifestIterator, LazyIteratorMultiplexer
    from lhotse_tpu.testing.dummies import dummy_supervision

    paths = []
    for src, base in (("a", 0), ("b", 50)):
        p = tmp_path / f"{src}.jsonl"
        with p.open("w") as f:
            for i in range(base, base + 5):
                print(json.dumps(dummy_supervision(i).to_dict()), file=f)
        create_jsonl_index(p)
        paths.append(p)
    mux = LazyIteratorMultiplexer(
        LazyIndexedManifestIterator(paths[0]),
        LazyIndexedManifestIterator(paths[1]),
        seed=4,
    )
    clone = pickle.loads(pickle.dumps(mux))
    assert [s.id for s in clone] == [s.id for s in mux]


def test_cut_set_mux_pickling():
    import pickle

    from lhotse_tpu import CutSet
    from lhotse_tpu.testing.dummies import DummyManifest

    a = DummyManifest(CutSet, begin_id=0, end_id=4)
    b = DummyManifest(CutSet, begin_id=10, end_id=14)
    muxed = CutSet.mux(a, b, seed=0)
    clone = pickle.loads(pickle.dumps(muxed))
    assert [c.id for c in clone] == [c.id for c in muxed]
