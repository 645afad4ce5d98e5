"""
Exhaustive exact-resume sweeps over composed lazy iterator graphs.

Behavioral model: /root/reference/test/test_lazy_stateful.py and
test/test_iterator_node_e2e_checkpoint.py — for every prefix length k of
every graph shape: iterate k items, checkpoint, rebuild the graph fresh,
restore, and require the continuation to reproduce the uninterrupted run
item-for-item.
"""
import json
import random

import pytest

from lhotse_tpu.checkpoint import (
    DataloaderCheckpoint,
    collect_state_dict,
    restore_state_dict,
)
from lhotse_tpu.indexing import create_jsonl_index
from lhotse_tpu.lazy import (
    LazyFilter,
    LazyFlattener,
    LazyIndexedManifestIterator,
    LazyIteratorChain,
    LazyIteratorMultiplexer,
    LazyJsonlIterator,
    LazyMapper,
    LazyRepeater,
    LazyShuffler,
    LazySlicer,
)
from lhotse_tpu.testing.dummies import dummy_supervision
from lhotse_tpu.utils import fastcopy


def _write_jsonl(path, ids):
    with path.open("w") as f:
        for i in ids:
            print(json.dumps(dummy_supervision(i).to_dict()), file=f)
    create_jsonl_index(path)
    return path


@pytest.fixture
def src_a(tmp_path):
    return _write_jsonl(tmp_path / "a.jsonl", range(9))


@pytest.fixture
def src_b(tmp_path):
    return _write_jsonl(tmp_path / "b.jsonl", range(100, 107))


def _sid(item):
    return item.id if hasattr(item, "id") else item["id"]


def _mark(sup):
    return fastcopy(sup, id=sup.id + "-m")


def _keep_most(sup):
    return not sup.id.endswith("3")


def assert_exact_resume_everywhere(make_graph):
    """Checkpoint/restore at EVERY stream position must continue exactly."""
    baseline = [_sid(x) for x in make_graph()]
    assert baseline, "graph under test yielded nothing"
    for k in range(len(baseline) + 1):
        graph = make_graph()
        stream = iter(graph)
        head = [_sid(next(stream)) for _ in range(k)]
        state = collect_state_dict(graph)

        fresh = make_graph()
        restore_state_dict(fresh, state)
        tail = [_sid(x) for x in fresh]
        assert head + tail == baseline, (
            f"resume at k={k}: {head + tail} != {baseline}"
        )


# ---------------------------------------------------------------------------
# Single-node and stacked-transform graphs
# ---------------------------------------------------------------------------
def test_plain_jsonl_leaf(src_a):
    assert_exact_resume_everywhere(lambda: LazyJsonlIterator(src_a))


def test_indexed_leaf_strided_and_shuffled(src_a):
    assert_exact_resume_everywhere(lambda: LazyIndexedManifestIterator(src_a))
    assert_exact_resume_everywhere(
        lambda: LazyIndexedManifestIterator(src_a, shuffle=True, seed=7)
    )


def test_mapper_over_filter_over_indexed(src_a):
    assert_exact_resume_everywhere(
        lambda: LazyMapper(
            LazyFilter(LazyIndexedManifestIterator(src_a), _keep_most), _mark
        )
    )


def test_shuffler_over_indexed(src_a):
    # Buffer smaller than the stream so trades, warm-up, and drain phases
    # all occur; the buffer checkpoints as origin tokens.
    assert_exact_resume_everywhere(
        lambda: LazyShuffler(
            LazyIndexedManifestIterator(src_a),
            buffer_size=3,
            rng=random.Random(5),
        )
    )


def test_shuffler_over_mapper_over_indexed(src_a):
    assert_exact_resume_everywhere(
        lambda: LazyShuffler(
            LazyMapper(LazyIndexedManifestIterator(src_a), _mark),
            buffer_size=4,
            rng=random.Random(11),
        )
    )


def test_shuffler_requires_restorable_source(src_a):
    import io

    raw = [json.loads(l) for l in open(src_a)]
    shuf = LazyShuffler(iter(raw), buffer_size=2, rng=random.Random(0))
    assert not shuf.is_checkpointable
    with pytest.raises(NotImplementedError):
        shuf.state_dict()


def test_repeater_over_indexed(src_a):
    assert_exact_resume_everywhere(
        lambda: LazyRepeater(LazyIndexedManifestIterator(src_a), times=2)
    )


def test_slicer_over_indexed(src_a):
    assert_exact_resume_everywhere(
        lambda: LazySlicer(LazyIndexedManifestIterator(src_a), 1, 3)
    )


# ---------------------------------------------------------------------------
# Multi-source graphs
# ---------------------------------------------------------------------------
def test_chain_by_source_resume_across_boundary(src_a, src_b):
    assert_exact_resume_everywhere(
        lambda: LazyIteratorChain(
            LazyIndexedManifestIterator(src_a),
            LazyIndexedManifestIterator(src_b),
        )
    )


def test_chain_global_item_shuffle(src_a, src_b):
    assert_exact_resume_everywhere(
        lambda: LazyIteratorChain(
            LazyIndexedManifestIterator(src_a),
            LazyIndexedManifestIterator(src_b),
            shuffle_iters=True,
            seed=2,
        )
    )


def test_mux_fixed_seed(src_a, src_b):
    assert_exact_resume_everywhere(
        lambda: LazyIteratorMultiplexer(
            LazyIndexedManifestIterator(src_a),
            LazyIndexedManifestIterator(src_b),
            seed=13,
        )
    )


def test_mux_weighted_with_transforms(src_a, src_b):
    assert_exact_resume_everywhere(
        lambda: LazyIteratorMultiplexer(
            LazyMapper(LazyIndexedManifestIterator(src_a), _mark),
            LazyIndexedManifestIterator(src_b),
            weights=[3, 1],
            seed=4,
        )
    )


def test_deep_composite_graph(src_a, src_b):
    # chain(mux(map(a), b-shuffled-leaf)) piped through filter+repeat: a
    # realistically deep training-input graph.
    def make():
        mux = LazyIteratorMultiplexer(
            LazyMapper(LazyIndexedManifestIterator(src_a), _mark),
            LazyIndexedManifestIterator(src_b, shuffle=True, seed=3),
            seed=1,
        )
        return LazyRepeater(LazyFilter(mux, _keep_most), times=2)

    assert_exact_resume_everywhere(make)


# ---------------------------------------------------------------------------
# Flattener
# ---------------------------------------------------------------------------
def _explode(sup):
    return [fastcopy(sup, id=sup.id + "-x"), fastcopy(sup, id=sup.id + "-y")]


def test_flattener_over_exploding_mapper(src_a):
    make = lambda: LazyFlattener(
        LazyMapper(LazyIndexedManifestIterator(src_a), _explode)
    )
    graph = make()
    if not graph.is_checkpointable:
        pytest.skip("flattener over this source is not checkpointable")
    assert_exact_resume_everywhere(make)


# ---------------------------------------------------------------------------
# JSON round-trip of a composed checkpoint
# ---------------------------------------------------------------------------
def test_composed_checkpoint_survives_json(tmp_path, src_a, src_b):
    def make():
        return LazyShuffler(
            LazyIteratorChain(
                LazyIndexedManifestIterator(src_a),
                LazyIndexedManifestIterator(src_b),
            ),
            buffer_size=4,
            rng=random.Random(21),
        )

    baseline = [_sid(x) for x in make()]
    graph = make()
    stream = iter(graph)
    head = [_sid(next(stream)) for _ in range(6)]

    ckpt = DataloaderCheckpoint(
        num_workers=1,
        world_size=1,
        rank=0,
        worker_states=[collect_state_dict(graph)],
        sampler_state={},
    )
    path = tmp_path / "ckpt.json"
    ckpt.save(path)
    json.loads(path.read_text())  # strictly JSON on disk

    fresh = make()
    restore_state_dict(fresh, DataloaderCheckpoint.load(path).worker_states[0])
    assert head + [_sid(x) for x in fresh] == baseline
