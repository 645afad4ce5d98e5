"""
Deep coverage of distributed/worker partitioning over indexed sources.

Behavioral model: /root/reference/test/test_partition.py — the
(rank x worker) shard math, partition-aware indexed iteration with
topology-validated resume, chain global shuffle, and multiplexer
partition semantics.
"""
import json

import pytest

from lhotse_tpu.dataset.dataloading import (
    LHOTSE_PROCESS_SEED,
    LHOTSE_USE_WORKER_PARTITION,
    PartitionedIndexedIterator,
    WorkerInfo,
    get_worker_partition,
    set_worker_info,
    worker_init_fn,
)
from lhotse_tpu.indexing import create_jsonl_index
from lhotse_tpu.lazy import (
    LazyIndexedManifestIterator,
    LazyIteratorChain,
    LazyIteratorMultiplexer,
)
from lhotse_tpu.testing.dummies import dummy_supervision


@pytest.fixture(autouse=True)
def _clean_worker_context():
    """Each test starts AND ends as an un-partitioned main process.

    Deliberately not monkeypatch: worker_init_fn writes os.environ directly,
    and monkeypatch's teardown would RESTORE those leaked values instead of
    clearing them for the rest of the session.
    """
    import os

    names = ("RANK", "WORLD_SIZE", LHOTSE_USE_WORKER_PARTITION, LHOTSE_PROCESS_SEED)
    saved = {k: os.environ.pop(k, None) for k in names}
    set_worker_info(None)
    yield
    for k in names:
        os.environ.pop(k, None)
        if saved[k] is not None:
            os.environ[k] = saved[k]
    set_worker_info(None)


def _write_jsonl(path, ids):
    with path.open("w") as f:
        for i in ids:
            print(json.dumps(dummy_supervision(i).to_dict()), file=f)
    create_jsonl_index(path)
    return path


@pytest.fixture
def indexed_jsonl(tmp_path):
    return _write_jsonl(tmp_path / "a.jsonl", range(12))


@pytest.fixture
def two_indexed_jsonls(tmp_path):
    return (
        _write_jsonl(tmp_path / "a.jsonl", range(8)),
        _write_jsonl(tmp_path / "b.jsonl", range(100, 109)),  # uneven sizes
    )


# ---------------------------------------------------------------------------
# get_worker_partition / worker_init_fn
# ---------------------------------------------------------------------------
def test_partition_inactive_without_opt_in(monkeypatch):
    # RANK/WORLD_SIZE alone must NOT shard data: only worker_init_fn's
    # explicit opt-in flag activates partitioning (otherwise a training
    # script that merely sets RANK would silently drop data).
    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "4")
    assert get_worker_partition() == (0, 1)


def test_partition_rank_only(monkeypatch):
    monkeypatch.setenv("RANK", "2")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv(LHOTSE_USE_WORKER_PARTITION, "1")
    assert get_worker_partition() == (2, 4)


def test_partition_combines_rank_and_worker(monkeypatch):
    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "2")
    monkeypatch.setenv(LHOTSE_USE_WORKER_PARTITION, "1")
    set_worker_info(WorkerInfo(id=2, num_workers=3))
    # shard = rank*W + worker = 1*3+2 = 5 of world*W = 6
    assert get_worker_partition() == (5, 6)


def test_worker_init_fn_sets_env_and_seed(monkeypatch):
    import os

    worker_init_fn(worker_id=1, rank=3, world_size=4, seed=10)
    assert os.environ["RANK"] == "3"
    assert os.environ["WORLD_SIZE"] == "4"
    assert os.environ[LHOTSE_USE_WORKER_PARTITION] == "1"
    # seed + 100*worker + 100000*rank
    assert os.environ[LHOTSE_PROCESS_SEED] == str(10 + 100 * 1 + 100000 * 3)


def test_worker_init_fn_without_rank_does_not_activate(monkeypatch):
    import os

    worker_init_fn(worker_id=0, seed=5)
    assert LHOTSE_USE_WORKER_PARTITION not in os.environ
    assert get_worker_partition() == (0, 1)


def test_worker_init_fn_requires_both_rank_and_world():
    with pytest.raises(AssertionError):
        worker_init_fn(worker_id=0, rank=1, world_size=None)


# ---------------------------------------------------------------------------
# PartitionedIndexedIterator
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("shuffle", [False, True])
def test_single_shard_full_coverage(shuffle):
    it = PartitionedIndexedIterator(shuffle=shuffle, seed=1)
    got = list(it.iterate(20, partition=(0, 1)))
    assert sorted(got) == list(range(20))
    if not shuffle:
        assert got == list(range(20))


@pytest.mark.parametrize("shuffle", [False, True])
@pytest.mark.parametrize("world_size", [2, 3, 5])
def test_multi_shard_disjoint_and_complete(shuffle, world_size):
    n = 23
    pieces = [
        list(
            PartitionedIndexedIterator(shuffle=shuffle, seed=7).iterate(
                n, partition=(r, world_size)
            )
        )
        for r in range(world_size)
    ]
    flat = sorted(x for p in pieces for x in p)
    assert flat == list(range(n))
    sizes = sorted(len(p) for p in pieces)
    assert sizes[-1] - sizes[0] <= 1


@pytest.mark.parametrize("shuffle", [False, True])
def test_resume_from_middle_is_exact(shuffle):
    it = PartitionedIndexedIterator(shuffle=shuffle, seed=3)
    stream = it.iterate(17, partition=(1, 2))
    head = [next(stream) for _ in range(4)]
    state = it.state_dict()
    rest = list(stream)

    resumed = PartitionedIndexedIterator(shuffle=shuffle, seed=3)
    resumed.load_state_dict(state)
    assert list(resumed.iterate(17, partition=(1, 2))) == rest
    assert sorted(head + rest) == sorted(range(1, 17, 2)) if not shuffle else True


def test_resume_topology_mismatch_raises():
    it = PartitionedIndexedIterator(seed=0)
    stream = it.iterate(10, partition=(0, 2))
    next(stream)
    state = it.state_dict()

    resumed = PartitionedIndexedIterator(seed=0)
    resumed.load_state_dict(state)
    with pytest.raises(ValueError, match="topology mismatch"):
        next(resumed.iterate(10, partition=(0, 4)))


def test_restart_after_exhaustion_starts_fresh():
    it = PartitionedIndexedIterator(seed=0)
    first = list(it.iterate(6, partition=(0, 1)))
    second = list(it.iterate(6, partition=(0, 1)))
    assert first == second == list(range(6))


@pytest.mark.parametrize("world_size", [2, 4])
def test_total_smaller_than_world_size(world_size):
    pieces = [
        list(PartitionedIndexedIterator().iterate(1, partition=(r, world_size)))
        for r in range(world_size)
    ]
    assert pieces[0] == [0]
    assert all(p == [] for p in pieces[1:])


def test_empty_total_yields_nothing():
    assert list(PartitionedIndexedIterator().iterate(0, partition=(1, 3))) == []


def test_state_dict_before_iteration_is_neutral():
    it = PartitionedIndexedIterator(shuffle=True, seed=2)
    state = it.state_dict()
    resumed = PartitionedIndexedIterator(shuffle=True, seed=2)
    resumed.load_state_dict(state)
    assert list(resumed.iterate(9, partition=(0, 1))) == list(
        PartitionedIndexedIterator(shuffle=True, seed=2).iterate(9, partition=(0, 1))
    )


# ---------------------------------------------------------------------------
# LazyIndexedManifestIterator under the env-gated worker partition
# ---------------------------------------------------------------------------
def _partition_env(monkeypatch, rank, world):
    monkeypatch.setenv("RANK", str(rank))
    monkeypatch.setenv("WORLD_SIZE", str(world))
    monkeypatch.setenv(LHOTSE_USE_WORKER_PARTITION, "1")


@pytest.mark.parametrize("shuffle", [False, True])
@pytest.mark.parametrize("world_size", [2, 3])
def test_indexed_manifest_partition_coverage(
    indexed_jsonl, monkeypatch, shuffle, world_size
):
    all_ids = {dummy_supervision(i).id for i in range(12)}
    seen = []
    for rank in range(world_size):
        _partition_env(monkeypatch, rank, world_size)
        it = LazyIndexedManifestIterator(indexed_jsonl, shuffle=shuffle, seed=2)
        seen.append([s.id for s in it])
    flat = [x for p in seen for x in p]
    assert len(flat) == len(all_ids)
    assert set(flat) == all_ids


def test_indexed_manifest_partition_default_matches_unpartitioned(indexed_jsonl):
    # (0, 1) partition == plain read.
    it = LazyIndexedManifestIterator(indexed_jsonl)
    assert [s.id for s in it] == [dummy_supervision(i).id for i in range(12)]


def test_indexed_manifest_partition_resume_topology_mismatch(
    indexed_jsonl, monkeypatch
):
    _partition_env(monkeypatch, 0, 2)
    it = LazyIndexedManifestIterator(indexed_jsonl, shuffle=True, seed=0)
    stream = iter(it)
    next(stream)
    state = it.state_dict()

    _partition_env(monkeypatch, 0, 3)
    resumed = LazyIndexedManifestIterator(indexed_jsonl, shuffle=True, seed=0)
    resumed.load_state_dict(state)
    with pytest.raises(ValueError, match="topology mismatch"):
        next(iter(resumed))


# ---------------------------------------------------------------------------
# LazyIteratorChain global (item-level) shuffle
# ---------------------------------------------------------------------------
def test_chain_global_shuffle_mixes_sources(two_indexed_jsonls):
    a, b = two_indexed_jsonls
    chain = LazyIteratorChain(
        LazyIndexedManifestIterator(a),
        LazyIndexedManifestIterator(b),
        shuffle_iters=True,
        seed=0,
    )
    ids = [s.id for s in chain]
    expect = {dummy_supervision(i).id for i in range(8)} | {
        dummy_supervision(i).id for i in range(100, 109)
    }
    assert set(ids) == expect and len(ids) == len(expect)
    # Item-level shuffle: the two sources interleave (not all of A first).
    from_a = [k for k, s in enumerate(ids) if s in {dummy_supervision(i).id for i in range(8)}]
    assert from_a != list(range(8))


def test_chain_global_shuffle_partition_disjoint(two_indexed_jsonls, monkeypatch):
    a, b = two_indexed_jsonls
    pieces = []
    for rank in range(2):
        _partition_env(monkeypatch, rank, 2)
        chain = LazyIteratorChain(
            LazyIndexedManifestIterator(a),
            LazyIndexedManifestIterator(b),
            shuffle_iters=True,
            seed=5,
        )
        pieces.append([s.id for s in chain])
    flat = [x for p in pieces for x in p]
    assert len(flat) == 17
    assert len(set(flat)) == 17  # disjoint, no double partition


def test_chain_global_shuffle_no_double_partition(two_indexed_jsonls, monkeypatch):
    # The env partition must apply ONCE at the chain level, not again inside
    # each indexed leaf (which would drop items quadratically).
    a, b = two_indexed_jsonls
    _partition_env(monkeypatch, 0, 2)
    chain = LazyIteratorChain(
        LazyIndexedManifestIterator(a),
        LazyIndexedManifestIterator(b),
        shuffle_iters=True,
        seed=5,
    )
    assert len(list(chain)) == 9  # ceil(17/2), not ~17/4


def test_chain_global_shuffle_resume_mid_stream(two_indexed_jsonls):
    a, b = two_indexed_jsonls
    make = lambda: LazyIteratorChain(
        LazyIndexedManifestIterator(a),
        LazyIndexedManifestIterator(b),
        shuffle_iters=True,
        seed=8,
    )
    chain = make()
    stream = iter(chain)
    head = [next(stream).id for _ in range(6)]
    state = chain.state_dict()
    rest = [s.id for s in stream]

    resumed = make()
    resumed.load_state_dict(state)
    assert [s.id for s in resumed] == rest
    assert len(head) + len(rest) == 17


def test_chain_global_shuffle_resume_topology_mismatch(
    two_indexed_jsonls, monkeypatch
):
    a, b = two_indexed_jsonls
    _partition_env(monkeypatch, 0, 2)
    chain = LazyIteratorChain(
        LazyIndexedManifestIterator(a),
        LazyIndexedManifestIterator(b),
        shuffle_iters=True,
        seed=1,
    )
    stream = iter(chain)
    next(stream)
    state = chain.state_dict()

    _partition_env(monkeypatch, 1, 4)
    resumed = LazyIteratorChain(
        LazyIndexedManifestIterator(a),
        LazyIndexedManifestIterator(b),
        shuffle_iters=True,
        seed=1,
    )
    resumed.load_state_dict(state)
    with pytest.raises(ValueError, match="partition mismatch"):
        next(iter(resumed))


def test_chain_reshuffles_each_pass(two_indexed_jsonls):
    a, b = two_indexed_jsonls
    chain = LazyIteratorChain(
        LazyIndexedManifestIterator(a),
        LazyIndexedManifestIterator(b),
        shuffle_iters=True,
        seed=3,
    )
    first = [s.id for s in chain]
    second = [s.id for s in chain]
    assert sorted(first) == sorted(second)
    assert first != second  # epoch-dependent permutation


def test_chain_non_indexed_sources_shuffle_at_source_level(two_indexed_jsonls):
    a, b = two_indexed_jsonls
    # Plain (non-indexed) lazy leaves: shuffle_iters falls back to permuting
    # whole sources, preserving within-source order.
    from lhotse_tpu.lazy import LazyJsonlIterator

    chain = LazyIteratorChain(
        LazyJsonlIterator(a), LazyJsonlIterator(b), shuffle_iters=True, seed=0
    )
    ids = [d["id"] for d in chain]
    ids_a = [dummy_supervision(i).id for i in range(8)]
    ids_b = [dummy_supervision(i).id for i in range(100, 109)]
    assert ids in (ids_a + ids_b, ids_b + ids_a)


# ---------------------------------------------------------------------------
# Multiplexer partition semantics
# ---------------------------------------------------------------------------
def test_multiplexer_rejects_randomized_seed_under_multishard(
    two_indexed_jsonls, monkeypatch
):
    a, b = two_indexed_jsonls
    _partition_env(monkeypatch, 0, 2)
    mux = LazyIteratorMultiplexer(
        LazyIndexedManifestIterator(a),
        LazyIndexedManifestIterator(b),
        seed="randomized",
    )
    with pytest.raises(ValueError, match="randomized"):
        next(iter(mux))


def test_multiplexer_allows_randomized_seed_single_shard(two_indexed_jsonls):
    a, b = two_indexed_jsonls
    mux = LazyIteratorMultiplexer(
        LazyIndexedManifestIterator(a),
        LazyIndexedManifestIterator(b),
        seed="randomized",
    )
    assert len(list(mux)) == 17


def test_multiplexer_allows_randomized_seed_when_not_indexed(
    two_indexed_jsonls, monkeypatch
):
    from lhotse_tpu.lazy import LazyJsonlIterator

    a, b = two_indexed_jsonls
    _partition_env(monkeypatch, 0, 2)
    mux = LazyIteratorMultiplexer(
        LazyJsonlIterator(a), LazyJsonlIterator(b), seed="randomized"
    )
    next(iter(mux))  # non-indexed sources cannot drift: allowed


def test_multiplexer_fixed_seed_multishard_full_coverage(
    two_indexed_jsonls, monkeypatch
):
    a, b = two_indexed_jsonls
    seen = []
    for rank in range(2):
        _partition_env(monkeypatch, rank, 2)
        mux = LazyIteratorMultiplexer(
            LazyIndexedManifestIterator(a, seed=0),
            LazyIndexedManifestIterator(b, seed=0),
            seed=0,
        )
        seen.append([s.id for s in mux])
    flat = [x for p in seen for x in p]
    assert len(flat) == 17 and len(set(flat)) == 17


# ---------------------------------------------------------------------------
# Determinism
# ---------------------------------------------------------------------------
def test_partition_determinism_across_runs(indexed_jsonl, monkeypatch):
    _partition_env(monkeypatch, 1, 3)
    runs = [
        [s.id for s in LazyIndexedManifestIterator(indexed_jsonl, shuffle=True, seed=6)]
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_partition_different_seeds_different_orders(indexed_jsonl):
    a = [s.id for s in LazyIndexedManifestIterator(indexed_jsonl, shuffle=True, seed=1)]
    b = [s.id for s in LazyIndexedManifestIterator(indexed_jsonl, shuffle=True, seed=2)]
    assert sorted(a) == sorted(b)
    assert a != b
