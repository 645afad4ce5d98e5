"""
End-of-data redistribution/duplication semantics across DDP ranks
(reference contract: lhotse/dataset/sampling/base.py:396-451): every rank
must step the SAME number of times, the union of all ranks' batches must
cover the corpus exactly, and only deterministically-marked `_dup` clones
may repeat — identically computed on every rank.
"""
import warnings

import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
from lhotse_tpu.dataset.sampling.simple import SimpleCutSampler
from lhotse_tpu.testing.dummies import DummyManifest


def _corpus(n):
    return DummyManifest(CutSet, begin_id=0, end_id=n)


def _run_all_ranks(make_sampler, world_size):
    """Iterate every rank's sampler fully; returns per-rank batch lists."""
    per_rank = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for rank in range(world_size):
            batches = [list(b) for b in make_sampler(rank)]
            per_rank.append(batches)
    return per_rank


@pytest.mark.parametrize("n_cuts", [7, 8, 9, 10, 13])
@pytest.mark.parametrize("world_size", [2, 4])
def test_all_ranks_step_equally_and_cover_corpus(n_cuts, world_size):
    corpus = _corpus(n_cuts)

    def make(rank):
        return SimpleCutSampler(
            corpus, max_cuts=2, world_size=world_size, rank=rank, shuffle=False
        )

    per_rank = _run_all_ranks(make, world_size)
    steps = {len(b) for b in per_rank}
    assert len(steps) == 1, f"ranks stepped unevenly: {[len(b) for b in per_rank]}"

    all_ids = [c.id for batches in per_rank for b in batches for c in b]
    originals = [i for i in all_ids if "_dup" not in i]
    # Exactly-once coverage of the corpus by non-duplicate ids.
    assert sorted(originals) == sorted(c.id for c in corpus)
    # Duplicates trace back to real cuts.
    for i in all_ids:
        if "_dup" in i:
            assert i.split("_dup")[0] in set(originals)


@pytest.mark.parametrize("world_size", [2, 3])
def test_rebalanced_tail_is_identical_across_ranks(world_size):
    """The tail split must be a pure function of the pooled batches: every
    rank computes the same redistribution (no rank-dependent RNG)."""
    corpus = _corpus(world_size + 1)  # 1 full draw + a 1-batch tail

    def make(rank):
        return SimpleCutSampler(
            corpus, max_cuts=1, world_size=world_size, rank=rank, shuffle=False
        )

    per_rank = _run_all_ranks(make, world_size)
    n_steps = len(per_rank[0])
    for step in range(n_steps):
        step_ids = [[c.id for c in per_rank[r][step]] for r in range(world_size)]
        # Disjoint across ranks within a step (each rank keeps its slice).
        flat = [i for ids in step_ids for i in ids]
        assert len(flat) == len(set(flat)), f"step {step} shares cuts: {step_ids}"


@pytest.mark.parametrize("n_cuts", [7, 9])
def test_drop_last_never_duplicates(n_cuts):
    world_size = 4
    corpus = _corpus(n_cuts)

    def make(rank):
        return SimpleCutSampler(
            corpus, max_cuts=1, world_size=world_size, rank=rank,
            shuffle=False, drop_last=True,
        )

    per_rank = _run_all_ranks(make, world_size)
    steps = {len(b) for b in per_rank}
    assert len(steps) == 1
    all_ids = [c.id for batches in per_rank for b in batches for c in b]
    assert all("_dup" not in i for i in all_ids)
    assert len(all_ids) == len(set(all_ids))
    # drop_last drops the tail: coverage may be partial but bounded.
    assert len(all_ids) == (n_cuts // world_size) * world_size


@pytest.mark.parametrize("world_size", [2, 4])
def test_dynamic_sampler_end_of_data(world_size):
    """Same contract via the lazy-first DynamicCutSampler."""
    corpus = _corpus(world_size * 3 + 1)

    def make(rank):
        return DynamicCutSampler(
            corpus.to_eager(), max_cuts=1, world_size=world_size, rank=rank,
            shuffle=False,
        )

    per_rank = _run_all_ranks(make, world_size)
    steps = {len(b) for b in per_rank}
    assert len(steps) == 1
    originals = {
        c.id
        for batches in per_rank
        for b in batches
        for c in b
        if "_dup" not in c.id
    }
    assert originals == {c.id for c in corpus}


def test_duplicate_marks_are_deterministic():
    """Re-running the same sampler yields byte-identical dup markings."""
    corpus = _corpus(5)

    def ids_for(rank):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            s = SimpleCutSampler(
                corpus, max_cuts=1, world_size=4, rank=rank, shuffle=False
            )
            return [[c.id for c in b] for b in s]

    for rank in range(4):
        assert ids_for(rank) == ids_for(rank)
