"""
Multi-node (DDP) simulation: dedup across ranks/workers + mid-epoch resume.

Models the reference's multi-node coverage
(`/root/reference/lhotse/test/dataset/test_multinode_resume.py`): iterable-
style dataloading where each (rank, worker) owns a disjoint partition of an
indexed source, and a mid-epoch checkpoint restores the exact remaining
stream on every rank independently.
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.dataset.sampling import DynamicBucketingSampler, SimpleCutSampler
from lhotse_tpu.testing.dummies import DummyManifest


@pytest.fixture
def indexed_cuts(tmp_path):
    cuts = DummyManifest(CutSet, begin_id=0, end_id=60)
    path = tmp_path / "cuts.jsonl"
    cuts.to_file(path)
    from lhotse_tpu.indexing import create_jsonl_index

    create_jsonl_index(path)
    return path


def _collect_epoch(sampler):
    return [[c.id for c in batch] for batch in sampler]


class TestMapStyleDDP:
    """Map-style: one sampler per rank samples world_size batches and keeps
    batches[rank]."""

    def test_ranks_form_partition_every_step(self, indexed_cuts):
        cuts = CutSet.from_jsonl_lazy(indexed_cuts)
        world = [
            SimpleCutSampler(
                cuts, max_cuts=5, shuffle=True, seed=7, world_size=3, rank=r
            )
            for r in range(3)
        ]
        per_rank = [_collect_epoch(s) for s in world]
        # Same number of steps on every rank (lockstep requirement).
        assert len({len(b) for b in per_rank}) == 1
        # Per step, the ranks' batches are disjoint.
        for step in range(len(per_rank[0])):
            ids = [i for r in range(3) for i in per_rank[r][step]]
            assert len(ids) == len(set(ids))

    def test_mid_epoch_resume_per_rank(self, indexed_cuts):
        cuts = CutSet.from_jsonl_lazy(indexed_cuts)
        for rank in range(2):
            full = SimpleCutSampler(cuts, max_cuts=4, shuffle=True, seed=5, world_size=2, rank=rank)
            expected = _collect_epoch(full)

            part = SimpleCutSampler(cuts, max_cuts=4, shuffle=True, seed=5, world_size=2, rank=rank)
            it = iter(part)
            consumed = [[c.id for c in next(it)] for _ in range(3)]
            sd = part.state_dict()

            restored = SimpleCutSampler(
                cuts, max_cuts=4, shuffle=True, seed=5, world_size=2, rank=rank)
            restored.load_state_dict(sd)
            rest = _collect_epoch(restored)
            assert consumed + rest == expected, f"rank {rank} resume mismatch"


class TestIterableStyleDDP:
    """Iterable-style: world_size=1 samplers over per-(rank,worker) source
    partitions — the preferred TPU/multi-host pattern."""

    def test_partitions_are_disjoint_and_complete(self, indexed_cuts):
        all_ids = []
        for rank in range(2):
            for worker in range(2):
                cuts = CutSet.from_jsonl_lazy(indexed_cuts).repeat(1)
                # Partition the indexed source across 4 virtual workers.
                from lhotse_tpu.lazy import LazySlicer

                part = CutSet(LazySlicer(cuts.data, k=rank * 2 + worker, n=4))
                ids = [c.id for c in part]
                all_ids.extend(ids)
        assert len(all_ids) == 60
        assert len(set(all_ids)) == 60

    def test_bucketing_rank_sync_same_step_durations(self, indexed_cuts):
        cuts = CutSet.from_jsonl_lazy(indexed_cuts)
        world = [
            DynamicBucketingSampler(
                cuts,
                max_duration=10.0,
                num_buckets=2,
                shuffle=False,
                seed=11,
                world_size=2,
                rank=r,
                sync_buckets=True,
            )
            for r in range(2)
        ]
        steps = list(zip(_collect_epoch(world[0]), _collect_epoch(world[1])))
        assert len(steps) > 0
        for b0, b1 in steps:
            assert not set(b0) & set(b1)  # dedup


def test_worker_partition_env(monkeypatch, indexed_cuts):
    """get_worker_partition composes (rank, num_workers, worker_id)."""
    from lhotse_tpu.dataset.dataloading import (WorkerInfo, get_worker_partition, set_worker_info)

    monkeypatch.setenv("WORLD_SIZE", "2")
    monkeypatch.setenv("RANK", "1")
    from lhotse_tpu.dataset.dataloading import LHOTSE_USE_WORKER_PARTITION

    monkeypatch.setenv(LHOTSE_USE_WORKER_PARTITION, "1")
    set_worker_info(WorkerInfo(id=3, num_workers=4, seed=0))
    try:
        part, total = get_worker_partition()
        assert (part, total) == (1 * 4 + 3, 2 * 4)
    finally:
        set_worker_info(None)
