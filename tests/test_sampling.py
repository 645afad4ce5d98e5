"""Sampler tests: constraint batching, epochs/shuffling, DDP dedup,
checkpoint resume (first_k + rest == all), bucketing."""
import pickle

import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.cut import MonoCut
from lhotse_tpu.dataset import (
    BucketingSampler, CutPairsSampler, DynamicBucketingSampler, DynamicCutSampler,
    RoundRobinSampler, SimpleCutSampler, TimeConstraint, WeightedSimpleCutSampler, ZipSampler,
    estimate_duration_buckets, find_pessimistic_batches)


def dummy_cut(idx: int, duration: float = 1.0) -> MonoCut:
    return MonoCut(id=f"dummy-{idx}", start=0.0, duration=duration, channel=0, supervisions=[])


@pytest.fixture
def cuts100():
    return CutSet.from_cuts(dummy_cut(i, duration=1.0 + (i % 10) * 0.5) for i in range(100))


def batch_ids(batches):
    return [c.id for b in batches for c in b]


class TestTimeConstraint:
    def test_padded_cost_model(self):
        tc = TimeConstraint(max_duration=10.0)
        for d in (2.0, 3.0, 4.0):
            tc.add(dummy_cut(0, d))
        # Padded cost = num_cuts * longest = 3 * 4 = 12 > 10.
        assert tc.exceeded()

    def test_quadratic_duration(self):
        tc = TimeConstraint(max_duration=100.0, quadratic_duration=10.0)
        tc.add(dummy_cut(0, 20.0))
        # effective = 20 + 400/10 = 60
        assert tc.current == pytest.approx(60.0)

    def test_close_to_exceeding(self):
        tc = TimeConstraint(max_duration=10.0)
        tc.add(dummy_cut(0, 4.0))
        tc.add(dummy_cut(1, 4.0))
        assert not tc.exceeded()
        assert tc.close_to_exceeding()

    def test_state_roundtrip(self):
        tc = TimeConstraint(max_duration=10.0, max_cuts=5)
        tc.add(dummy_cut(0, 3.0))
        tc2 = TimeConstraint(**tc.state_dict())
        assert tc2 == tc
        assert tc2.num_cuts == 1


class TestSimpleCutSampler:
    def test_full_coverage_and_constraint(self, cuts100):
        sampler = SimpleCutSampler(cuts100, max_duration=20.0, world_size=1, rank=0)
        batches = list(sampler)
        assert sorted(batch_ids(batches)) == sorted(c.id for c in cuts100)
        for b in batches[:-1]:
            longest = max(c.duration for c in b)
            assert len(b) * longest <= 20.0 + longest  # can exceed by < 1 cut

    def test_max_cuts(self, cuts100):
        sampler = SimpleCutSampler(cuts100, max_cuts=8, world_size=1, rank=0)
        batches = list(sampler)
        assert all(len(b) <= 8 for b in batches)
        assert sum(len(b) for b in batches) == 100

    def test_shuffle_changes_order_per_epoch(self, cuts100):
        sampler = SimpleCutSampler(cuts100, max_cuts=10, shuffle=True, seed=0, world_size=1, rank=0)
        sampler.set_epoch(0)
        order0 = batch_ids(list(sampler))
        sampler.set_epoch(1)
        order1 = batch_ids(list(sampler))
        assert sorted(order0) == sorted(order1)
        assert order0 != order1
        # Determinism: same epoch -> same order.
        sampler.set_epoch(1)
        assert batch_ids(list(sampler)) == order1

    def test_filter(self, cuts100):
        sampler = SimpleCutSampler(cuts100, max_cuts=10, world_size=1, rank=0)
        sampler.filter(lambda c: c.duration <= 2.0)
        ids = batch_ids(list(sampler))
        kept = [c.id for c in cuts100 if c.duration <= 2.0]
        assert sorted(ids) == sorted(kept)

    def test_resume_replay(self, cuts100):
        sampler = SimpleCutSampler(cuts100, max_cuts=7, shuffle=True, seed=3, world_size=1, rank=0)
        sampler.set_epoch(2)
        all_batches = [batch_ids([b]) for b in sampler]

        sampler2 = SimpleCutSampler(cuts100, max_cuts=7, shuffle=True, seed=3, world_size=1, rank=0)
        sampler2.set_epoch(2)
        it = iter(sampler2)
        first3 = [batch_ids([next(it)]) for _ in range(3)]
        sd = sampler2.state_dict()

        sampler3 = SimpleCutSampler(cuts100, max_cuts=7, shuffle=True, seed=3, world_size=1, rank=0)
        sampler3.load_state_dict(sd)
        rest = [batch_ids([b]) for b in sampler3]
        assert first3 + rest == all_batches

    def test_ddp_dedup_disjoint(self, cuts100):
        per_rank = []
        for rank in range(2):
            sampler = SimpleCutSampler(cuts100, max_cuts=10, world_size=2, rank=rank)
            per_rank.append(list(sampler))
        # Equal number of steps on each rank.
        assert len(per_rank[0]) == len(per_rank[1])
        ids0 = set(batch_ids(per_rank[0]))
        ids1 = set(batch_ids(per_rank[1]))
        # Dedup: no overlap except possible _dup-marked repeats at the tail.
        overlap = {i for i in ids0 & ids1 if "_dup" not in i}
        assert overlap == set()
        all_ids = {i.split("_dup")[0] for i in ids0 | ids1}
        assert all_ids == {c.id for c in cuts100}


class TestDynamicCutSampler:
    def test_lazy_iteration(self, cuts100, tmp_path):
        p = tmp_path / "cuts.jsonl"
        cuts100.to_file(p)
        lazy = CutSet.from_jsonl_lazy(p)
        sampler = DynamicCutSampler(lazy, max_duration=25.0, world_size=1, rank=0)
        batches = list(sampler)
        assert sorted(batch_ids(batches)) == sorted(c.id for c in cuts100)

    def test_shuffle_deterministic(self, cuts100, tmp_path):
        p = tmp_path / "cuts.jsonl"
        cuts100.to_file(p)

        def make():
            s = DynamicCutSampler(
                CutSet.from_jsonl_lazy(p), max_cuts=10, shuffle=True, seed=7, world_size=1, rank=0)
            s.set_epoch(1)
            return s

        a = batch_ids(list(make()))
        b = batch_ids(list(make()))
        assert a == b
        assert sorted(a) == sorted(c.id for c in cuts100)

    def test_pairs(self, cuts100):
        sampler = DynamicCutSampler(cuts100, cuts100, max_cuts=10, world_size=1, rank=0)
        batch = next(iter(sampler))
        assert isinstance(batch, tuple) and len(batch) == 2
        assert [c.id for c in batch[0]] == [c.id for c in batch[1]]

    def test_resume_replay(self, cuts100, tmp_path):
        p = tmp_path / "cuts.jsonl"
        cuts100.to_file(p)

        def make():
            s = DynamicCutSampler(
                CutSet.from_jsonl_lazy(p), max_cuts=9, shuffle=True, seed=5, world_size=1, rank=0)
            s.set_epoch(1)
            return s

        all_batches = [batch_ids([b]) for b in make()]

        s2 = make()
        it = iter(s2)
        first4 = [batch_ids([next(it)]) for _ in range(4)]
        sd = pickle.loads(pickle.dumps(s2.state_dict()))

        s3 = DynamicCutSampler(
            CutSet.from_jsonl_lazy(p), max_cuts=9, shuffle=True, seed=5, world_size=1, rank=0)
        s3.load_state_dict(sd)
        rest = [batch_ids([b]) for b in s3]
        assert first4 + rest == all_batches


class TestDynamicBucketingSampler:
    def test_estimate_duration_buckets(self):
        cuts = CutSet.from_cuts(dummy_cut(i, duration=1.0 + (i % 10)) for i in range(100))
        bins = estimate_duration_buckets(cuts, num_buckets=5)
        assert len(bins) == 4
        assert bins == sorted(bins)

    def test_batches_have_similar_durations(self, tmp_path):
        cuts = CutSet.from_cuts(dummy_cut(i, duration=1.0 + (i % 20)) for i in range(400))
        p = tmp_path / "cuts.jsonl"
        cuts.to_file(p)
        sampler = DynamicBucketingSampler(
            CutSet.from_jsonl_lazy(p), max_duration=60.0, num_buckets=5, buffer_size=200,
            world_size=1, rank=0, seed=0)
        spreads = []
        n = 0
        for b in sampler:
            durs = [c.duration for c in b]
            if len(durs) > 1:
                spreads.append(max(durs) - min(durs))
            n += len(b)
        assert n == 400
        # Bucketing keeps within-batch duration spread far below global 19s.
        assert sum(spreads) / len(spreads) < 7.0

    def test_full_coverage_with_shuffle(self, tmp_path):
        cuts = CutSet.from_cuts(dummy_cut(i, duration=1 + (i % 7)) for i in range(200))
        p = tmp_path / "cuts.jsonl"
        cuts.to_file(p)
        sampler = DynamicBucketingSampler(
            CutSet.from_jsonl_lazy(p), max_duration=40.0, num_buckets=4, buffer_size=80,
            shuffle=True, world_size=1, rank=0, seed=0)
        sampler.set_epoch(3)
        ids = batch_ids(list(sampler))
        assert sorted(ids) == sorted(c.id for c in cuts)

    def test_rank_sync_equal_steps(self, tmp_path):
        cuts = CutSet.from_cuts(dummy_cut(i, duration=1 + (i % 9)) for i in range(300))
        p = tmp_path / "cuts.jsonl"
        cuts.to_file(p)
        per_rank = []
        for rank in range(2):
            sampler = DynamicBucketingSampler(
                CutSet.from_jsonl_lazy(p), max_duration=50.0, num_buckets=4, buffer_size=100,
                world_size=2, rank=rank, seed=0, sync_buckets=True)
            per_rank.append(list(sampler))
        assert len(per_rank[0]) == len(per_rank[1])
        ids0 = set(batch_ids(per_rank[0]))
        ids1 = set(batch_ids(per_rank[1]))
        assert {i for i in ids0 & ids1 if "_dup" not in i} == set()

    def test_resume_replay(self, tmp_path):
        cuts = CutSet.from_cuts(dummy_cut(i, duration=1 + (i % 5)) for i in range(150))
        p = tmp_path / "cuts.jsonl"
        cuts.to_file(p)

        def make():
            s = DynamicBucketingSampler(
                CutSet.from_jsonl_lazy(p), max_duration=30.0, num_buckets=3, buffer_size=50,
                shuffle=True, world_size=1, rank=0, seed=11)
            s.set_epoch(1)
            return s

        all_batches = [batch_ids([b]) for b in make()]

        s2 = make()
        it = iter(s2)
        first5 = [batch_ids([next(it)]) for _ in range(5)]
        sd = pickle.loads(pickle.dumps(s2.state_dict()))

        s3 = make()
        s3.allow_iter_to_reset_state()
        s3.load_state_dict(sd)
        rest = [batch_ids([b]) for b in s3]
        assert first5 + rest == all_batches


class TestIndexedO1Resume:
    """With an indexed manifest (constant-time access), resume must go through
    the strict O(1) graph-token path — not O(N) replay."""

    @pytest.fixture
    def indexed_path(self, tmp_path):
        from lhotse_tpu.indexing import create_jsonl_index

        cuts = CutSet.from_cuts(dummy_cut(i, duration=1 + (i % 6)) for i in range(120))
        p = tmp_path / "cuts.jsonl"
        cuts.to_file(p)
        create_jsonl_index(p)
        return p

    def test_dynamic_o1_resume(self, indexed_path):
        def make():
            s = DynamicCutSampler(
                CutSet.from_files([indexed_path], shuffle_iters=False), max_cuts=8, shuffle=True,
                seed=4, world_size=1, rank=0)
            s.set_epoch(2)
            return s

        assert CutSet.from_files([indexed_path], shuffle_iters=False).has_constant_time_access

        all_batches = [batch_ids([b]) for b in make()]
        s2 = make()
        it = iter(s2)
        first3 = [batch_ids([next(it)]) for _ in range(3)]
        sd = pickle.loads(pickle.dumps(s2.state_dict()))
        assert "cuts_state" in sd
        s3 = make()
        s3.allow_iter_to_reset_state()
        s3.load_state_dict(sd)
        rest = [batch_ids([b]) for b in s3]
        assert first3 + rest == all_batches

    def test_bucketing_o1_resume(self, indexed_path):
        def make():
            s = DynamicBucketingSampler(
                CutSet.from_files([indexed_path], shuffle_iters=False), max_duration=25.0,
                num_buckets=3, buffer_size=40, shuffle=True, seed=9, world_size=1, rank=0)
            s.set_epoch(1)
            return s

        all_batches = [batch_ids([b]) for b in make()]
        s2 = make()
        it = iter(s2)
        first4 = [batch_ids([next(it)]) for _ in range(4)]
        sd = pickle.loads(pickle.dumps(s2.state_dict()))
        assert "bucketer_state" in sd and "rng_state" in sd
        s3 = make()
        s3.allow_iter_to_reset_state()
        s3.load_state_dict(sd)
        rest = [batch_ids([b]) for b in s3]
        assert first4 + rest == all_batches


class TestBucketingSampler:
    def test_coverage(self, cuts100):
        sampler = BucketingSampler(cuts100, num_buckets=4, max_cuts=10, world_size=1, rank=0)
        ids = batch_ids(list(sampler))
        assert sorted(ids) == sorted(c.id for c in cuts100)

    def test_lazy_rejected(self, cuts100, tmp_path):
        p = tmp_path / "cuts.jsonl"
        cuts100.to_file(p)
        with pytest.raises(ValueError):
            BucketingSampler(CutSet.from_jsonl_lazy(p), num_buckets=2, max_cuts=10)


class TestCombinators:
    def test_zip_merge(self, cuts100):
        a = CutSet.from_cuts(dummy_cut(i) for i in range(20))
        b = CutSet.from_cuts(dummy_cut(100 + i) for i in range(20))
        sampler = ZipSampler(
            SimpleCutSampler(a, max_cuts=2, world_size=1, rank=0),
            SimpleCutSampler(b, max_cuts=4, world_size=1, rank=0))
        batches = list(sampler)
        assert all(len(bt) == 6 for bt in batches)

    def test_round_robin(self):
        a = CutSet.from_cuts(dummy_cut(i) for i in range(6))
        b = CutSet.from_cuts(dummy_cut(100 + i) for i in range(12))
        sampler = RoundRobinSampler(
            SimpleCutSampler(a, max_cuts=2, world_size=1, rank=0),
            SimpleCutSampler(b, max_cuts=2, world_size=1, rank=0))
        batches = list(sampler)
        assert sum(len(bt) for bt in batches) == 18
        # First two batches alternate sources.
        assert all(c.id.startswith("dummy-") for c in batches[0])

    def test_cut_pairs(self, cuts100):
        sampler = CutPairsSampler(cuts100, cuts100, max_source_duration=20.0, world_size=1, rank=0)
        src, tgt = next(iter(sampler))
        assert [c.id for c in src] == [c.id for c in tgt]

    def test_weighted_simple(self, cuts100):
        weights = [1.0] * len(cuts100)
        sampler = WeightedSimpleCutSampler(
            cuts100, weights, num_samples=30, max_cuts=10, world_size=1, rank=0)
        batches = list(sampler)
        total = sum(len(b) for b in batches)
        assert total == 30
        # Without replacement: all unique.
        ids = batch_ids(batches)
        assert len(set(ids)) == 30
        # Deterministic per epoch.
        sampler.set_epoch(0)
        assert batch_ids(list(sampler)) == ids


class TestDiagnosticsAndUtils:
    def test_find_pessimistic_batches(self, cuts100):
        sampler = SimpleCutSampler(cuts100, max_duration=30.0, world_size=1, rank=0)
        batches, scores = find_pessimistic_batches(sampler)
        assert "single_longest_cut" in batches
        assert scores["single_longest_cut"] == max(c.duration for c in cuts100)

    def test_sampler_report(self, cuts100):
        sampler = SimpleCutSampler(cuts100, max_cuts=10, world_size=1, rank=0)
        list(sampler)
        report = sampler.get_report()
        assert "cuts kept" in report
        assert sampler.diagnostics.kept_cuts == 100
