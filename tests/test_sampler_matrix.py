"""
Sampler-family behavior matrix: constraint strictness, drop_last, epoch
reshuffling, rank partition, and the composite samplers (Bucketing,
RoundRobin, Zip, CutPairs, WeightedSimple).

Behavioral model: /root/reference/test/dataset/sampling/test_sampling.py.
"""
import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.dataset.sampling.bucketing import BucketingSampler
from lhotse_tpu.dataset.sampling.cut_pairs import CutPairsSampler
from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
from lhotse_tpu.dataset.sampling.round_robin import RoundRobinSampler
from lhotse_tpu.dataset.sampling.simple import SimpleCutSampler
from lhotse_tpu.dataset.sampling.weighted_simple import WeightedSimpleCutSampler
from lhotse_tpu.dataset.sampling.zip import ZipSampler
from lhotse_tpu.testing.dummies import DummyManifest, dummy_cut
from lhotse_tpu.utils import fastcopy


def _cuts(n=20, dur=1.0, prefix=None):
    cs = DummyManifest(CutSet, begin_id=0, end_id=n)
    cs = CutSet.from_cuts(fastcopy(c, duration=dur) for c in cs)
    if prefix:
        cs = CutSet.from_cuts(fastcopy(c, id=f"{prefix}-{c.id}") for c in cs)
    return cs


def _flat_ids(batches):
    return [c.id for b in batches for c in b]


# ---------------------------------------------------------------------------
# Constraint strictness
# ---------------------------------------------------------------------------
def test_max_duration_is_never_exceeded():
    cuts = _cuts(17, dur=1.0)
    for batch in SimpleCutSampler(cuts, max_duration=4.5):
        assert sum(c.duration for c in batch) <= 4.5
        assert len(batch) <= 4


def test_max_cuts_exact_batches():
    cuts = _cuts(10)
    sizes = [len(b) for b in SimpleCutSampler(cuts, max_cuts=4)]
    assert sizes == [4, 4, 2]


def test_drop_last_removes_the_remainder():
    cuts = _cuts(10)
    sizes = [len(b) for b in SimpleCutSampler(cuts, max_cuts=4, drop_last=True)]
    assert sizes == [4, 4]


def test_single_cut_longer_than_budget_still_yields():
    # A cut longer than max_duration must come out alone, not spin forever.
    cuts = CutSet.from_cuts(
        [fastcopy(dummy_cut(0), duration=10.0), fastcopy(dummy_cut(1), duration=1.0)]
    )
    batches = list(SimpleCutSampler(cuts, max_duration=2.0))
    assert [len(b) for b in batches] == [1, 1]


def test_epoch_changes_shuffle_order():
    cuts = _cuts(16)
    sampler = SimpleCutSampler(cuts, max_cuts=4, shuffle=True, seed=0)
    e0 = _flat_ids(sampler)
    sampler.set_epoch(1)
    e1 = _flat_ids(sampler)
    assert sorted(e0) == sorted(e1)
    assert e0 != e1
    # Same epoch twice = same order.
    sampler.set_epoch(1)
    assert _flat_ids(sampler) == e1


@pytest.mark.parametrize("world_size", [2, 3])
def test_rank_partition_disjoint_and_complete(world_size):
    cuts = _cuts(19)
    seen = []
    for rank in range(world_size):
        s = SimpleCutSampler(
            cuts, max_cuts=3, world_size=world_size, rank=rank, seed=0
        )
        seen.extend(_flat_ids(s))
    # Every rank draws the same number of BATCHES (padding by duplication
    # allowed at the tail), and together they cover the corpus.
    assert set(c.id for c in cuts) <= set(seen)


# ---------------------------------------------------------------------------
# BucketingSampler
# ---------------------------------------------------------------------------
def test_bucketing_batches_are_duration_homogeneous():
    cuts = CutSet.from_cuts(
        fastcopy(dummy_cut(i), id=f"c{i}", duration=1.0 + (i % 4)) for i in range(32)
    )
    sampler = BucketingSampler(cuts, num_buckets=4, max_cuts=4)
    for batch in sampler:
        durs = [c.duration for c in batch]
        assert max(durs) - min(durs) <= 1.0  # within one bucket's span
    assert sorted(_flat_ids(BucketingSampler(cuts, num_buckets=4, max_cuts=4))) == sorted(
        c.id for c in cuts
    )


def test_bucketing_rejects_lazy(tmp_path):
    cuts = _cuts(6)
    p = tmp_path / "c.jsonl.gz"
    cuts.to_file(p)
    lazy = CutSet.from_file(p)
    with pytest.raises(ValueError, match="lazy"):
        BucketingSampler(lazy, max_cuts=2)


# ---------------------------------------------------------------------------
# RoundRobinSampler
# ---------------------------------------------------------------------------
def test_round_robin_alternates_and_exhausts():
    a = SimpleCutSampler(_cuts(4, prefix="a"), max_cuts=2)
    b = SimpleCutSampler(_cuts(8, prefix="b"), max_cuts=2)
    rr = RoundRobinSampler(a, b)
    batches = list(rr)
    origins = ["a" if batch[0].id.startswith("a") else "b" for batch in batches]
    # Strict alternation while both live, then the longer one drains.
    assert origins == ["a", "b", "a", "b", "b", "b"]
    assert len(_flat_ids(batches)) == 12


def test_round_robin_stop_early_balances():
    a = SimpleCutSampler(_cuts(4, prefix="a"), max_cuts=2)
    b = SimpleCutSampler(_cuts(8, prefix="b"), max_cuts=2)
    rr = RoundRobinSampler(a, b, stop_early=True)
    batches = list(rr)
    # Ends when the smaller source depletes: 2 from each.
    assert [b_[0].id[0] for b_ in batches] == ["a", "b", "a", "b"]


# ---------------------------------------------------------------------------
# ZipSampler
# ---------------------------------------------------------------------------
def test_zip_merged_batches():
    a = SimpleCutSampler(_cuts(6, prefix="a"), max_cuts=2)
    b = SimpleCutSampler(_cuts(6, prefix="b"), max_cuts=3)
    batches = list(ZipSampler(a, b))
    for batch in batches:
        ids = [c.id for c in batch]
        assert any(i.startswith("a") for i in ids)
        assert any(i.startswith("b") for i in ids)
        assert len(ids) == 5


def test_zip_tuple_batches():
    a = SimpleCutSampler(_cuts(6, prefix="a"), max_cuts=2)
    b = SimpleCutSampler(_cuts(6, prefix="b"), max_cuts=3)
    batches = list(ZipSampler(a, b, merge_batches=False))
    for pair in batches:
        assert len(pair) == 2
        assert all(c.id.startswith("a") for c in pair[0])
        assert all(c.id.startswith("b") for c in pair[1])


# ---------------------------------------------------------------------------
# CutPairsSampler
# ---------------------------------------------------------------------------
def test_cut_pairs_yields_aligned_ids():
    src = _cuts(9)
    tgt = CutSet.from_cuts(fastcopy(c, duration=0.5) for c in src)
    sampler = CutPairsSampler(src, tgt, max_cuts=4)
    for s_batch, t_batch in sampler:
        assert [c.id for c in s_batch] == [c.id for c in t_batch]
        assert all(t.duration == 0.5 for t in t_batch)


def test_cut_pairs_inconsistent_ids_raise():
    src = _cuts(4)
    tgt = _cuts(4, prefix="other")
    sampler = CutPairsSampler(src, tgt, max_cuts=2)
    with pytest.raises(Exception):
        list(sampler)


def test_cut_pairs_source_duration_budget():
    src = _cuts(10, dur=2.0)
    tgt = CutSet.from_cuts(fastcopy(c, duration=0.1) for c in src)
    sizes = [len(s) for s, _ in CutPairsSampler(src, tgt, max_source_duration=6.0)]
    assert all(n <= 3 for n in sizes)


# ---------------------------------------------------------------------------
# WeightedSimpleCutSampler
# ---------------------------------------------------------------------------
def test_weighted_sampler_respects_num_samples_and_bias():
    # Draws are multinomial WITHOUT replacement (reference
    # data_source.py:105): num_samples bounds the epoch, heavy weights
    # surface early, and no cut repeats within the epoch.
    cuts = _cuts(10)
    n = len(cuts)
    weights = [100.0, 100.0] + [1e-6] * (n - 2)
    sampler = WeightedSimpleCutSampler(
        cuts, cuts_weight=weights, num_samples=8, max_cuts=4, seed=0
    )
    drawn = _flat_ids(sampler)
    assert len(drawn) == 8
    assert len(set(drawn)) == 8  # without replacement
    favored = {list(cuts)[0].id, list(cuts)[1].id}
    assert favored <= set(drawn[:4])  # heavy weights drawn early


# ---------------------------------------------------------------------------
# Restore guards (reference: test_sampler_restoring.py)
# ---------------------------------------------------------------------------
class TestRestoreGuards:
    @staticmethod
    def _state(**kwargs):
        cuts = _cuts(8)
        s = SimpleCutSampler(cuts, max_cuts=3, seed=5, **kwargs)
        next(iter(s))
        return cuts, s.state_dict()

    def test_cross_rank_state_rejected(self):
        cuts, state = self._state(world_size=2, rank=0)
        other = SimpleCutSampler(cuts, max_cuts=3, seed=5, world_size=2, rank=1)
        with pytest.raises(RuntimeError, match="rank"):
            other.load_state_dict(state)

    def test_same_rank_still_works(self):
        cuts, state = self._state(world_size=2, rank=1)
        twin = SimpleCutSampler(cuts, max_cuts=3, seed=5, world_size=2, rank=1)
        twin.load_state_dict(state)  # no error

    def test_world_size_mismatch_rejected(self):
        cuts, state = self._state(world_size=2, rank=0)
        other = SimpleCutSampler(cuts, max_cuts=3, seed=5, world_size=4, rank=0)
        with pytest.raises(AssertionError, match="world_size"):
            other.load_state_dict(state)

    def test_seed_mismatch_rejected(self):
        cuts, state = self._state()
        other = SimpleCutSampler(cuts, max_cuts=3, seed=999)
        with pytest.raises(AssertionError, match="[Ss]eed"):
            other.load_state_dict(state)

    def test_forced_restart_discards_restored_progress(self):
        cuts = _cuts(9)
        sampler = SimpleCutSampler(cuts, max_cuts=3, seed=2)
        full = [[c.id for c in b] for b in sampler]

        resumed = SimpleCutSampler(cuts, max_cuts=3, seed=2)
        it = iter(SimpleCutSampler(cuts, max_cuts=3, seed=2))
        next(it)
        state_src = SimpleCutSampler(cuts, max_cuts=3, seed=2)
        s_it = iter(state_src)
        next(s_it)
        resumed.load_state_dict(state_src.state_dict())
        # Explicitly discard the restored progress: iteration starts over.
        resumed.allow_iter_to_reset_state()
        assert [[c.id for c in b] for b in resumed] == full
