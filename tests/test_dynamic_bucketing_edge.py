"""
DynamicBucketingSampler edge matrix: precomputed bins, tiny corpora vs
DDP ranks, drop_last, paired/triplet inputs, the fixed-bucket TPU
constraint, and bin-boundary selection.

Behavioral model: /root/reference/test/dataset/sampling/test_dynamic_bucketing.py.
"""
import warnings

import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.dataset.sampling.dynamic_bucketing import (
    DynamicBucketingSampler,
    FixedBucketBatchSizeConstraint,
    estimate_duration_buckets,
)
from lhotse_tpu.testing.dummies import DummyManifest
from lhotse_tpu.utils import fastcopy


def _cuts(durations):
    base = list(DummyManifest(CutSet, begin_id=0, end_id=len(durations)))
    return CutSet.from_cuts(
        fastcopy(c, id=f"c{i}", duration=d) for i, (c, d) in enumerate(zip(base, durations))
    )


def _sampler(*cuts, **kwargs):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # eager CutSet warning: irrelevant here
        return DynamicBucketingSampler(*cuts, buffer_size=64, **kwargs)


# ---------------------------------------------------------------------------
# Duration bins
# ---------------------------------------------------------------------------
def test_estimate_duration_buckets_equal_total_duration():
    # 2 bins over durations [1,1,1,2,2,2]: the boundary splits total
    # duration (9s) evenly -> boundary at 2.
    cuts = _cuts([1, 1, 1, 2, 2, 2])
    bins = estimate_duration_buckets(cuts, num_buckets=2)
    assert list(bins) == [2]


def test_estimate_duration_buckets_4b():
    cuts = _cuts([1] * 5 + [2] * 5 + [3] * 5 + [4] * 5)
    bins = estimate_duration_buckets(cuts, num_buckets=4)
    assert list(bins) == [2, 3, 4]


def test_precomputed_duration_bins_are_used(tmp_path):
    cuts = _cuts([1.0] * 6 + [5.0] * 6)
    sampler = _sampler(
        cuts, max_duration=10.0, duration_bins=[2.0], num_buckets=None, seed=0
    )
    batches = list(sampler)
    # Bucketing keeps short and long cuts apart.
    for b in batches:
        durs = {c.duration for c in b}
        assert durs <= {1.0} or durs <= {5.0}
    assert sorted(c.id for b in batches for c in b) == sorted(c.id for c in cuts)


# ---------------------------------------------------------------------------
# Tiny corpora / drop_last
# ---------------------------------------------------------------------------
def test_too_small_data_can_still_be_sampled():
    # Not enough audio to fill max_duration in any bucket: everything must
    # still come out exactly once (precomputed bins sidestep estimation,
    # which requires num_buckets <= num_cuts).
    cuts = _cuts([1.0, 1.0, 2.0, 2.0])
    batches = list(
        _sampler(cuts, max_duration=100.0, duration_bins=[1.5], num_buckets=None)
    )
    got = [c.id for b in batches for c in b]
    assert sorted(got) == ["c0", "c1", "c2", "c3"]
    assert len(set(got)) == len(got)


def test_too_small_data_drop_last_true_yields_nothing():
    cuts = _cuts([1.0, 1.0])
    batches = list(
        _sampler(
            cuts, max_duration=10.0, duration_bins=[1.5], num_buckets=None,
            drop_last=True)
    )
    assert batches == []


@pytest.mark.parametrize("world_size", [2, 4])
def test_much_less_data_than_ddp_ranks(world_size):
    cuts = _cuts([1.0])
    per_rank = []
    for rank in range(world_size):
        s = _sampler(
            cuts, max_duration=10.0, duration_bins=[2.0], num_buckets=None,
            world_size=world_size, rank=rank, seed=0)
        per_rank.append([c.id for b in s for c in b])
    # No rank deadlocks; the single cut is served. Duplicated tail cuts are
    # id-marked with a _dup suffix so training code can spot them.
    assert any(ids for ids in per_rank)
    for ids in per_rank:
        assert len(ids) <= 1
        assert all(i == "c0" or i.startswith("c0_dup") for i in ids)


def test_drop_last_false_keeps_remainders():
    cuts = _cuts([1.0] * 7)
    kept = [c.id for b in _sampler(cuts, max_cuts=2, num_buckets=2) for c in b]
    assert sorted(kept) == sorted(c.id for c in cuts)


# ---------------------------------------------------------------------------
# Paired / triplet inputs
# ---------------------------------------------------------------------------
def test_cut_pairs_through_bucketing():
    durations = [1.0, 1.0, 3.0, 3.0, 1.0, 3.0]
    src = _cuts(durations)
    tgt = CutSet.from_cuts(fastcopy(c, duration=c.duration / 2) for c in src)
    sampler = _sampler(src, tgt, max_duration=6.0, num_buckets=2)
    seen = []
    for s_batch, t_batch in sampler:
        assert [c.id for c in s_batch] == [c.id for c in t_batch]
        assert all(t.duration == s.duration / 2 for s, t in zip(s_batch, t_batch))
        seen.extend(c.id for c in s_batch)
    assert sorted(seen) == sorted(c.id for c in src)


def test_cut_triplets_through_bucketing():
    src = _cuts([1.0] * 6)
    mid = CutSet.from_cuts(fastcopy(c) for c in src)
    tgt = CutSet.from_cuts(fastcopy(c) for c in src)
    sampler = _sampler(src, mid, tgt, max_cuts=2, num_buckets=2)
    for triple in sampler:
        assert len(triple) == 3
        ids = [[c.id for c in part] for part in triple]
        assert ids[0] == ids[1] == ids[2]


# ---------------------------------------------------------------------------
# FixedBucketBatchSizeConstraint (TPU static shapes)
# ---------------------------------------------------------------------------
def test_fixed_bucket_constraint_batch_sizes():
    cuts = _cuts([1.0] * 8 + [7.0] * 4)
    constraint = FixedBucketBatchSizeConstraint(
        max_seq_len_buckets=[2.0, 8.0], batch_sizes=[4, 2]
    )
    sampler = _sampler(
        cuts, constraint=constraint, duration_bins=[2.0], num_buckets=None
    )
    for batch in sampler:
        durs = [c.duration for c in batch]
        if max(durs) <= 2.0:
            assert len(batch) <= 4
        else:
            assert len(batch) <= 2
    # Full coverage.
    got = sorted(
        c.id
        for b in _sampler(
            cuts,
            constraint=FixedBucketBatchSizeConstraint(
                max_seq_len_buckets=[2.0, 8.0], batch_sizes=[4, 2]
            ),
            duration_bins=[2.0],
            num_buckets=None,
        )
        for c in b
    )
    assert got == sorted(c.id for c in cuts)


def test_fixed_bucket_constraint_rejects_oversized():
    constraint = FixedBucketBatchSizeConstraint(
        max_seq_len_buckets=[2.0, 4.0], batch_sizes=[2, 1]
    )
    from lhotse_tpu.testing.dummies import dummy_cut

    too_long = fastcopy(dummy_cut(0), duration=9.0)
    with pytest.raises(AssertionError, match="exceeds"):
        constraint.add(too_long)


def test_select_bucket_includes_upper_bound():
    constraint = FixedBucketBatchSizeConstraint(
        max_seq_len_buckets=[2.0, 4.0], batch_sizes=[2, 1]
    )
    # A length exactly on a boundary belongs to that boundary's bucket.
    assert constraint.select_bucket(constraint.max_seq_len_buckets, example_len=2.0) == 0
    assert constraint.select_bucket(constraint.max_seq_len_buckets, example_len=4.0) == 1


def test_fixed_bucket_constraint_unsorted_buckets_raise():
    with pytest.raises(AssertionError):
        FixedBucketBatchSizeConstraint(
            max_seq_len_buckets=[4.0, 2.0], batch_sizes=[1, 2]
        )
