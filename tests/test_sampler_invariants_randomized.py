"""
Property-based sampler invariants (model:
/root/reference/test/dataset/sampling/test_sampling.py's parametrized grid,
widened with hypothesis):

- every cut is emitted exactly once per epoch, across all (rank, world_size)
  partitions combined (the map-style DDP dedup contract);
- batch duration constraints hold (a batch exceeds max_duration only when
  it is a single overlong cut);
- same seed -> identical batch stream; different epoch -> same multiset.
"""
import warnings

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lhotse_tpu import CutSet
from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler
from lhotse_tpu.testing.dummies import dummy_cut


def corpus(n, rng_durations):
    return CutSet.from_cuts(
        dummy_cut(i, duration=rng_durations[i % len(rng_durations)]) for i in range(n)
    )


@st.composite
def sampler_case(draw):
    n = draw(st.integers(min_value=4, max_value=40))
    durations = draw(
        st.lists(
            st.floats(min_value=0.3, max_value=12.0), min_size=1, max_size=8
        )
    )
    world_size = draw(st.sampled_from([1, 2, 4]))
    max_duration = draw(st.sampled_from([10.0, 25.0, 60.0]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    shuffle = draw(st.booleans())
    return n, durations, world_size, max_duration, seed, shuffle


@settings(max_examples=30, deadline=None)
@given(case=sampler_case())
def test_ranks_partition_the_epoch_exactly(case):
    n, durations, world_size, max_duration, seed, shuffle = case
    cuts = corpus(n, durations)
    seen = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for rank in range(world_size):
            sampler = DynamicCutSampler(
                cuts, max_duration=max_duration, shuffle=shuffle, seed=seed,
                world_size=world_size, rank=rank, drop_last=False)
            for batch in sampler:
                # Reference semantics: the batch closes on the cut that makes
                # it close-to-exceeding, so it may overshoot by at most that
                # final cut's duration.
                total = sum(c.duration for c in batch)
                longest = max(c.duration for c in batch)
                assert total - longest <= max_duration + 1e-6
                seen.extend(c.id for c in batch)
    # Uneven rank partitions are equalized by duplicating a cut (with a
    # "_dupN" id suffix) so every DDP rank sees the same number of batches.
    base_ids = [i.split("_dup")[0] for i in seen]
    dups = len(seen) - len(set(base_ids))
    assert dups < world_size
    assert sorted(set(base_ids)) == sorted(c.id for c in cuts)


@settings(max_examples=15, deadline=None)
@given(case=sampler_case())
def test_same_seed_reproduces_batches(case):
    n, durations, world_size, max_duration, seed, shuffle = case
    cuts = corpus(n, durations)

    def stream():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sampler = DynamicCutSampler(
                cuts, max_duration=max_duration, shuffle=shuffle, seed=seed,
                world_size=1, rank=0)
            return [[c.id for c in b] for b in sampler]

    assert stream() == stream()


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=8, max_value=40),
    num_buckets=st.sampled_from([2, 3]),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_bucketing_sampler_covers_epoch_and_bounds_batches(n, num_buckets, seed):
    durations = [0.5 + 0.37 * (i % 11) for i in range(n)]
    cuts = CutSet.from_cuts(
        dummy_cut(i, duration=durations[i]) for i in range(n)
    )
    max_duration = 12.0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sampler = DynamicBucketingSampler(
            cuts, max_duration=max_duration, num_buckets=num_buckets,
            buffer_size=n, shuffle=True, seed=seed, world_size=1, rank=0)
        seen = []
        for batch in sampler:
            total = sum(c.duration for c in batch)
            longest = max(c.duration for c in batch)
            assert total - longest <= max_duration + 1e-6
            seen.extend(c.id for c in batch)
    assert sorted(seen) == sorted(c.id for c in cuts)
