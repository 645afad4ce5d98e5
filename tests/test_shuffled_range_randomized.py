"""
Property tests for LazyShuffledRange — the Feistel-network lazy permutation
that underlies O(1) shuffled resume and rank x worker item partitioning
(lhotse_tpu/indexing.py).
"""
from hypothesis import given, settings
from hypothesis import strategies as st

from lhotse_tpu.indexing import LazyShuffledRange


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=5000),
    seed=st.integers(min_value=0, max_value=2**63 - 1),
)
def test_is_a_permutation(n, seed):
    out = list(LazyShuffledRange(n, seed=seed))
    assert sorted(out) == list(range(n))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    seed=st.integers(min_value=0, max_value=1000),
    num_shards=st.sampled_from([2, 3, 8]),
)
def test_shards_partition_the_permutation(n, seed, num_shards):
    full = list(LazyShuffledRange(n, seed=seed))
    shards = [
        list(LazyShuffledRange(n, seed=seed, shard_id=i, num_shards=num_shards))
        for i in range(num_shards)
    ]
    # Each shard is the strided slice of the same global permutation...
    for i, shard in enumerate(shards):
        assert shard == full[i::num_shards]
    # ...so together they cover everything exactly once.
    assert sorted(x for s in shards for x in s) == list(range(n))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=2000),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_different_seeds_differ(n, seed):
    a = list(LazyShuffledRange(n, seed=seed))
    b = list(LazyShuffledRange(n, seed=seed + 1))
    assert sorted(a) == sorted(b)
    if n > 10:  # tiny ranges can collide by chance
        assert a != b


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    seed=st.integers(min_value=0, max_value=1000),
    cut_at=st.integers(min_value=0, max_value=1999),
)
def test_position_checkpoint_resumes_exactly(n, seed, cut_at):
    cut_at = min(cut_at, n)
    full = list(LazyShuffledRange(n, seed=seed))
    r = LazyShuffledRange(n, seed=seed)
    it = iter(r)
    head = [next(it) for _ in range(cut_at)]
    state = r.state_dict()
    r2 = LazyShuffledRange(n, seed=seed)
    r2.load_state_dict(state)
    tail = list(r2)
    assert head + tail == full
