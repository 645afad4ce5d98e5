"""
Differential sampler tests vs the ACTUAL reference implementation: identical
synthetic cut manifests through both implementations' samplers, asserting the
exact per-batch cut-id composition.

Batch composition is a training-reproducibility contract for a migrating
user: same manifest + same sampler settings must cut batches at the same
boundaries.  Reference semantics: lhotse/dataset/sampling/{simple,dynamic,
base}.py (TimeConstraint close_to_exceeding, drop_last, world_size/rank
dedup).
"""
import copy

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    from lhotse import CutSet as RefCutSet
    from lhotse.cut.set import deserialize_cut as ref_deserialize_cut
    from lhotse.dataset.sampling import (
        DynamicCutSampler as RefDynamic,
        SimpleCutSampler as RefSimple,
    )

from lhotse_tpu import CutSet as MyCutSet
from lhotse_tpu.cut.set import deserialize_cut as my_deserialize_cut
from lhotse_tpu.dataset.sampling import (
    DynamicCutSampler as MyDynamic,
    SimpleCutSampler as MySimple,
)

SR = 16000


def _cut_dicts(durations_ms):
    out = []
    for i, dur_ms in enumerate(durations_ms):
        n = int(round(dur_ms * SR / 1000))
        rec_id = f"r{i}"
        out.append(
            {
                "id": f"cut-{i:04d}",
                "start": 0.0,
                "duration": n / SR,
                "channel": 0,
                "recording": {
                    "id": rec_id,
                    "sources": [
                        {"type": "file", "channels": [0], "source": f"/x/{rec_id}.wav"}
                    ],
                    "sampling_rate": SR,
                    "num_samples": n,
                    "duration": n / SR,
                },
                "supervisions": [],
                "type": "MonoCut",
            }
        )
    return out


def _both_cutsets(durations_ms):
    dicts = _cut_dicts(durations_ms)
    theirs = RefCutSet.from_cuts(
        ref_deserialize_cut(copy.deepcopy(d)) for d in dicts
    )
    mine = MyCutSet.from_cuts(my_deserialize_cut(copy.deepcopy(d)) for d in dicts)
    return theirs, mine


def _batches(sampler):
    return [[c.id for c in batch] for batch in sampler]


durations_strategy = st.lists(st.integers(100, 12_000), min_size=1, max_size=40)


@settings(max_examples=80, deadline=None)
@given(
    durations_strategy,
    st.one_of(st.none(), st.integers(1_000, 20_000).map(lambda v: v / 1000)),
    st.one_of(st.none(), st.integers(1, 8)),
    st.booleans(),
)
def test_simple_sampler_batches(durs, max_duration, max_cuts, drop_last):
    if max_duration is None and max_cuts is None:
        max_cuts = 4
    theirs, mine = _both_cutsets(durs)
    kw = dict(
        max_duration=max_duration, max_cuts=max_cuts, shuffle=False, drop_last=drop_last
    )
    try:
        exp = _batches(RefSimple(theirs, **kw))
    except Exception as e:
        with pytest.raises(Exception):
            _batches(MySimple(mine, **kw))
        return
    got = _batches(MySimple(mine, **kw))
    assert got == exp


@settings(max_examples=80, deadline=None)
@given(
    durations_strategy,
    st.integers(1_000, 20_000).map(lambda v: v / 1000),
    st.one_of(st.none(), st.integers(1, 8)),
    st.booleans(),
    st.one_of(st.none(), st.integers(10_000, 30_000).map(lambda v: v / 1000)),
)
def test_dynamic_sampler_batches(durs, max_duration, max_cuts, drop_last, quadratic):
    theirs, mine = _both_cutsets(durs)
    kw = dict(
        max_duration=max_duration,
        max_cuts=max_cuts,
        shuffle=False,
        drop_last=drop_last,
        quadratic_duration=quadratic,
    )
    exp = _batches(RefDynamic(theirs, **kw))
    got = _batches(MyDynamic(mine, **kw))
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(
    durations_strategy,
    st.integers(2, 4),
    st.sampled_from([2_000 / 1000, 8_000 / 1000]),
)
def test_simple_sampler_rank_dedup(durs, world_size, max_duration):
    """Per-rank batches must match the reference's rank/world_size dedup
    arithmetic exactly (reference sampling/base.py:396-451)."""
    for rank in range(world_size):
        theirs, mine = _both_cutsets(durs)
        kw = dict(
            max_duration=max_duration,
            shuffle=False,
            world_size=world_size,
            rank=rank,
        )
        exp = _batches(RefSimple(theirs, **kw))
        got = _batches(MySimple(mine, **kw))
        assert got == exp, f"rank={rank}/{world_size}"


@settings(max_examples=30, deadline=None)
@given(durations_strategy, st.integers(0, 2**31 - 1))
def test_dynamic_sampler_shuffled_order(durs, seed):
    """With identical seeds, shuffled order matches: both use the same
    buffer-shuffle algorithm (reference utils.py:940) with rank-invariant
    seeding."""
    theirs, mine = _both_cutsets(durs)
    kw = dict(max_duration=10.0, shuffle=True, seed=seed, drop_last=False)
    exp = _batches(RefDynamic(theirs, **kw))
    got = _batches(MyDynamic(mine, **kw))
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(300, 20_000), min_size=8, max_size=40),
    st.integers(2, 4),
    st.sampled_from([5.0, 15.0, 40.0]),
    st.booleans(),
    st.integers(0, 2**31 - 1),
)
def test_dynamic_bucketing_sampler_batches(durs, num_buckets, max_duration, shuffle, seed):
    """Bucketed batch composition: bin estimation + bucket dispatch + seeded
    shuffle must all agree (reference sampling/dynamic_bucketing.py)."""
    from lhotse.dataset.sampling import DynamicBucketingSampler as RefBuck
    from lhotse_tpu.dataset.sampling import DynamicBucketingSampler as MyBuck

    theirs, mine = _both_cutsets(durs)
    kw = dict(
        max_duration=max_duration,
        num_buckets=num_buckets,
        shuffle=shuffle,
        seed=seed,
        drop_last=False,
        buffer_size=max(len(durs), 10),
    )
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        exp = _batches(RefBuck(theirs, **kw))
        got = _batches(MyBuck(mine, **kw))
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(500, 10_000), min_size=4, max_size=20),
    st.lists(st.integers(500, 10_000), min_size=4, max_size=20),
    st.integers(1, 5),
)
def test_zip_and_round_robin_samplers(durs_a, durs_b, max_cuts):
    """ZipSampler merges per-source batches; RoundRobinSampler alternates —
    compositions must match (reference sampling/{zip,round_robin}.py)."""
    from lhotse.dataset.sampling import (
        RoundRobinSampler as RefRR,
        SimpleCutSampler as RefSimple2,
        ZipSampler as RefZip,
    )
    from lhotse_tpu.dataset.sampling import (
        RoundRobinSampler as MyRR,
        SimpleCutSampler as MySimple2,
        ZipSampler as MyZip,
    )

    ta, ma = _both_cutsets(durs_a)
    tb, mb = _both_cutsets(durs_b)
    # distinct ids for the second corpus
    tb = RefCutSet.from_cuts(c.with_id("b-" + c.id) for c in tb)
    mb = MyCutSet.from_cuts(c.with_id("b-" + c.id) for c in mb)

    exp = _batches(
        RefZip(
            RefSimple2(ta, max_cuts=max_cuts, shuffle=False),
            RefSimple2(tb, max_cuts=max_cuts, shuffle=False),
        )
    )
    got = _batches(
        MyZip(
            MySimple2(ma, max_cuts=max_cuts, shuffle=False),
            MySimple2(mb, max_cuts=max_cuts, shuffle=False),
        )
    )
    assert got == exp

    exp = _batches(
        RefRR(
            RefSimple2(ta, max_cuts=max_cuts, shuffle=False),
            RefSimple2(tb, max_cuts=max_cuts, shuffle=False),
        )
    )
    got = _batches(
        MyRR(
            MySimple2(ma, max_cuts=max_cuts, shuffle=False),
            MySimple2(mb, max_cuts=max_cuts, shuffle=False),
        )
    )
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(500, 10_000), min_size=4, max_size=24),
    st.integers(2, 6),
    st.integers(0, 2**31 - 1),
)
def test_bucketing_sampler_batches(durs, num_buckets, seed):
    """The eager BucketingSampler (reference sampling/bucketing.py)."""
    from lhotse.dataset.sampling import (
        BucketingSampler as RefBuck,
        SimpleCutSampler as RefSimple2,
    )
    from lhotse_tpu.dataset.sampling import (
        BucketingSampler as MyBuck,
        SimpleCutSampler as MySimple2,
    )

    if num_buckets > len(durs):
        num_buckets = len(durs)
    theirs, mine = _both_cutsets(durs)
    kw = dict(sampler_type=RefSimple2, num_buckets=num_buckets, seed=seed, max_cuts=3, shuffle=False)
    exp = _batches(RefBuck(theirs, **dict(kw)))
    kw["sampler_type"] = MySimple2
    got = _batches(MyBuck(mine, **kw))
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(500, 10_000), min_size=3, max_size=20),
    st.one_of(st.none(), st.integers(2_000, 20_000).map(lambda v: v / 1000)),
    st.one_of(st.none(), st.integers(1, 6)),
    st.booleans(),
)
def test_cut_pairs_sampler_batches(durs, max_src, max_cuts, drop_last):
    """CutPairsSampler: dual-constraint batch boundaries over paired cutsets
    (reference sampling/cut_pairs.py)."""
    from lhotse.dataset.sampling import CutPairsSampler as RefPairs
    from lhotse_tpu.dataset.sampling import CutPairsSampler as MyPairs

    if max_src is None and max_cuts is None:
        max_cuts = 3
    t_src, m_src = _both_cutsets(durs)
    # targets: same ids, doubled durations (as in translation pairs)
    t_tgt, m_tgt = _both_cutsets([min(d * 2, 30_000) for d in durs])
    kw = dict(
        max_source_duration=max_src,
        max_cuts=max_cuts,
        shuffle=False,
        drop_last=drop_last,
    )
    exp = [
        ([c.id for c in s], [c.id for c in t])
        for s, t in RefPairs(t_src, t_tgt, **kw)
    ]
    got = [
        ([c.id for c in s], [c.id for c in t])
        for s, t in MyPairs(m_src, m_tgt, **kw)
    ]
    assert got == exp


def test_weighted_simple_sampler_deviation_pinned():
    """Documented deviation: the reference's WeightedDataSource draws from
    the GLOBAL numpy RNG (reference sampling/data_source.py:156
    ``np.random.choice``) — non-reproducible unless the caller seeds
    ``np.random`` and identical across epochs; ours draws from its own
    seeded per-epoch generator. Pin both behaviors."""
    import numpy as _np

    from lhotse.dataset.sampling import WeightedSimpleCutSampler as RefW
    from lhotse_tpu.dataset.sampling import WeightedSimpleCutSampler as MyW

    durs = [500 + 100 * i for i in range(8)]
    theirs, mine = _both_cutsets(durs)
    weights = [(i % 3) + 1.0 for i in range(len(durs))]
    kw = dict(cuts_weight=list(weights), num_samples=5, max_cuts=2, shuffle=False)

    # reference: global-RNG dependence
    _np.random.seed(7)
    a = _batches(RefW(theirs, **kw))
    _np.random.seed(7)
    b = _batches(RefW(theirs, **kw))
    assert a == b  # deterministic ONLY because we seeded the global RNG

    # ours: self-seeded, reproducible without touching global state
    exp = _batches(MyW(mine, seed=3, **kw))
    got = _batches(MyW(mine, seed=3, **kw))
    assert exp == got
    flat = [i for b_ in got for i in b_]
    assert len(flat) == len(set(flat)) == 5  # no-replacement draw of num_samples


def test_stateless_sampler_runs_where_reference_cannot(tmp_path):
    """The reference's StatelessSampler cannot even construct under torch 2.x
    (stateless.py:120 calls ``super().__init__(data_source=None)``; modern
    ``torch.utils.data.Sampler`` removed that argument). Ours must produce
    infinite hash-seeded draws over the on-disk manifest."""
    import copy as _copy
    import json as _json

    from lhotse.dataset.sampling.stateless import StatelessSampler as RefSL
    from lhotse_tpu.dataset.sampling.stateless import StatelessSampler as MySL

    dicts = _cut_dicts([700 + 37 * i for i in range(20)])
    cuts_path = tmp_path / "cuts.jsonl"
    with cuts_path.open("w") as f:
        for d in dicts:
            print(_json.dumps(_copy.deepcopy(d)), file=f)

    with pytest.raises(TypeError):
        RefSL(
            cuts_paths=[cuts_path],
            index_path=tmp_path / "ref.idx",
            base_seed=42,
            max_cuts=3,
        )

    got_sampler = MySL(
        cuts_paths=[cuts_path],
        index_path=tmp_path / "my.idx",
        base_seed=42,
        max_cuts=3,
    )
    got = [[c.id for c in b] for _, b in zip(range(8), got_sampler)]
    assert len(got) == 8 and all(1 <= len(b) <= 3 for b in got)
    all_ids = {d["id"] for d in _cut_dicts([700 + 37 * i for i in range(20)])}
    # ids carry an _it<N> de-duplication suffix per repeated draw
    assert {i.split("_it")[0] for b in got for i in b} <= all_ids
