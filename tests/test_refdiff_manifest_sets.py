"""
Differential tests for manifest-set semantics vs the ACTUAL reference:
SupervisionSet queries (``find`` with channel/time filters and offset
adjustment), CutSet construction from manifests (the lazy join), and
set-level algebra (subset/filter/sort/split) on identical inputs.

Reference: lhotse/supervision.py:545-700 (find), lhotse/cut/set.py:232-430
(from_manifests), lhotse/cut/set.py:611-820 (subset/sort/split).
"""
import copy

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    from lhotse import (
        CutSet as RefCutSet,
        RecordingSet as RefRecordingSet,
        SupervisionSet as RefSupervisionSet,
    )

from lhotse_tpu import (
    CutSet as MyCutSet,
    RecordingSet as MyRecordingSet,
    SupervisionSet as MySupervisionSet,
)

SR = 16000


def _rec_dict(i: int, dur_ms: int, channels=(0,)) -> dict:
    n = int(round(dur_ms * SR / 1000))
    return {
        "id": f"rec{i}",
        "sources": [
            {"type": "file", "channels": list(channels), "source": f"/x/rec{i}.wav"}
        ],
        "sampling_rate": SR,
        "num_samples": n,
        "duration": n / SR,
    }


def _sup_dict(i: int, rec: int, start_ms: int, dur_ms: int, channel=0) -> dict:
    return {
        "id": f"sup{i}",
        "recording_id": f"rec{rec}",
        "start": start_ms / 1000,
        "duration": dur_ms / 1000,
        "channel": channel,
        "text": f"t{i}",
        "speaker": f"spk{i % 3}",
    }


sups_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # recording index
        st.integers(0, 8_000),  # start ms
        st.integers(10, 4_000),  # duration ms
        st.integers(0, 1),  # channel
    ),
    min_size=0,
    max_size=10,
)


@settings(max_examples=80, deadline=None)
@given(
    sups_strategy,
    st.integers(0, 2),
    st.one_of(st.none(), st.integers(0, 1)),
    st.one_of(st.none(), st.integers(0, 8_000).map(lambda v: v / 1000)),
    st.one_of(st.none(), st.integers(0, 12_000).map(lambda v: v / 1000)),
    st.booleans(),
)
def test_supervision_set_find(sups, rec, channel, start_after, end_before, adjust):
    dicts = [_sup_dict(i, r, s, d, c) for i, (r, s, d, c) in enumerate(sups)]
    theirs = RefSupervisionSet.from_dicts(copy.deepcopy(dicts))
    mine = MySupervisionSet.from_dicts(copy.deepcopy(dicts))
    kw = dict(
        recording_id=f"rec{rec}",
        channel=channel,
        start_after=start_after or 0,
        end_before=end_before,
        adjust_offset=adjust,
    )
    exp = [s.to_dict() for s in theirs.find(**kw)]
    got = [s.to_dict() for s in mine.find(**kw)]
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(500, 12_000), min_size=1, max_size=4),
    sups_strategy,
)
def test_cutset_from_manifests_join(rec_durs, sups):
    """The recordings x supervisions join: same cuts, same attached sups."""
    recs = [_rec_dict(i, d, channels=(0, 1)) for i, d in enumerate(rec_durs)]
    sup_dicts = [
        _sup_dict(i, r % len(rec_durs), s, d, c)
        for i, (r, s, d, c) in enumerate(sups)
    ]
    their_cuts = RefCutSet.from_manifests(
        recordings=RefRecordingSet.from_dicts(copy.deepcopy(recs)),
        supervisions=RefSupervisionSet.from_dicts(copy.deepcopy(sup_dicts)),
    ).to_eager()
    my_cuts = MyCutSet.from_manifests(
        recordings=MyRecordingSet.from_dicts(copy.deepcopy(recs)),
        supervisions=MySupervisionSet.from_dicts(copy.deepcopy(sup_dicts)),
    ).to_eager()
    assert len(their_cuts) == len(my_cuts)
    for tc, mc in zip(their_cuts, my_cuts):
        td, md = tc.to_dict(), mc.to_dict()
        # cut ids are random uuids on both sides; recordings/sups must match
        assert td["recording"] == md["recording"]
        t_sups = sorted(
            (s["id"] for s in td.get("supervisions", []))
        )
        m_sups = sorted((s["id"] for s in md.get("supervisions", [])))
        assert t_sups == m_sups
        assert td["start"] == md["start"] and td["duration"] == md["duration"]
        assert td.get("channel") == md.get("channel")


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(100, 9_999), min_size=1, max_size=20, unique=True),
    st.integers(1, 5),
)
def test_cutset_algebra(durs_ms, num_splits):
    """subset / sort_by_duration / split parity on identical manifests."""
    recs = [_rec_dict(i, d) for i, d in enumerate(durs_ms)]
    cut_dicts = [
        {
            "id": f"c{i:03d}",
            "start": 0.0,
            "duration": r["duration"],
            "channel": 0,
            "recording": r,
            "supervisions": [],
            "type": "MonoCut",
        }
        for i, r in enumerate(recs)
    ]
    theirs = RefCutSet.from_dicts(copy.deepcopy(cut_dicts))
    mine = MyCutSet.from_dicts(copy.deepcopy(cut_dicts))

    assert [c.id for c in theirs.sort_by_duration()] == [
        c.id for c in mine.sort_by_duration()
    ]
    assert [c.id for c in theirs.sort_by_duration(ascending=True)] == [
        c.id for c in mine.sort_by_duration(ascending=True)
    ]

    k = max(1, len(durs_ms) // 2)
    assert [c.id for c in theirs.subset(first=k)] == [
        c.id for c in mine.subset(first=k)
    ]
    assert [c.id for c in theirs.subset(last=k)] == [
        c.id for c in mine.subset(last=k)
    ]

    try:
        exp_split = [[c.id for c in part] for part in theirs.split(num_splits)]
    except ValueError:
        # num_splits > num_items refused on both sides
        with pytest.raises(ValueError):
            mine.split(num_splits)
        exp_split = None
    if exp_split is not None:
        got_split = [[c.id for c in part] for part in mine.split(num_splits)]
        assert got_split == exp_split

    thr = sorted(durs_ms)[len(durs_ms) // 2] / 1000
    assert [c.id for c in theirs.filter(lambda c: c.duration <= thr)] == [
        c.id for c in mine.filter(lambda c: c.duration <= thr)
    ]
