"""
SupervisionSet matrix: temporal find(), RTTM import, CTM alignment
attach/export round trips, trim clamping, and set algebra.

Behavioral model: /root/reference/test/test_supervision_set.py.
"""
import pytest

from lhotse_tpu import SupervisionSegment, SupervisionSet
from lhotse_tpu.supervision import AlignmentItem


@pytest.fixture
def sups():
    return SupervisionSet.from_segments(
        [
            SupervisionSegment(
                id="s0", recording_id="r1", start=0.0, duration=2.0, channel=0,
                text="ab", speaker="spkA"),
            SupervisionSegment(
                id="s1", recording_id="r1", start=3.0, duration=1.0, channel=0,
                text="cd", speaker="spkB"),
            SupervisionSegment(
                id="s2", recording_id="r1", start=5.0, duration=2.0, channel=1,
                text="ef", speaker="spkA"),
            SupervisionSegment(
                id="s3", recording_id="r2", start=1.0, duration=1.0, channel=0,
                text="gh", speaker="spkC"),
        ]
    )


# ---------------------------------------------------------------------------
# find()
# ---------------------------------------------------------------------------
def test_find_by_recording_id(sups):
    assert [s.id for s in sups.find("r1")] == ["s0", "s1", "s2"]
    assert [s.id for s in sups.find("r2")] == ["s3"]
    assert list(sups.find("missing")) == []


def test_find_by_channel(sups):
    assert [s.id for s in sups.find("r1", channel=1)] == ["s2"]
    assert [s.id for s in sups.find("r1", channel=0)] == ["s0", "s1"]


def test_find_start_after(sups):
    assert [s.id for s in sups.find("r1", start_after=2.5)] == ["s1", "s2"]
    # Boundary within tolerance is included.
    assert [s.id for s in sups.find("r1", start_after=3.0)] == ["s1", "s2"]


def test_find_start_after_end_before(sups):
    got = [s.id for s in sups.find("r1", start_after=2.5, end_before=4.5)]
    assert got == ["s1"]


def test_find_adjust_offset(sups):
    (seg,) = sups.find("r1", start_after=2.5, end_before=4.5, adjust_offset=True)
    assert seg.start == 0.5  # re-based to the window start
    assert seg.duration == 1.0
    # The original set is untouched.
    assert sups["s1"].start == 3.0


# ---------------------------------------------------------------------------
# RTTM / CTM
# ---------------------------------------------------------------------------
def test_from_rttm(tmp_path):
    rttm = tmp_path / "x.rttm"
    rttm.write_text(
        "SPEAKER rec1 1 0.50 1.25 <NA> <NA> spkA <NA> <NA>\n"
        "SPEAKER rec1 1 2.00 0.75 <NA> <NA> spkB <NA> <NA>\n"
        "SPEAKER rec2 1 0.00 3.00 <NA> <NA> spkA <NA> <NA>\n"
    )
    sups = SupervisionSet.from_rttm(rttm)
    assert len(sups) == 3
    first = list(sups)[0]
    assert first.recording_id == "rec1"
    assert first.start == 0.5 and first.duration == 1.25
    assert first.speaker == "spkA"
    by_rec = {s.recording_id for s in sups}
    assert by_rec == {"rec1", "rec2"}


def test_ctm_roundtrip(tmp_path, sups):
    ctm = tmp_path / "ali.ctm"
    ctm.write_text(
        "r1 0 0.0 1.0 a\n"
        "r1 0 1.0 1.0 b\n"
        "r1 0 3.0 0.5 cd\n"
    )
    with_ali = sups.with_alignment_from_ctm(ctm, type="word")
    s0 = with_ali["s0"]
    assert s0.alignment is not None and "word" in s0.alignment
    assert [a.symbol for a in s0.alignment["word"]] == ["a", "b"]
    assert with_ali["s1"].alignment["word"][0].symbol == "cd"
    # Reference parity (supervision.py:660-682): a segment whose recording
    # HAS ctm entries but none overspanning it gets an empty alignment list.
    assert with_ali["s2"].alignment == {"word": []}

    out = tmp_path / "exported.ctm"
    with_ali.write_alignment_to_ctm(out, type="word")
    lines = [l.split() for l in out.read_text().splitlines()]
    assert [l[4] for l in lines] == ["a", "b", "cd"]
    assert [float(l[2]) for l in lines] == [0.0, 1.0, 3.0]


def test_ctm_with_scores(tmp_path, sups):
    ctm = tmp_path / "ali.ctm"
    ctm.write_text("r1 0 0.2 0.6 hello 0.85\n")
    with_ali = sups.with_alignment_from_ctm(ctm, type="word")
    ali = with_ali["s0"].alignment["word"][0]
    assert ali.symbol == "hello"
    assert ali.score == pytest.approx(0.85)


# ---------------------------------------------------------------------------
# trim / offsets / alignment propagation
# ---------------------------------------------------------------------------
def test_trim_clamps_both_ends():
    seg = SupervisionSegment(
        id="s", recording_id="r", start=-0.5, duration=2.0,
        alignment={"word": [AlignmentItem("w", -0.5, 0.7, None)]})
    trimmed = seg.trim(end=1.0)
    assert trimmed.start == 0.0
    assert trimmed.duration == 1.0
    ali = trimmed.alignment["word"][0]
    assert ali.start == 0.0 and ali.duration == pytest.approx(0.2)


def test_trim_does_not_affect_contained_segment():
    seg = SupervisionSegment(id="s", recording_id="r", start=0.5, duration=1.0)
    trimmed = seg.trim(end=10.0)
    assert (trimmed.start, trimmed.duration) == (0.5, 1.0)


def test_with_offset_moves_alignment():
    seg = SupervisionSegment(
        id="s", recording_id="r", start=1.0, duration=1.0,
        alignment={"word": [AlignmentItem("w", 1.2, 0.3, None)]})
    moved = seg.with_offset(2.0)
    assert moved.start == 3.0
    # Note: with_offset moves the SEGMENT; alignment items keep recording
    # time-base and are moved by the cut machinery when needed.
    assert seg.start == 1.0  # original untouched


# ---------------------------------------------------------------------------
# Set algebra
# ---------------------------------------------------------------------------
def test_add_supervision_sets(sups):
    extra = SupervisionSet.from_segments(
        [SupervisionSegment(id="s9", recording_id="r9", start=0.0, duration=1.0)]
    )
    combined = sups + extra
    assert len(combined) == 5
    assert combined["s9"].recording_id == "r9"
    assert [s.id for s in combined.find("r1")] == ["s0", "s1", "s2"]


def test_map_and_transform_text(sups):
    upper = sups.transform_text(lambda t: t.upper())
    assert [s.text for s in upper] == ["AB", "CD", "EF", "GH"]
    from lhotse_tpu.utils import fastcopy

    shifted = sups.map(lambda s: fastcopy(s, start=s.start + 1.0))
    assert [s.start for s in shifted] == [1.0, 4.0, 6.0, 2.0]


# ---------------------------------------------------------------------------
# find() equivalence fuzz
# ---------------------------------------------------------------------------
def test_find_matches_brute_force_filtering():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lhotse_tpu.utils import is_equal_or_contains

    @st.composite
    def corpora(draw):
        n = draw(st.integers(1, 25))
        segs = []
        for i in range(n):
            segs.append(
                SupervisionSegment(
                    id=f"f{i}",
                    recording_id=f"rec{draw(st.integers(0, 2))}",
                    start=round(draw(st.floats(0.0, 8.0)), 2),
                    duration=round(draw(st.floats(0.1, 3.0)), 2),
                    channel=draw(st.integers(0, 1)),
                )
            )
        return SupervisionSet.from_segments(segs)

    @settings(max_examples=40, deadline=None)
    @given(
        sups=corpora(),
        rec=st.integers(0, 2),
        channel=st.one_of(st.none(), st.integers(0, 1)),
        start_after=st.floats(0.0, 6.0),
        end_before=st.one_of(st.none(), st.floats(2.0, 12.0)),
    )
    def check(sups, rec, channel, start_after, end_before):
        tol = 0.001
        got = [
            s.id
            for s in sups.find(
                f"rec{rec}", channel=channel, start_after=start_after,
                end_before=end_before)
        ]
        want = [
            s.id
            for s in sups
            if s.recording_id == f"rec{rec}"
            and (channel is None or is_equal_or_contains(s.channel, channel))
            and s.start >= start_after - tol
            and (end_before is None or s.end <= end_before + tol)
        ]
        assert got == want

    check()
