"""Edge cases of supervision-level cut operations: trim_to_supervisions,
trim_to_supervision_groups, trim_to_alignments, merge_supervisions,
fill_supervision, and the speaker/supervision activity masks.

Behavioral envelope mirrored from the reference's
`test/cut/test_cut_trim_to_supervisions.py`, `test_cut_merge_supervisions.py`,
`test_cut_fill_supervision.py`, and `test_masks.py`.
"""
import numpy as np
import pytest

from lhotse_tpu import MonoCut, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.supervision import AlignmentItem

SR = 16000


@pytest.fixture
def recording(tmp_path):
    rng = np.random.RandomState(11)
    x = (rng.randn(12 * SR) * 0.1).astype(np.float32)
    p = tmp_path / "r12.wav"
    write_wav(str(p), x, SR)
    return Recording.from_file(p)


def _sup(rec, sid, start, duration, speaker="spk1", text="t", alignment=None):
    return SupervisionSegment(
        id=sid, recording_id=rec.id, start=start, duration=duration,
        speaker=speaker, text=text, alignment=alignment)


@pytest.fixture
def cut(recording):
    return MonoCut(
        id="c", start=0.0, duration=12.0, channel=0, recording=recording,
        supervisions=[
            _sup(recording, "a", 1.0, 2.0, speaker="alice", text="hello there"),
            _sup(recording, "b", 2.5, 1.0, speaker="bob", text="hi"),
            _sup(recording, "c", 8.0, 2.0, speaker="alice", text="again")])


class TestTrimToSupervisions:
    def test_one_cut_per_supervision(self, cut):
        trimmed = list(cut.trim_to_supervisions())
        assert len(trimmed) == 3
        anchor_ids = set()
        for t in trimmed:
            assert len(t.supervisions) >= 1
            # the anchor supervision starts at 0 and spans the whole sub-cut;
            # overlapping bystanders may have negative starts
            anchor = next(s for s in t.supervisions if s.start == pytest.approx(0.0))
            assert t.duration == pytest.approx(anchor.duration)
            anchor_ids.add(anchor.id)
        assert anchor_ids == {"a", "b", "c"}

    def test_keep_overlapping_controls_bleed(self, cut):
        with_overlap = list(cut.trim_to_supervisions(keep_overlapping=True))
        without = list(cut.trim_to_supervisions(keep_overlapping=False))
        # supervision 'a' [1,3] overlaps 'b' [2.5,3.5]
        a_with = next(t for t in with_overlap if t.supervisions[0].id == "a")
        a_without = next(t for t in without if t.supervisions[0].id == "a")
        assert len(a_with.supervisions) == 2
        assert len(a_without.supervisions) == 1

    def test_min_duration_pads_context(self, cut):
        trimmed = list(cut.trim_to_supervisions(min_duration=5.0, keep_overlapping=False))
        # interior supervisions reach the full 5.0s; ones near the cut
        # boundary are clipped but still grow beyond their own span
        c_cut = next(t for t in trimmed if t.supervisions[0].id == "c")
        assert c_cut.duration == pytest.approx(5.0)
        for t in trimmed:
            assert t.duration >= t.supervisions[0].duration

    def test_context_direction_symmetric(self, cut):
        trimmed = list(
            cut.trim_to_supervisions(
                min_duration=4.0, context_direction="center", keep_overlapping=False))
        b = next(t for t in trimmed if t.supervisions[0].id == "b")
        # 1.0s supervision grown to 4.0 -> 1.5s context on each side
        assert b.duration == pytest.approx(4.0)

    def test_audio_matches_supervision_span(self, cut):
        trimmed = list(cut.trim_to_supervisions(keep_overlapping=False))
        a = next(t for t in trimmed if t.supervisions[0].id == "a")
        np.testing.assert_allclose(
            a.load_audio(), cut.load_audio()[:, SR: 3 * SR], atol=1e-7)


class TestTrimToSupervisionGroups:
    def test_overlapping_sups_share_a_group(self, cut):
        groups = list(cut.trim_to_supervision_groups())
        # 'a' and 'b' overlap -> one group; 'c' is separate
        assert len(groups) == 2
        sizes = sorted(len(g.supervisions) for g in groups)
        assert sizes == [1, 2]

    def test_max_pause_merges_distant_groups(self, cut):
        groups = list(cut.trim_to_supervision_groups(max_pause=10.0))
        assert len(groups) == 1
        assert len(groups[0].supervisions) == 3

    def test_group_spans_cover_their_supervisions(self, cut):
        for g in cut.trim_to_supervision_groups():
            for s in g.supervisions:
                assert s.start >= -1e-6
                assert s.end <= g.duration + 1e-6


class TestTrimToAlignments:
    def test_word_level_trimming(self, recording):
        ali = [
            AlignmentItem(symbol="hello", start=1.0, duration=0.4),
            AlignmentItem(symbol="world", start=1.6, duration=0.5)]
        c = MonoCut(
            id="ali-cut", start=0.0, duration=4.0, channel=0, recording=recording,
            supervisions=[
                _sup(recording, "s", 1.0, 1.1, text="hello world",
                     alignment={"word": ali})])
        words = list(c.trim_to_alignments("word"))
        assert len(words) == 2
        assert {w.supervisions[0].text for w in words} == {"hello", "world"}
        hello = next(w for w in words if w.supervisions[0].text == "hello")
        assert hello.duration == pytest.approx(0.4)


class TestMergeSupervisions:
    def test_merge_all(self, cut):
        merged = cut.merge_supervisions()
        assert len(merged.supervisions) == 1
        sup = merged.supervisions[0]
        assert sup.start == pytest.approx(1.0)
        assert sup.end == pytest.approx(10.0)
        assert "hello there" in sup.text and "again" in sup.text

    def test_merge_policy_keep_first_id(self, cut):
        merged = cut.merge_supervisions()
        assert merged.supervisions[0].id.startswith("a") or "a" in merged.supervisions[0].id

    def test_custom_merge_fn(self, cut):
        merged = cut.merge_supervisions(
            custom_merge_fn=lambda field, values: None)
        assert len(merged.supervisions) == 1

    def test_merge_empty_is_noop(self, recording):
        c = MonoCut(id="e", start=0.0, duration=1.0, channel=0, recording=recording)
        assert len(c.merge_supervisions().supervisions) == 0


class TestFillSupervision:
    def test_fill_grows_single_supervision(self, recording):
        c = MonoCut(
            id="f", start=0.0, duration=3.0, channel=0, recording=recording,
            supervisions=[_sup(recording, "s", 1.0, 1.0)])
        filled = c.fill_supervision()
        (sup,) = filled.supervisions
        assert sup.start == 0 and sup.duration == pytest.approx(3.0)

    def test_fill_adds_empty_when_missing(self, recording):
        c = MonoCut(id="g", start=0.0, duration=3.0, channel=0, recording=recording)
        filled = c.fill_supervision(add_empty=True)
        assert len(filled.supervisions) == 1
        assert filled.supervisions[0].duration == pytest.approx(3.0)

    def test_fill_no_add_empty(self, recording):
        c = MonoCut(id="h", start=0.0, duration=3.0, channel=0, recording=recording)
        assert len(c.fill_supervision(add_empty=False).supervisions) == 0

    def test_fill_shrink_requires_flag(self, recording):
        c = MonoCut(
            id="i", start=0.0, duration=2.0, channel=0, recording=recording,
            supervisions=[_sup(recording, "s", 0.5, 5.0)])
        with pytest.raises(ValueError):
            c.fill_supervision(shrink_ok=False)
        shrunk = c.fill_supervision(shrink_ok=True)
        assert shrunk.supervisions[0].duration == pytest.approx(2.0)

    def test_fill_multiple_supervisions_raises(self, cut):
        with pytest.raises(AssertionError):
            cut.fill_supervision()


class TestMasks:
    def test_supervisions_audio_mask_marks_voiced_samples(self, cut):
        mask = cut.supervisions_audio_mask()
        assert mask.shape == (cut.num_samples,)
        assert mask[int(1.5 * SR)] == 1
        assert mask[int(0.5 * SR)] == 0
        assert mask[int(11.0 * SR)] == 0
        # total voiced time: union of [1,3.5] and [8,10] = 4.5s
        assert mask.sum() == pytest.approx(4.5 * SR, rel=0.01)

    def test_speakers_audio_mask_shape_and_rows(self, cut):
        mask = cut.speakers_audio_mask()
        assert mask.shape[0] == 2  # alice, bob
        assert mask.shape[1] == cut.num_samples
        # alice is active in [1,3] and [8,10] -> 4s total
        totals = sorted(mask.sum(axis=1))
        assert totals[0] == pytest.approx(1.0 * SR, rel=0.01)  # bob
        assert totals[1] == pytest.approx(4.0 * SR, rel=0.01)  # alice

    def test_mask_with_alignment(self, recording):
        ali = [AlignmentItem(symbol="x", start=1.0, duration=0.5)]
        c = MonoCut(
            id="m", start=0.0, duration=3.0, channel=0, recording=recording,
            supervisions=[
                _sup(recording, "s", 0.5, 2.0, alignment={"word": ali})])
        coarse = c.supervisions_audio_mask()
        fine = c.supervisions_audio_mask(use_alignment_if_exists="word")
        assert coarse.sum() > fine.sum()
        assert fine.sum() == pytest.approx(0.5 * SR, rel=0.01)

    def test_min_speaker_dim(self, cut):
        mask = cut.speakers_audio_mask(min_speaker_dim=5)
        assert mask.shape[0] == 5
        assert mask[2:].sum() == 0
