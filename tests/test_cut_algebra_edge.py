"""Edge cases of the cut time algebra: truncate, extend_by, pad, split,
append, and windowing at boundary conditions.

Behavioral envelope mirrored from the reference's cut test corpus
(`/root/reference/test/cut/test_cut_truncate.py`, `test_cut_extend_by.py`,
`test_padding_cut.py`, `test_cut_into_windows_balanced.py`) but written
against this framework's fixtures.
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, MonoCut, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut, PaddingCut, pad
from lhotse_tpu.testing.dummies import dummy_cut, dummy_recording, dummy_supervision

SR = 16000


@pytest.fixture
def recording(tmp_path):
    rng = np.random.RandomState(7)
    x = (rng.randn(10 * SR) * 0.1).astype(np.float32)
    p = tmp_path / "rec10s.wav"
    write_wav(str(p), x, SR)
    return Recording.from_file(p)


@pytest.fixture
def cut(recording):
    return MonoCut(
        id="c0", start=1.0, duration=8.0, channel=0, recording=recording,
        supervisions=[
            SupervisionSegment(id="s1", recording_id=recording.id, start=0.0,
                               duration=2.0, text="first"),
            SupervisionSegment(id="s2", recording_id=recording.id, start=3.0,
                               duration=2.0, text="middle"),
            SupervisionSegment(id="s3", recording_id=recording.id, start=7.0,
                               duration=1.0, text="last")])


class TestTruncate:
    def test_zero_offset_full_duration_is_identity_times(self, cut):
        t = cut.truncate(offset=0.0, duration=cut.duration)
        assert t.start == cut.start and t.duration == cut.duration
        assert len(t.supervisions) == len(cut.supervisions)

    def test_offset_moves_supervision_origins(self, cut):
        t = cut.truncate(offset=3.0)
        assert t.duration == pytest.approx(5.0)
        # s2 started at 3.0 in cut coords -> now at 0.0
        assert any(s.start == pytest.approx(0.0) for s in t.supervisions)
        # s1 is gone entirely (ends at 2.0 < 3.0)
        assert all(s.id != "s1" for s in t.supervisions)

    def test_keep_excessive_supervisions_flag(self, cut):
        partial = cut.truncate(offset=0.0, duration=4.0, keep_excessive_supervisions=True)
        strict = cut.truncate(offset=0.0, duration=4.0, keep_excessive_supervisions=False)
        # s2 spans [3, 5], crossing the 4.0 cutoff
        assert any(s.id == "s2" for s in partial.supervisions)
        assert all(s.id != "s2" for s in strict.supervisions)

    def test_truncate_to_sliver_keeps_positive_num_samples(self, cut):
        t = cut.truncate(offset=cut.duration - 0.001)
        assert t.duration > 0
        assert t.num_samples >= 1
        assert t.load_audio().shape[1] == t.num_samples

    def test_preserve_id(self, cut):
        assert cut.truncate(offset=1.0, preserve_id=True).id == cut.id
        assert cut.truncate(offset=1.0, preserve_id=False).id != cut.id

    def test_truncate_then_load_matches_direct_slice(self, cut):
        t = cut.truncate(offset=2.0, duration=3.0)
        direct = cut.load_audio()[:, 2 * SR: 5 * SR]
        np.testing.assert_allclose(t.load_audio(), direct, rtol=0, atol=0)

    def test_negative_region_raises(self, cut):
        with pytest.raises(Exception):
            cut.truncate(offset=9.5)  # beyond the cut's end


class TestExtendBy:
    def test_extend_right_within_recording(self, cut):
        e = cut.extend_by(duration=1.0, direction="right")
        assert e.duration == pytest.approx(9.0)
        assert e.start == cut.start

    def test_extend_left_clips_at_recording_start(self, cut):
        # without silence padding, only 1.0s of audio exists before the cut
        e = cut.extend_by(duration=5.0, direction="left", pad_silence=False)
        assert e.start == pytest.approx(0.0)
        assert e.duration == pytest.approx(9.0)

    def test_extend_left_pads_silence_by_default(self, cut):
        e = cut.extend_by(duration=5.0, direction="left")
        assert e.duration == pytest.approx(13.0)
        audio = e.load_audio()
        # the first 4 seconds are synthesized silence
        np.testing.assert_allclose(audio[:, : 4 * SR], 0.0, atol=1e-6)

    def test_extend_both_directions(self, cut):
        e = cut.extend_by(duration=0.5, direction="both")
        assert e.start == pytest.approx(0.5)
        assert e.duration == pytest.approx(9.0)

    def test_extend_beyond_recording_end_clips(self, cut):
        e = cut.extend_by(duration=100.0, direction="right", pad_silence=False)
        assert e.end <= cut.recording.duration + 1e-6

    def test_extend_shifts_supervisions(self, cut):
        e = cut.extend_by(duration=1.0, direction="left")
        # supervisions shift right by the amount prepended
        orig = {s.id: s.start for s in cut.supervisions}
        for s in e.supervisions:
            assert s.start == pytest.approx(orig[s.id] + 1.0)


class TestPad:
    def test_pad_is_noop_when_target_shorter(self, cut):
        assert cut.pad(duration=cut.duration - 1.0) is cut or (
            cut.pad(duration=cut.duration - 1.0).duration == cut.duration)

    def test_pad_right_produces_mixed_cut_with_padding_track(self, cut):
        p = cut.pad(duration=10.0)
        assert isinstance(p, MixedCut)
        assert p.duration == pytest.approx(10.0)
        kinds = [type(t.cut).__name__ for t in p.tracks]
        assert "PaddingCut" in kinds
        audio = p.load_audio()
        np.testing.assert_allclose(audio[:, -SR:], 0.0, atol=1e-6)

    def test_pad_left_offsets_speech(self, cut):
        p = cut.pad(duration=10.0, direction="left")
        audio = p.load_audio()
        np.testing.assert_allclose(audio[:, : 2 * SR], 0.0, atol=1e-6)

    def test_pad_both_splits_padding(self, cut):
        p = cut.pad(duration=10.0, direction="both")
        assert p.duration == pytest.approx(10.0)
        audio = p.load_audio()
        np.testing.assert_allclose(audio[:, :SR], 0.0, atol=1e-6)
        np.testing.assert_allclose(audio[:, -SR:], 0.0, atol=1e-6)

    def test_pad_num_samples(self, cut):
        p = cut.pad(num_samples=10 * SR + 3)
        assert p.num_samples == 10 * SR + 3
        assert p.load_audio().shape[1] == 10 * SR + 3

    def test_pad_preserves_supervision_times(self, cut):
        p = cut.pad(duration=10.0, direction="left")
        sups = sorted(p.supervisions, key=lambda s: s.start)
        assert sups[0].start == pytest.approx(2.0)  # shifted by 2s of padding

    def test_module_level_pad_matches_method(self, cut):
        a = pad(cut, duration=12.0)
        b = cut.pad(duration=12.0)
        assert a.duration == b.duration == pytest.approx(12.0)

    def test_pad_custom_value(self, cut):
        p = cut.pad(duration=10.0, pad_value_dict=None)
        assert isinstance(p, MixedCut)


class TestSplitAppend:
    def test_split_partitions_duration(self, cut):
        left, right = cut.split(3.0)
        assert left.duration == pytest.approx(3.0)
        assert right.duration == pytest.approx(cut.duration - 3.0)
        assert left.end == pytest.approx(cut.start + 3.0)

    def test_split_supervisions_assigned_to_sides(self, cut):
        left, right = cut.split(2.5)
        assert {s.id for s in left.supervisions} >= {"s1"}
        assert {s.id for s in right.supervisions} >= {"s3"}

    def test_split_audio_concatenation_is_lossless(self, cut):
        left, right = cut.split(4.0)
        glued = np.concatenate([left.load_audio(), right.load_audio()], axis=1)
        np.testing.assert_allclose(glued, cut.load_audio())

    def test_append_durations_add(self, cut):
        joined = cut.truncate(duration=2.0).append(cut.truncate(offset=2.0, duration=2.0))
        assert isinstance(joined, MixedCut)
        assert joined.duration == pytest.approx(4.0)
        np.testing.assert_allclose(
            joined.load_audio(), cut.truncate(duration=4.0).load_audio(), atol=1e-6)


class TestWindows:
    def test_exact_division(self, cut):
        windows = cut.cut_into_windows(duration=2.0)
        windows = list(windows)
        assert len(windows) == 4
        assert all(w.duration == pytest.approx(2.0) for w in windows)

    def test_remainder_window(self, cut):
        windows = list(cut.cut_into_windows(duration=3.0))
        assert len(windows) == 3
        assert windows[-1].duration == pytest.approx(2.0)

    def test_hop_creates_overlap(self, cut):
        windows = list(cut.cut_into_windows(duration=4.0, hop=2.0))
        assert len(windows) >= 3
        assert windows[1].start - windows[0].start == pytest.approx(2.0)

    def test_window_audio_is_contiguous_slice(self, cut):
        windows = list(cut.cut_into_windows(duration=2.0))
        full = cut.load_audio()
        for i, w in enumerate(windows):
            np.testing.assert_allclose(
                w.load_audio(), full[:, i * 2 * SR: (i + 1) * 2 * SR])

    def test_balanced_windows_cover_everything(self, cut):
        windows = list(cut.cut_into_windows_balanced(min_duration=2.0, max_duration=3.0))
        total = sum(w.duration for w in windows)
        assert total >= cut.duration - 1e-6
        durs = [w.duration for w in windows]
        assert all(2.0 - 1e-6 <= d <= 3.0 + 1e-6 for d in durs)
        # provenance is recorded on each window
        assert all(w.custom["source_cut_id"] == cut.id for w in windows)

    def test_balanced_windows_short_cut_is_passthrough(self, cut):
        short = cut.truncate(duration=2.0)
        (only,) = list(short.cut_into_windows_balanced(min_duration=2.0, max_duration=3.0))
        assert only.duration == pytest.approx(2.0)


class TestDummyFactoryCuts:
    """The same algebra over metadata-only cuts (no audio I/O)."""

    def test_truncate_without_data(self):
        c = dummy_cut(1, duration=1.0)
        t = c.truncate(offset=0.25, duration=0.5)
        assert t.duration == pytest.approx(0.5)

    def test_pad_without_data(self):
        c = dummy_cut(2, duration=1.0)
        p = c.pad(duration=2.0)
        assert p.duration == pytest.approx(2.0)
        assert p.num_samples == 2 * SR

    def test_windows_without_data(self):
        c = dummy_cut(3, duration=1.0)
        ws = list(c.cut_into_windows(duration=0.4))
        assert [round(w.duration, 3) for w in ws] == [0.4, 0.4, 0.2]

    def test_supervision_clamp_on_dummy(self):
        rec = dummy_recording(4, duration=2.0)
        c = MonoCut(
            id="d", start=0.0, duration=2.0, channel=0, recording=rec,
            supervisions=[dummy_supervision(1, start=1.5, duration=1.0)])
        t = c.truncate(duration=1.8, keep_excessive_supervisions=True)
        (sup,) = t.trimmed_supervisions
        assert sup.end <= t.duration + 1e-8
