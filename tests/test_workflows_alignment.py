"""Forced-alignment CTC math + aligner plumbing + activity detector base."""
import numpy as np
import pytest

from lhotse_tpu.supervision import AlignmentItem
from lhotse_tpu.testing.dummies import dummy_cut, dummy_supervision
from lhotse_tpu.workflows import (
    ActivityDetector, EnergyVAD, FailedToAlign, ForcedAligner, align_supervisions)
from lhotse_tpu.workflows.forced_alignment.ctc import (
    align_ctc_emission, ctc_forced_align, merge_repeats, merge_words)

# Vocabulary for the synthetic CTC tests: blank=0, then letters.
VOCAB = {"-": 0, "|": 1, "C": 2, "A": 3, "T": 4, "S": 5}


def make_emission(frame_symbols, vocab=VOCAB, peak=8.0):
    """Log-softmax-ish emission matrix strongly peaked on the given symbol
    per frame."""
    em = np.full((len(frame_symbols), len(vocab)), -peak)
    for t, sym in enumerate(frame_symbols):
        em[t, vocab[sym]] = 0.0
    return em - np.log(np.sum(np.exp(em), axis=1, keepdims=True))


def test_ctc_forced_align_recovers_frame_positions():
    # "CAT|S": C on frames 1-2, A on 4, T on 6, | on 7, S on 8.
    frames = ["-", "C", "C", "-", "A", "-", "T", "|", "S", "-"]
    transcript = "CAT|S"
    words = align_ctc_emission(make_emission(frames), transcript, VOCAB)
    assert [w.label for w in words] == ["CAT", "S"]
    cat, s = words
    assert cat.start == 1 and cat.end == 7  # C@1 .. T@6 (+1)
    assert s.start == 8 and s.end >= 9
    assert 0.0 < cat.score <= 1.0


def test_ctc_merge_repeats_and_words():
    frames = ["C", "C", "A", "T"]
    path = ctc_forced_align(make_emission(frames), [VOCAB[c] for c in "CAT"])
    segs = merge_repeats(path, "CAT")
    assert [s.label for s in segs] == ["C", "A", "T"]
    assert segs[0].length == 2
    words = merge_words(segs)
    assert len(words) == 1 and words[0].label == "CAT"
    assert words[0].start == 0 and words[0].end == 4


def test_ctc_failure_modes():
    em = make_emission(["C", "A"])
    with pytest.raises(FailedToAlign):
        ctc_forced_align(em, [VOCAB[c] for c in "CATS"])  # too many tokens
    with pytest.raises(FailedToAlign):
        ctc_forced_align(em, [])


class _FakeAligner(ForcedAligner):
    """Splits each supervision's duration evenly across its words."""

    @property
    def sample_rate(self) -> int:
        return 16000

    def normalize_text(self, text, language=None):
        return text.upper()

    def align(self, audio, transcript):
        words = transcript.split()
        dur = audio.shape[-1] / self.sample_rate / len(words)
        return [
            AlignmentItem(symbol=w, start=round(i * dur, 8), duration=round(dur, 8)) for i,
            w in enumerate(words)]


def test_forced_aligner_call_attaches_word_alignment():
    cut = dummy_cut(
        0, with_data=True, duration=1.0,
        supervisions=[dummy_supervision(0, duration=1.0, text="hello world")])
    aligned = _FakeAligner()(cut)
    ali = aligned.supervisions[0].alignment["word"]
    assert [a.symbol for a in ali] == ["HELLO", "WORLD"]
    assert ali[0].start == 0.0 and ali[1].start == pytest.approx(0.5)
    # Original cut untouched (with_alignment must not mutate the source dict).
    assert "word" not in (cut.supervisions[0].alignment or {})


def test_align_supervisions_with_custom_factory():
    from lhotse_tpu.cut import CutSet

    cuts = []
    for i in range(3):
        c = dummy_cut(
            i, with_data=True, duration=1.0,
            supervisions=[dummy_supervision(i, duration=1.0, text="one two")])
        cuts.append(c)
    out = list(align_supervisions(CutSet.from_cuts(cuts), aligner_factory=_FakeAligner))
    assert len(out) == 3
    for c in out:
        assert [a.symbol for a in c.supervisions[0].alignment["word"]] == ["ONE", "TWO"]


def test_energy_vad_activity_detector():
    cut = dummy_cut(0, with_data=True, duration=2.0)
    rec = cut.recording
    segs = EnergyVAD(sampling_rate=rec.sampling_rate, threshold=0.001)(rec)
    assert isinstance(EnergyVAD(), ActivityDetector)
    assert all(s.recording_id == rec.id for s in segs)
    # dummy audio is a constant tone -> one long span covering most of it.
    assert len(segs) >= 1
    assert sum(s.duration for s in segs) > 1.0


def test_align_with_torchaudio_compat_errors():
    from lhotse_tpu.workflows import align_with_torchaudio

    # MMS_FA routes to MMSForcedAligner (tested in test_mms_aligner.py);
    # empty input drains without constructing the model.
    assert list(align_with_torchaudio([], bundle_name="MMS_FA")) == []
    with pytest.raises(ValueError):
        next(align_with_torchaudio([], bundle_name="NOT_A_BUNDLE"))


def test_whisper_postprocess_timestamps():
    from lhotse_tpu.supervision import SupervisionSegment
    from lhotse_tpu.workflows.whisper import _postprocess_timestamps

    sups = [
        SupervisionSegment(id="b", recording_id="r", start=2.0, duration=3.0),
        SupervisionSegment(id="a", recording_id="r", start=0.0, duration=2.5)]
    out = _postprocess_timestamps(sups)
    assert [s.id for s in out] == ["a", "b"]
    # 'a' overshoots into 'b': truncated at b.start.
    assert out[0].end == pytest.approx(2.0)
    assert out[1].end == pytest.approx(5.0)
    assert _postprocess_timestamps(sups[:1]) == sups[:1]
