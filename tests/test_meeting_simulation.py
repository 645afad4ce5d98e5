"""
Meeting simulation workflows: both simulators, the fit() path, and the
degenerate-statistics regressions (reference:
lhotse/workflows/meeting_simulation/).
"""
import warnings

import numpy as np
import pytest

from lhotse_tpu import CutSet, SupervisionSegment, SupervisionSet
from lhotse_tpu.testing.dummies import dummy_cut, dummy_supervision
from lhotse_tpu.workflows.meeting_simulation import (
    ConversationalMeetingSimulator,
    SpeakerIndependentMeetingSimulator,
)


@pytest.fixture
def utterances():
    cuts = []
    for i in range(12):
        c = dummy_cut(i, with_data=True,
                      supervisions=[dummy_supervision(i, duration=1.0)])
        c.supervisions[0].speaker = f"spk{i % 4}"
        c.custom = {}
        cuts.append(c)
    return CutSet.from_cuts(cuts)


@pytest.fixture
def uniform_meeting_sups():
    """Uniformly segmented corpus: every inter-segment gap is numerically
    identical and there are no overlaps — the degenerate fit() statistics."""
    return SupervisionSet.from_segments([
        SupervisionSegment(id=f"m{i}", recording_id="meet0", start=i * 1.3,
                           duration=1.0, channel=0, speaker=f"s{i % 2}")
        for i in range(20)
    ])


@pytest.mark.parametrize(
    "simulator_cls", [SpeakerIndependentMeetingSimulator, ConversationalMeetingSimulator])
def test_simulate_without_fit(simulator_cls, utterances):
    sim = simulator_cls()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        meetings = list(sim.simulate(
            utterances, num_meetings=3, num_speakers_per_meeting=2, seed=5))
    assert len(meetings) == 3
    for m in meetings:
        assert len({s.speaker for s in m.supervisions}) == 2
        assert np.isfinite(m.load_audio()).all()


@pytest.mark.parametrize(
    "simulator_cls", [SpeakerIndependentMeetingSimulator, ConversationalMeetingSimulator])
def test_fit_on_degenerate_corpus_still_simulates(
        simulator_cls, utterances, uniform_meeting_sups):
    """Regression (found 2026-08-17): identical gaps produced zero-width
    histogram bins whose density sampled NaN durations; empty gap categories
    (no overlaps, no same-speaker pauses) fitted NaN distributions."""
    sim = simulator_cls()
    sim.fit(uniform_meeting_sups)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        meetings = list(sim.simulate(
            utterances, num_meetings=3, num_speakers_per_meeting=2, seed=5))
    assert len(meetings) == 3
    for m in meetings:
        assert np.isfinite(m.duration)
        assert np.isfinite(m.load_audio()).all()


def test_conversational_fit_learns_overlap_probability(utterances):
    sups = []
    t = 0.0
    for i in range(30):
        # Alternate speakers with a mix of pauses and overlaps.
        start = t + (0.4 if i % 3 else -0.2)
        start = max(start, 0.0)
        sups.append(SupervisionSegment(
            id=f"m{i}", recording_id="meet0", start=round(start, 2), duration=1.0,
            channel=0, speaker=f"s{i % 2}"))
        t = start + 1.0
    sim = ConversationalMeetingSimulator()
    sim.fit(SupervisionSet.from_segments(sups))
    assert 0.0 < sim.prob_diff_spk_overlap < 1.0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        meetings = list(sim.simulate(
            utterances, num_meetings=2, num_speakers_per_meeting=2, seed=1))
    assert all(np.isfinite(m.load_audio()).all() for m in meetings)


def test_speaker_independent_fit_on_identical_gaps(tmp_path):
    """scipy's expon MLE returns a TINY NEGATIVE scale for identical gap
    values (float error); simulate() then crashed in np.random.exponential.
    The fitted scale is clamped to >= 0."""
    import numpy as np

    from lhotse_tpu import CutSet, Recording, SupervisionSegment, SupervisionSet
    from lhotse_tpu.audio.wavio import write_wav
    from lhotse_tpu.workflows.meeting_simulation import (
        SpeakerIndependentMeetingSimulator,
    )

    sr = 16000
    cuts = []
    for i in range(6):
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), (0.05 * np.ones(sr)).astype(np.float32), sr)
        rec = Recording.from_file(p, recording_id=f"u{i}")
        c = rec.to_cut()
        c.supervisions = [
            SupervisionSegment(
                id=f"s{i}", recording_id=f"u{i}", start=0, duration=1.0,
                speaker=f"spk{i % 3}")
        ]
        cuts.append(c)

    # Every same-speaker gap identical -> degenerate exponential fit.
    meetings = SupervisionSet.from_segments(
        [
            SupervisionSegment(
                id=f"m{m}-{k}", recording_id=f"meet{m}",
                start=k * 3.0, duration=1.0, speaker="one-speaker")
            for m in range(2)
            for k in range(3)
        ]
    )
    sim = SpeakerIndependentMeetingSimulator()
    sim.fit(meetings)
    assert sim.scale >= 0.0
    out = list(
        sim.simulate(
            CutSet.from_cuts(cuts), num_meetings=2,
            num_speakers_per_meeting=2, seed=3)
    )
    assert len(out) == 2
    for m in out:
        assert np.isfinite(m.load_audio()).all()
