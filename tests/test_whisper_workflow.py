"""
annotate_with_whisper workflow logic, driven via the ``transcribe_fn``
injection point (no model/network needed) — segment-to-supervision
conversion, duration clamping, force_nonoverlapping postprocessing,
RecordingSet vs CutSet handling, and multichannel skipping.
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Recording, RecordingSet
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.workflows import annotate_with_whisper

SR = 16000


@pytest.fixture
def recordings(tmp_path):
    recs = []
    for i in range(2):
        path = tmp_path / f"r{i}.wav"
        write_wav(
            str(path),
            (0.1 * np.random.RandomState(i).randn(2 * SR)).astype(np.float32),
            SR,
        )
        recs.append(Recording.from_file(path, recording_id=f"rec{i}"))
    return RecordingSet.from_recordings(recs)


def fake_transcribe(audio, **opts):
    return (
        [(0.0, 0.8, " hello "), (0.8, 1.6, "world"), (1.6, 1.6, "empty-span")],
        "en",
    )


class TestWhisperWorkflow:
    def test_recording_set_annotation(self, recordings):
        cuts = list(
            annotate_with_whisper(recordings, transcribe_fn=fake_transcribe)
        )
        assert len(cuts) == 2
        for cut in cuts:
            sups = cut.supervisions
            # The zero-length third segment is dropped.
            assert [s.text for s in sups] == ["hello", "world"]
            assert all(s.language == "en" for s in sups)
            assert sups[0].start == 0.0 and abs(sups[0].duration - 0.8) < 1e-6
            assert all(s.end <= cut.duration + 1e-6 for s in sups)

    def test_cutset_annotation_overwrites_supervisions(self, recordings):
        from lhotse_tpu import SupervisionSegment

        base = CutSet.from_cuts(r.to_cut() for r in recordings)
        for c in base:
            c.supervisions.append(
                SupervisionSegment(
                    id=f"old-{c.id}", recording_id=c.recording_id,
                    start=0.0, duration=c.duration, text="OLD",
                )
            )
        out = list(annotate_with_whisper(base, transcribe_fn=fake_transcribe))
        for cut in out:
            assert [s.text for s in cut.supervisions] == ["hello", "world"]

    def test_end_clamped_to_cut_duration(self, recordings):
        def overshooting(audio, **opts):
            return [(1.0, 99.0, "tail")], "de"

        (cut, _) = list(
            annotate_with_whisper(recordings, transcribe_fn=overshooting)
        )
        (sup,) = cut.supervisions
        assert abs(sup.end - cut.duration) < 1e-6
        assert sup.language == "de"

    def test_force_nonoverlapping(self, recordings):
        def overlapping(audio, **opts):
            return [(0.0, 1.5, "a"), (1.0, 2.0, "b")], "en"

        cuts = list(
            annotate_with_whisper(
                recordings, transcribe_fn=overlapping, force_nonoverlapping=True
            )
        )
        sups = cuts[0].supervisions
        assert len(sups) == 2
        # First segment truncated at the second's start.
        assert abs(sups[0].end - 1.0) < 1e-6

    def test_multichannel_recordings_skipped(self, tmp_path, recordings):
        stereo_path = tmp_path / "stereo.wav"
        write_wav(
            str(stereo_path),
            (0.1 * np.random.RandomState(9).randn(2, SR)).astype(np.float32),
            SR,
        )
        mixed = RecordingSet.from_recordings(
            list(recordings) + [Recording.from_file(stereo_path)]
        )
        cuts = list(annotate_with_whisper(mixed, transcribe_fn=fake_transcribe))
        assert len(cuts) == 2  # the stereo recording is skipped with a warning

    def test_decode_options_forwarded(self, recordings):
        seen = {}

        def capture(audio, **opts):
            seen.update(opts)
            return [(0.0, 1.0, "x")], "en"

        list(
            annotate_with_whisper(
                recordings, transcribe_fn=capture, language="fr", beam_size=5
            )
        )
        assert seen == {"language": "fr", "beam_size": 5}
