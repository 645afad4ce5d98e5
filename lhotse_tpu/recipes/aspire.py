"""
ASpIRE (LDC2017S21) — ~226 h far-field English dev/dev_test sets from the
IARPA ASpIRE challenge (Mixer 6 subset, Appen transcripts, STM files).

Reference behavior: `/root/reference/lhotse/recipes/aspire.py`
(prepare_aspire :44-152 — 'single' mic scans per-part wav dirs; 'multi' mic
groups per-session channel wavs (``*_NN.wav`` -> channel NN-1) into one
multi-source Recording; supervisions come from per-part STM files keyed
(session, speaker) with a per-group running index).
"""
import logging
from collections import defaultdict
from itertools import groupby
from pathlib import Path
from typing import Dict, NamedTuple, Optional, Union

from lhotse_tpu.audio import AudioSource, Recording, RecordingSet, info
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, Seconds

ASPIRE_PARTS = ("dev", "dev_test")


class AspireSegmentAnnotation(NamedTuple):
    session: str
    speaker: str
    start: Seconds
    end: Seconds
    text: str


def _multi_channel_recordings(audio_dir: Path) -> RecordingSet:
    """Group ``<session>_<NN>.wav`` channel files into one Recording each."""
    recordings = []
    by_session = groupby(
        sorted(audio_dir.glob("*.wav")), key=lambda p: "_".join(p.stem.split("_")[:-1]))
    for session_name, audios in by_session:
        audios = sorted(audios)
        meta = info(audios[0])
        recordings.append(
            Recording(
                id=session_name,
                sources=[
                    AudioSource(
                        type="file", channels=[int(a.stem[-2:]) - 1], source=str(a))
                    for a in audios],
                sampling_rate=meta.samplerate, num_samples=meta.frames,
                duration=meta.frames / meta.samplerate))
    return RecordingSet.from_recordings(recordings)


def _read_stm(path: Path) -> list:
    segments = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            session, _, speaker, start, end, text = line.strip().split(maxsplit=5)
            segments.append(
                AspireSegmentAnnotation(session, speaker, float(start), float(end), text))
    return segments


def prepare_aspire(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None, mic: str = "single",
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """dev/dev_test manifests for the single- or multi-channel variant."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    if mic not in ("single", "multi"):
        raise AssertionError(f"mic must be either 'single' or 'multi', got {mic}")
    data_dir = corpus_dir / "IARPA-ASpIRE-Dev-Sets-v2.0" / "data"
    audio_dir = data_dir / "dev_and_dev_test_audio"
    stm_dir = data_dir / "dev_and_dev_test_STM_files"
    stm_prefix = "" if mic == "single" else "multi_"

    manifests = {}
    for part in ASPIRE_PARTS:
        logging.info(f"Preparing ASpIRE ({mic}) part: {part}")
        part_audio = audio_dir / f"ASpIRE_{mic}_{part}"
        if mic == "single":
            recording_set = RecordingSet.from_dir(part_audio, "*.wav")
        else:
            recording_set = _multi_channel_recordings(part_audio)

        grouped = defaultdict(list)
        for seg in _read_stm(stm_dir / f"{stm_prefix}{part}.stm"):
            grouped[(seg.session, seg.speaker)].append(seg)
        supervisions = []
        for (session, speaker), segs in grouped.items():
            channel = 0 if mic == "single" else recording_set[session].channel_ids
            supervisions.extend(
                SupervisionSegment(
                    id=f"{session}-{speaker}-{i:03d}", recording_id=session,
                    start=seg.start, duration=round(seg.end - seg.start, 4),
                    speaker=speaker, text=seg.text, language="English", channel=channel)
                for i, seg in enumerate(segs))
        manifests[part] = finalize_manifests(
            recording_set, SupervisionSet.from_segments(supervisions),
            output_dir=output_dir, prefix="aspire", part=part)
    return manifests
