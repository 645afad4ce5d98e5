"""
Switchboard-1 recipe (LDC97S62) — 300h 2-channel telephone conversations;
audio from the LDC package, word-level ISIP transcripts downloaded from
piconepress (one ``*trans.text`` per conversation side), optional
LDC2020T14 sentiment annotations.

Reference behavior: `/root/reference/lhotse/recipes/switchboard.py:25-168`.
"""
import logging
import tarfile
from itertools import chain
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import (Pathlike, check_and_rglob, resumable_download, safe_extract)

SWBD_TEXT_URL = (
    "http://www.isip.piconepress.com/projects/switchboard/releases/"
    "switchboard_word_alignments.tar.gz"
)


def download_and_untar(
    target_dir: Pathlike = ".", force_download: bool = False, url: str = SWBD_TEXT_URL) -> Path:
    """Fetch the ISIP transcripts (the audio itself is LDC-licensed)."""
    target_dir = Path(target_dir)
    transcript_dir = target_dir / "swb_ms98_transcriptions"
    if transcript_dir.is_dir():
        return transcript_dir
    target_dir.mkdir(parents=True, exist_ok=True)
    tar_path = target_dir / "switchboard_word_alignments.tar.gz"
    resumable_download(url, filename=tar_path, force_download=force_download)
    with tarfile.open(tar_path) as tar:
        safe_extract(tar, path=target_dir)
    return transcript_dir


def make_segments(
    transcript_path: Path, recording: Recording, channel: int, omit_silence: bool = True):
    """One `*trans.text` file: `<segment_id> <start> <end> <words...>`."""
    side = "A" if channel == 0 else "B"
    return [
        SupervisionSegment(
            id=segment_id,
            recording_id=recording.id,
            start=float(start),
            duration=round(float(end) - float(start), ndigits=8),
            channel=channel,
            text=" ".join(words),
            language="English",
            speaker=f"{recording.id}{side}",
        )
        for segment_id, start, end, *words in map(
            str.split, transcript_path.read_text().splitlines()
        )
        if words and (words[0] != "[silence]" or not omit_silence)
    ]


def prepare_switchboard(
    audio_dir: Pathlike, transcripts_dir: Optional[Pathlike] = None,
    sentiment_dir: Optional[Pathlike] = None, output_dir: Optional[Pathlike] = None,
    omit_silence: bool = True, absolute_paths: bool = False,
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """
    One "all" split of recordings + supervisions; with ``sentiment_dir``
    (LDC2020T14), sentiment labels are attached to matching segments.
    """
    if transcripts_dir is None:
        transcripts_dir = download_and_untar()
    audio_paths = check_and_rglob(audio_dir, "*.sph")
    text_paths = check_and_rglob(transcripts_dir, "*trans.text")

    name_to_text = {p.stem.split("-")[0]: p for p in text_paths}
    groups = []
    for ap in audio_paths:
        name = ap.stem.replace("sw0", "sw")
        groups.append(
            {
                "audio": ap,
                "text-0": name_to_text[f"{name}A"],
                "text-1": name_to_text[f"{name}B"],
            }
        )

    recordings = RecordingSet.from_recordings(
        Recording.from_file(
            group["audio"],
            relative_path_depth=None if absolute_paths else 3,
        )
        for group in groups
    )
    supervisions = SupervisionSet.from_segments(
        chain.from_iterable(
            make_segments(
                transcript_path=group[f"text-{channel}"],
                recording=recording,
                channel=channel,
                omit_silence=omit_silence,
            )
            for group, recording in zip(groups, recordings)
            for channel in (0, 1)
        )
    )
    recordings, supervisions = fix_manifests(recordings, supervisions)
    validate_recordings_and_supervisions(recordings, supervisions)

    if sentiment_dir is not None:
        parse_and_add_sentiment_labels(sentiment_dir, supervisions)
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        recordings.to_file(output_dir / "swbd_recordings_all.jsonl.gz")
        supervisions.to_file(output_dir / "swbd_supervisions_all.jsonl.gz")
    return {"recordings": recordings, "supervisions": supervisions}


def parse_and_add_sentiment_labels(sentiment_dir: Pathlike, supervisions: SupervisionSet) -> None:
    """LDC2020T14 `sentiment_labels.tsv`: id/start/end/annotator#labels."""
    sentiment_dir = Path(sentiment_dir)
    labels_path = sentiment_dir / "data" / "sentiment_labels.tsv"
    assert sentiment_dir.is_dir() and labels_path.is_file()
    matched = 0
    for line in labels_path.read_text().splitlines():
        fields = line.split("\t")
        if len(fields) < 4:
            continue
        seg_id, start, end, sentiment = fields[:4]
        call_id = seg_id.split("_")[0]
        matches = list(
            supervisions.find(
                recording_id=call_id,
                start_after=float(start) - 1e-2,
                end_before=float(end) + 1e-2,
            )
        )
        if not matches:
            continue
        matched += 1
        labels = sentiment.split("#")
        # .find() returns references: annotate the set's segments in place.
        for segment in matches:
            segment.custom = {f"sentiment{i}": label for i, label in enumerate(labels)}
    logging.info(f"Attached sentiment labels to {matched} annotation spans.")
