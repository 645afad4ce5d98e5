"""
Fluent Speech Commands style SLU corpus — per-split CSVs mapping wav paths
to transcriptions and (action, object, location) frames.

Reference behavior: `/root/reference/lhotse/recipes/slu.py`
(prepare_slu :14-105 — data/{train,valid,test}_data.csv with columns
path/transcription/action/object/location; supervision id = row index,
frames tuple stored in custom).

Deviation: the CSVs are parsed with the csv module instead of pandas.
"""
import csv
import logging
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike

SLU_PARTS = ("train", "valid", "test")


def _read_rows(csv_path: Path):
    with open(csv_path, encoding="utf-8", newline="") as f:
        yield from csv.DictReader(f)


def prepare_slu(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """train/valid/test manifests off the per-split CSV tables."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"

    manifests = {}
    for part in SLU_PARTS:
        logging.info(f"Preparing SLU part: {part}")
        recordings, supervisions = [], []
        for idx, row in enumerate(_read_rows(corpus_dir / "data" / f"{part}_data.csv")):
            recording = Recording.from_file(corpus_dir / row["path"])
            recordings.append(recording)
            supervisions.append(
                SupervisionSegment(
                    id=idx, recording_id=recording.id, start=0,
                    duration=recording.duration, channel=0, text=row["transcription"],
                    custom={
                        "frames": (row["action"], row["object"], row["location"])}))
        manifests[part] = finalize_manifests(
            recordings, supervisions, output_dir=output_dir, prefix="slu", part=part)
    return manifests
