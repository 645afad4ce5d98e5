"""
MiniLibriMix — the small premixed LibriMix release on Zenodo, described by a
single metadata CSV with per-mixture source/noise/mixture paths.

Reference behavior: `/root/reference/lhotse/recipes/librimix_mini.py`
(download_librimix_mini :12-35; prepare_librimix_mini :37-126 — 'sources'
manifests always (two sources as channels 0/1 of one Recording), 'premixed'
on request, 'noise' when the CSV has a noise_path column; segments shorter
than ``min_segment_seconds`` dropped).

Deviation: the CSV is parsed with the csv module instead of pandas.
"""
import csv
import logging
import shutil
from pathlib import Path
from typing import Dict, List, Optional, Union
from zipfile import ZipFile

from lhotse_tpu.audio import AudioSource, Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, Seconds, resumable_download

_URL = "https://zenodo.org/record/3871592/files/MiniLibriMix.zip"


def download_librimix_mini(
    target_dir: Pathlike = ".", force_download: Optional[bool] = False,
    url: Optional[str] = _URL) -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    unzipped_dir = target_dir / "MiniLibriMix"
    marker = unzipped_dir / ".completed"
    if marker.is_file():
        logging.info(f"Skipping MiniLibriMix because {marker} exists.")
        return unzipped_dir
    zip_path = target_dir / "MiniLibriMix.zip"
    resumable_download(url, filename=zip_path, force_download=force_download)
    shutil.rmtree(unzipped_dir, ignore_errors=True)
    with ZipFile(zip_path) as zf:
        zf.extractall(path=target_dir)
    marker.touch()
    return unzipped_dir


def make_corresponding_supervisions(audio: RecordingSet) -> SupervisionSet:
    """Whole-recording placeholder supervisions, one per source channel."""
    return SupervisionSet.from_segments(
        SupervisionSegment(
            id=f"{recording.id}-c{source.channels[0]}", recording_id=recording.id,
            start=0.0, duration=recording.duration, channel=source.channels[0])
        for recording in audio
        for source in recording.sources)


def _recording_from_row(row: dict, sources: List[AudioSource], sampling_rate: int):
    length = int(float(row["length"]))
    return Recording(
        id=row["mixture_ID"], sources=sources, sampling_rate=sampling_rate,
        num_samples=length, duration=length / sampling_rate)


def _build_variant(
    rows: List[dict], make_sources, sampling_rate: int,
    min_segment_seconds: Seconds) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    recordings = RecordingSet.from_recordings(
        _recording_from_row(row, make_sources(row), sampling_rate)
        for row in rows
        if float(row["length"]) / sampling_rate > min_segment_seconds)
    supervisions = make_corresponding_supervisions(recordings)
    return finalize_manifests(recordings, supervisions)


def prepare_librimix_mini(
    librimix_csv: Pathlike, output_dir: Optional[Pathlike] = None,
    with_precomputed_mixtures: bool = False, sampling_rate: int = 16000,
    min_segment_seconds: Seconds = 3.0,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """sources/premixed/noise manifests off one MiniLibriMix metadata CSV."""
    librimix_csv = Path(librimix_csv)
    assert librimix_csv.is_file(), f"No such file: {librimix_csv}"
    with open(librimix_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)

    manifests = {}
    manifests["sources"] = _build_variant(
        rows,
        lambda row: [
            AudioSource(type="file", channels=[0], source=row["source_1_path"]),
            AudioSource(type="file", channels=[1], source=row["source_2_path"])],
        sampling_rate, min_segment_seconds)
    if output_dir is not None:
        manifests["sources"]["recordings"].to_file(
            output_dir / "librimix_recordings_sources.jsonl.gz")
        manifests["sources"]["supervisions"].to_file(
            output_dir / "librimix_supervisions_sources.jsonl.gz")

    if with_precomputed_mixtures:
        manifests["premixed"] = _build_variant(
            rows,
            lambda row: [AudioSource(type="file", channels=[0], source=row["mixture_path"])],
            sampling_rate, min_segment_seconds)
        if output_dir is not None:
            manifests["premixed"]["recordings"].to_file(
                output_dir / "librimix_recordings_mix.jsonl.gz")
            manifests["premixed"]["supervisions"].to_file(
                output_dir / "librimix_supervisions_mix.jsonl.gz")

    if rows and "noise_path" in rows[0]:
        manifests["noise"] = _build_variant(
            rows,
            lambda row: [AudioSource(type="file", channels=[0], source=row["noise_path"])],
            sampling_rate, min_segment_seconds)
        if output_dir is not None:
            manifests["noise"]["recordings"].to_file(
                output_dir / "librimix_recordings_noise.jsonl.gz")
            manifests["noise"]["supervisions"].to_file(
                output_dir / "librimix_supervisions_noise.jsonl.gz")
    return manifests
