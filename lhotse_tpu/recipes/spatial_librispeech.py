"""
Spatial LibriSpeech — Apple's ambisonics re-render of LibriSpeech with a
parquet metadata table (per-sample transcription/reader/acoustics).

Reference behavior: `/root/reference/lhotse/recipes/spatial_librispeech.py`
(download_spatial_librispeech :51-135 — metadata.parquet + per-sample flac
fetch into audio_files/{split}/; prepare_spatial_librispeech :137-229 —
supervisions from the LibriSpeech columns of the parquet, optional
lower-casing).
"""
import logging
from concurrent.futures.thread import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, is_module_available, resumable_download

SPATIAL_LIBRISPEECH = ("train", "test")
BASE_URL = (
    "https://docs-assets.developer.apple.com/ml-research/datasets/spatial-librispeech/v1")
META_DATA_URL = f"{BASE_URL}/metadata.parquet"


def _require_pandas():
    if not is_module_available("pandas"):
        raise ImportError(
            "The Spatial LibriSpeech recipe requires pandas + pyarrow to parse the "
            "parquet metadata. Install them with: pip install pandas pyarrow")
    import pandas as pd

    return pd


def _resolve_parts(dataset_parts) -> Sequence[str]:
    if dataset_parts == "all":
        return SPATIAL_LIBRISPEECH
    parts = [dataset_parts] if isinstance(dataset_parts, str) else list(dataset_parts)
    for part in parts:
        assert part in SPATIAL_LIBRISPEECH, f"Unknown dataset part: {part}"
    return parts


def _fetch_audio(target_file: Path, url: str) -> None:
    if not is_module_available("requests"):
        raise ImportError(
            "The Spatial LibriSpeech recipe requires requests to download the "
            "dataset: pip install requests")
    import requests

    target_file.write_bytes(requests.get(url, allow_redirects=True).content)


def download_spatial_librispeech(
    target_dir: Pathlike = ".", dataset_parts: Union[str, Sequence[str]] = SPATIAL_LIBRISPEECH,
    force_download: bool = False, base_url: str = BASE_URL, num_jobs: int = 1) -> Path:
    """Fetch metadata.parquet and each sample's ambisonics flac."""
    pd = _require_pandas()
    dataset_parts = _resolve_parts(dataset_parts)
    corpus_dir = Path(target_dir) / "Spatial-LibriSpeech"
    corpus_dir.mkdir(parents=True, exist_ok=True)
    marker = corpus_dir / ".completed"
    if marker.is_file():
        logging.info(f"Skipping download, found {marker}.")
        return corpus_dir
    metadata_path = corpus_dir / "metadata.parquet"
    if not metadata_path.is_file() or force_download:
        resumable_download(META_DATA_URL, metadata_path, force_download=force_download)
    metadata = pd.read_parquet(metadata_path)

    audio_root = corpus_dir / "audio_files"
    for part in dataset_parts:
        (audio_root / part).mkdir(parents=True, exist_ok=True)
    with ThreadPoolExecutor(num_jobs) as pool:
        for sample_id, split in zip(metadata["sample_id"], metadata["split"]):
            if split not in dataset_parts:
                continue
            recording_path = audio_root / split / f"{sample_id:06}.flac"
            if not recording_path.exists() or force_download:
                pool.submit(
                    _fetch_audio, recording_path, f"{base_url}/ambisonics/{sample_id:06}.flac")
    marker.touch()
    return corpus_dir


def prepare_spatial_librispeech(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
    dataset_parts: Union[str, Sequence[str]] = SPATIAL_LIBRISPEECH,
    normalize_text: str = "none", num_jobs: int = 1,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """train/test manifests off the ambisonics flacs + parquet metadata."""
    pd = _require_pandas()
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    output_dir = Path(output_dir) if output_dir is not None else corpus_dir
    output_dir.mkdir(parents=True, exist_ok=True)
    dataset_parts = _resolve_parts(dataset_parts)
    metadata_path = corpus_dir / "metadata.parquet"
    assert metadata_path.is_file(), f"{metadata_path} not found"
    metadata = pd.read_parquet(metadata_path)

    manifests = {}
    for part in dataset_parts:
        logging.info(f"Processing {part} split...")
        recording_set = RecordingSet.from_dir(
            corpus_dir / "audio_files" / part, pattern="*.flac", num_jobs=num_jobs,
            recording_id=lambda x: x.stem)
        supervisions = []
        for _, row in metadata[metadata["split"] == part].iterrows():
            recording_id = f"{row['sample_id']:06}"
            recording = recording_set[recording_id]
            text = row["speech/librispeech_metadata/transcription"]
            if normalize_text == "lower":
                text = text.lower()
            supervisions.append(
                SupervisionSegment(
                    id=recording_id, recording_id=recording_id, start=0,
                    duration=recording.duration, channel=recording.channel_ids,
                    text=text, gender=row["speech/librispeech_metadata/reader_sex"],
                    speaker=row["speech/librispeech_metadata/reader_id"]))
        manifests[part] = finalize_manifests(
            recording_set, supervisions, output_dir=output_dir,
            prefix="spatial-librispeech", part=part)
    return manifests
