"""
LJ Speech recipe — 24h single-female-speaker TTS corpus (public domain),
13,100 clips with original + normalized transcripts in ``metadata.csv``.

Reference behavior: `/root/reference/lhotse/recipes/ljspeech.py:27-127`
(tar.bz2 download from keithito.com; pipe-separated metadata rows
``id|text|normalized``; normalized text stored under
``custom["normalized_text"]``; single "all" split).
"""
import logging
import re
import shutil
import tarfile
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, fastcopy, resumable_download, safe_extract


def download_ljspeech(target_dir: Pathlike = ".", force_download: Optional[bool] = False) -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    dataset_name = "LJSpeech-1.1"
    corpus_dir = target_dir / dataset_name
    completed_detector = corpus_dir / ".completed"
    if completed_detector.is_file():
        logging.info(f"Skipping {dataset_name}: {completed_detector} exists.")
        return corpus_dir
    tar_path = target_dir / f"{dataset_name}.tar.bz2"
    resumable_download(
        f"http://data.keithito.com/data/speech/{dataset_name}.tar.bz2", filename=tar_path,
        force_download=force_download)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    with tarfile.open(tar_path) as tar:
        safe_extract(tar, path=target_dir)
    completed_detector.touch()
    return corpus_dir


def prepare_ljspeech(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """One "all" split: {"recordings": ..., "supervisions": ...}."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)

    metadata_csv_path = corpus_dir / "metadata.csv"
    assert metadata_csv_path.is_file(), f"No such file: {metadata_csv_path}"
    recordings, supervisions = [], []
    with open(metadata_csv_path) as f:
        for line in f:
            recording_id, text, normalized = line.strip().split("|")
            audio_path = corpus_dir / "wavs" / f"{recording_id}.wav"
            if not audio_path.is_file():
                logging.warning(f"No such file: {audio_path}")
                continue
            recording = Recording.from_file(audio_path)
            recordings.append(recording)
            supervisions.append(
                SupervisionSegment(
                    id=recording_id,
                    recording_id=recording_id,
                    start=0.0,
                    duration=recording.duration,
                    channel=0,
                    language="English",
                    gender="female",
                    text=text,
                    custom={"normalized_text": normalized.strip()},
                )
            )
    recording_set, supervision_set = fix_manifests(
        RecordingSet.from_recordings(recordings), SupervisionSet.from_segments(supervisions))
    validate_recordings_and_supervisions(recording_set, supervision_set)
    if output_dir is not None:
        recording_set.to_file(output_dir / "ljspeech_recordings_all.jsonl.gz")
        supervision_set.to_file(output_dir / "ljspeech_supervisions_all.jsonl.gz")
    return {"recordings": recording_set, "supervisions": supervision_set}


def text_normalizer(segment: SupervisionSegment) -> SupervisionSegment:
    """Uppercase + strip punctuation from both text fields (the reference's
    TTS-prep helper, ljspeech.py:120-127)."""
    text = re.sub(r"[^\w !?]", "", segment.text.upper())
    normalized = re.sub(r"[^\w !?]", "", segment.custom["normalized_text"].upper())
    return fastcopy(segment, text=text, custom={"normalized_text": normalized})
