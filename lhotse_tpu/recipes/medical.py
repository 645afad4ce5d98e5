"""
Medical conversations — 272 simulated patient-physician interviews (mp3 +
transcripts), split via per-subset ``medical_{part}.info`` segment lists
(https://www.nature.com/articles/s41597-022-01423-1.pdf).

Reference behavior: `/root/reference/lhotse/recipes/medical.py`
(download_medical :33-62 off the HF mirror; _parse_utterance :64-90 — info
rows are ``audio/<file>.mp3,start[end,text]``; prepare_medical :118-160).
"""
import logging
import shutil
import tarfile
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import (
    finalize_manifests, manifests_exist, read_manifests_if_cached)
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download

MEDICAL = ("test", "dev", "train")
MEDICAL_SPLITS = (
    "audio.tar.gz", "cleantext.tar.gz", "medical_test.info", "medical_dev.info",
    "medical_train.info")
MEDICAL_BASE_URL = "https://huggingface.co/datasets/yfyeung/medical/resolve/main/"


def download_medical(target_dir: Pathlike = ".", force_download: bool = False) -> Path:
    """Fetch the audio/text tarballs + split lists off the HF mirror."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    for part in MEDICAL_SPLITS:
        logging.info(f"Downloading part: {part}")
        part_path = target_dir / part
        resumable_download(
            MEDICAL_BASE_URL + part, filename=part_path, force_download=force_download)
        if "tar.gz" in part:
            shutil.rmtree(str(part_path).replace(".tar.gz", ""), ignore_errors=True)
            with tarfile.open(part_path) as tar:
                tar.extractall(target_dir)
    return target_dir


def _parse_utterance(
    corpus_dir: Path, audio_info: str) -> Optional[Tuple[Recording, SupervisionSegment]]:
    # rows look like: audio/RES0001.mp3,12.3[45.6,some transcript text]
    audio_path, start, end, text = (
        audio_info.replace(",", "\t").replace("[", "\t").replace("]", "").split("\t"))
    file_name = audio_path.replace(".mp3", "").replace("audio/", "")
    audio_path = (corpus_dir / audio_path).resolve()
    if not audio_path.is_file():
        logging.warning(f"No such file: {audio_path}")
        return None
    recording = Recording.from_file(path=audio_path, recording_id=file_name)
    segment = SupervisionSegment(
        id=f"{file_name}_{hash(audio_info)}", recording_id=file_name,
        start=float(start), duration=float(end) - float(start), channel=0,
        language="English", text=text)
    return recording, segment


def prepare_medical(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None, num_jobs: int = 1,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """test/dev/train manifests off the ``medical_{part}.info`` lists."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    manifests = read_manifests_if_cached(
        dataset_parts=MEDICAL, output_dir=output_dir, prefix="medical") or {}
    for part in MEDICAL:
        if manifests_exist(part=part, output_dir=output_dir, prefix="medical"):
            logging.info(f"Medical subset: {part} already prepared - skipping.")
            continue
        logging.info(f"Preparing Medical subset: {part}")
        rows = (corpus_dir / f"medical_{part}.info").read_text().splitlines()
        recordings, supervisions = {}, []
        for row in rows:
            parsed = _parse_utterance(corpus_dir, row)
            if parsed is None:
                continue
            recording, segment = parsed
            recordings.setdefault(recording.id, recording)
            supervisions.append(segment)
        manifests[part] = finalize_manifests(
            list(recordings.values()), supervisions, output_dir=output_dir,
            prefix="medical", part=part)
    return manifests
