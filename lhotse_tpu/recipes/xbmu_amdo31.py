"""
XBMU-AMDO31 — 31 h open-source Amdo Tibetan ASR corpus from Northwest Minzu
University (https://huggingface.co/datasets/syzym/xbmu_amdo31).

Reference behavior: `/root/reference/lhotse/recipes/xbmu_amdo31.py`
(download_xbmu_amdo31 :44-91 — git clone + untar of data/wav/{part}.tar.gz;
prepare_xbmu_amdo31 :94-173 — transcript_clean.txt keyed by the utt-id after
the speaker prefix, supervision id = running count + utt id, recording id =
``speaker-uttid``, language "tibetan").
"""
import logging
import shutil
import tarfile
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, is_module_available, safe_extract

_URL = "https://huggingface.co/datasets/syzym/xbmu_amdo31"


def download_xbmu_amdo31(target_dir: Pathlike = ".") -> Path:
    """Clone the HF dataset repo and untar the per-split wav archives."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "xbmu_amdo31"
    wav_dir = corpus_dir / "data" / "wav"

    if not corpus_dir.exists():
        if not is_module_available("git"):
            raise ImportError(
                "In order to download the xbmu-amdo31 corpus from huggingface, "
                "please install the relevant dependencies: pip install gitpython"
            )
        from git import Repo

        logging.info("Start downloading the xbmu-amdo31 corpus")
        Repo.clone_from(_URL, corpus_dir)
        logging.info("Done")

    for part in ("train", "dev", "test"):
        extracted_dir = wav_dir / part
        marker = extracted_dir / ".completed"
        if marker.is_file():
            logging.info(f"Skipping untar of {part}: {marker} exists.")
            continue
        shutil.rmtree(extracted_dir, ignore_errors=True)
        with tarfile.open(wav_dir / f"{part}.tar.gz") as tar:
            safe_extract(tar, path=wav_dir)
        marker.touch()
    return corpus_dir


def prepare_xbmu_amdo31(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Build train/dev/test manifests off the cloned+extracted tree."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"

    transcripts = {}
    with open(corpus_dir / "data/transcript/transcript_clean.txt", encoding="utf-8") as f:
        for line in f:
            fields = line.split()
            if fields:
                transcripts[fields[0]] = " ".join(fields[1:])

    manifests = {}
    for part in ("train", "dev", "test"):
        logging.info(f"Processing xbmu_amdo31 subset: {part}")
        recordings, supervisions = [], []
        for count, audio_path in enumerate(
                sorted((corpus_dir / "data" / "wav" / part).rglob("**/*.wav")), start=1):
            # file names look like <speaker>-<uttid>.wav
            idx = audio_path.stem.split("-")[1]
            speaker = audio_path.parts[-2]
            if idx not in transcripts:
                logging.warning(f"{audio_path} has no transcript.")
                continue
            recording = Recording.from_file(audio_path)
            recordings.append(recording)
            supervisions.append(
                SupervisionSegment(
                    id=f"{count}_{idx}", recording_id=f"{speaker}-{idx}", start=0.0,
                    duration=recording.duration, channel=0, language="tibetan",
                    speaker=speaker, text=transcripts[idx].strip()))
        manifests[part] = finalize_manifests(
            recordings, supervisions, output_dir=output_dir, prefix="xbmu_amdo31", part=part)
    return manifests
