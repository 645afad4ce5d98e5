"""
WHAM! noise corpus: ambient noise recordings (restaurants, bars, parks) used
to contaminate wsj0-2mix into WHAM/WHAMR source-separation data.

Layout: ``wham_noise/{tr,cv,tt}/*.wav``.  Functional parity target:
``lhotse/recipes/wham.py`` (recording manifests only; there is no text).
"""
import logging
from pathlib import Path
from typing import Dict, Optional, Union
from zipfile import ZipFile

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.qa import validate
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download

WHAM_URL = "https://storage.googleapis.com/whisper-public/wham_noise.zip"


def download_wham(
    target_dir: Pathlike = ".", url: Optional[str] = WHAM_URL,
    force_download: Optional[bool] = False) -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "wham_noise"
    marker = target_dir / ".wham_noise_completed"
    if marker.is_file():
        logging.info(f"Skipping wham_noise.zip because {marker} exists.")
        return corpus_dir
    zip_path = target_dir / "wham_noise.zip"
    resumable_download(url, filename=zip_path, force_download=force_download)
    logging.info("Extracting files...")
    with ZipFile(zip_path) as zf:
        zf.extractall(path=target_dir)
    marker.touch()
    return corpus_dir


def prepare_wham(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Per-split (tr/cv/tt) WHAM! noise recording manifests."""
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")
    manifests = {}
    for split in ("tr", "cv", "tt"):
        logging.info(f"Scanning {split} split...")
        recordings = RecordingSet.from_recordings(
            Recording.from_file(w) for w in (corpus_dir / split).rglob("*.wav")
        )
        validate(recordings)
        manifests[split] = {"recordings": recordings}
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        for split, entry in manifests.items():
            for key, manifest in entry.items():
                manifest.to_file(output_dir / f"wham_{key}_{split}.jsonl.gz")
    return manifests
