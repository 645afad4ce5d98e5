"""
TED-LIUM release 2 (OpenSLR 19): TED talks (SPH audio, STM transcripts) in
train/dev/test splits.  Shares the STM parsing and text normalization with
the TED-LIUM v3 recipe.

Functional parity target: ``lhotse/recipes/tedlium2.py``.
"""
import logging
import shutil
import tarfile
from concurrent.futures.thread import ThreadPoolExecutor
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes.tedlium import _parse_stm_file
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

TEDLIUM2_PARTS = ("train", "dev", "test")


def download_tedlium2(target_dir: Pathlike = ".", force_download: Optional[bool] = False) -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "TEDLIUM_release2"
    marker = corpus_dir / ".completed"
    if marker.is_file():
        logging.info(f"Skipping TEDLIUM_release2 because {marker} exists.")
        return corpus_dir
    archive = target_dir / "TEDLIUM_release2.tar.gz"
    resumable_download(
        "http://www.openslr.org/resources/19/TEDLIUM_release2.tar.gz", filename=archive,
        force_download=force_download)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    with tarfile.open(archive) as tar:
        safe_extract(tar, path=target_dir)
    marker.touch()
    return corpus_dir


def prepare_tedlium2(
    tedlium_root: Pathlike, output_dir: Optional[Pathlike] = None,
    dataset_parts: Union[str, Sequence[str]] = TEDLIUM2_PARTS, num_jobs: int = 1,
    normalize_text: str = "none") -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Per-split TED-LIUM v2 manifests (sph audio + parsed STM segments)."""
    tedlium_root = Path(tedlium_root)
    if isinstance(dataset_parts, str):
        dataset_parts = [dataset_parts]
    parse = partial(_parse_stm_file, normalize_text=normalize_text)

    corpus = {}
    with ThreadPoolExecutor(num_jobs) as pool:
        for split in dataset_parts:
            logging.info(f"Processing {split} split...")
            root = tedlium_root / split
            recordings = RecordingSet.from_dir(root / "sph", pattern="*.sph", num_jobs=num_jobs)
            stms = sorted((root / "stm").glob("*.stm"))
            if len(stms) != len(recordings):
                raise AssertionError(
                    f"Mismatch: found {len(recordings)} sphere files and "
                    f"{len(stms)} STM files. You might be missing some parts "
                    f"of TEDLIUM..."
                )
            segments = []
            for result in pool.map(parse, stms):
                segments.extend(result)
            corpus[split] = finalize_manifests(
                recordings, segments, output_dir=output_dir, prefix="tedlium2", part=split)
    return corpus
