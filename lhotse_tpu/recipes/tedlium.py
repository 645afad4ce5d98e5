"""
TED-LIUM v3 recipe (openslr/51) — TED talks in SPHERE audio with STM
transcripts (legacy train/dev/test repartition).

Reference behavior: `/root/reference/lhotse/recipes/tedlium.py`
(download_tedlium :66-87, prepare_tedlium :90-159, STM parsing :162-196 —
``ignore_time_segment_in_scoring`` lines dropped, ``{NOISE}`` mapped to
``[NOISE]``) and the Kaldi-style text normalization from
`recipes/utils.py:183-204`.
"""
import logging
import re
import shutil
import tarfile
from concurrent.futures.thread import ThreadPoolExecutor
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

from lhotse_tpu import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

TEDLIUM_PARTS = ("train", "dev", "test")


def normalize_text_tedlium(text: str, normalize: str = "upper") -> str:
    """Kaldi-TEDLIUM-style text normalization (none / upper / kaldi)."""
    if normalize == "none":
        return text
    if normalize == "upper":
        return text.upper()
    if normalize == "kaldi":
        text = re.sub(r"\[[^\]]+\]", "", text)  # [NOISE] etc.
        text = re.sub(r"<unk>", "", text)
        text = re.sub(r"(\w+) '(\w+)", r"\1'\2", text)  # they 're -> they're
        text = re.sub(r"' (\w+)", r"'\1", text)  # ' cause -> 'cause
        return text.strip()
    raise ValueError(f"Unknown text normalization: {normalize}")


def download_tedlium(target_dir: Pathlike = ".", force_download: Optional[bool] = False) -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "TEDLIUM_release-3"
    completed_detector = corpus_dir / ".completed"
    if completed_detector.is_file():
        logging.info(f"Skipping download: {completed_detector} exists.")
        return corpus_dir
    tar_path = target_dir / "TEDLIUM_release-3.tgz"
    resumable_download(
        "http://www.openslr.org/resources/51/TEDLIUM_release-3.tgz", filename=tar_path,
        force_download=force_download)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    with tarfile.open(tar_path) as tar:
        safe_extract(tar, path=target_dir)
    completed_detector.touch()
    return corpus_dir


def _parse_stm_file(stm: Path, normalize_text: str = "none") -> List[SupervisionSegment]:
    segments = []
    with stm.open() as f:
        for idx, line in enumerate(f):
            rec_id, _, _, start, end, _, *words = line.split()
            start, end = float(start), float(end)
            text = " ".join(words).replace("{NOISE}", "[NOISE]")
            if text == "ignore_time_segment_in_scoring":
                continue
            segments.append(
                SupervisionSegment(
                    id=f"{rec_id}-{idx}",
                    recording_id=rec_id,
                    start=start,
                    duration=round(end - start, ndigits=8),
                    channel=0,
                    text=normalize_text_tedlium(text, normalize_text),
                    language="English",
                    speaker=rec_id,
                )
            )
    return segments


def prepare_tedlium(
    tedlium_root: Pathlike, output_dir: Optional[Pathlike] = None,
    dataset_parts: Union[str, Sequence[str]] = TEDLIUM_PARTS, num_jobs: int = 1,
    normalize_text: str = "none") -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Prepare train/dev/test manifests from the legacy TED-LIUM 3 layout."""
    tedlium_root = Path(tedlium_root)
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
    if isinstance(dataset_parts, str):
        dataset_parts = [dataset_parts]

    corpus = {}
    with ThreadPoolExecutor(num_jobs) as ex:
        for split in dataset_parts:
            logging.info(f"Processing {split} split...")
            root = tedlium_root / "legacy" / split
            recordings = RecordingSet.from_dir(root / "sph", pattern="*.sph", num_jobs=num_jobs)
            stms = sorted((root / "stm").glob("*.stm"))
            assert len(stms) == len(recordings), (
                f"Mismatch: found {len(recordings)} sphere files and "
                f"{len(stms)} STM files. You might be missing some parts "
                f"of TEDLIUM..."
            )
            worker = partial(_parse_stm_file, normalize_text=normalize_text)
            segments = []
            for result in ex.map(worker, stms):
                segments.extend(result)
            supervisions = SupervisionSet.from_segments(segments)
            recordings, supervisions = fix_manifests(recordings, supervisions)
            corpus[split] = {"recordings": recordings, "supervisions": supervisions}
            validate_recordings_and_supervisions(**corpus[split])
            if output_dir is not None:
                recordings.to_file(output_dir / f"tedlium_recordings_{split}.jsonl.gz")
                supervisions.to_file(output_dir / f"tedlium_supervisions_{split}.jsonl.gz")
    return corpus
