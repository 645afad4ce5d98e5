"""
YesNo corpus recipe (openslr/1) — 60 8 kHz wavs of 8 Hebrew yes/no words,
transcript encoded in the filename (0=no, 1=yes).

Reference behavior: `/root/reference/lhotse/recipes/yesno.py`
(download_yesno :42-76, prepare_yesno :116-163 — sorted files alternate
between train (even indices) and test (odd indices)).
"""
import logging
import shutil
import tarfile
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

from lhotse_tpu import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

_DEFAULT_URL = "http://www.openslr.org/resources/1/waves_yesno.tar.gz"

_WORD_MAP = {"0": "NO", "1": "YES"}


def download_yesno(
    target_dir: Pathlike = ".", force_download: Optional[bool] = False,
    url: Optional[str] = _DEFAULT_URL) -> Path:
    """Download and untar the corpus; returns the waves_yesno directory."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    extracted_dir = target_dir / "waves_yesno"
    completed_detector = extracted_dir / ".completed"
    if completed_detector.is_file():
        logging.info(f"Skipping - {completed_detector} exists.")
        return extracted_dir
    tar_path = target_dir / "waves_yesno.tar.gz"
    resumable_download(url, filename=tar_path, force_download=force_download)
    shutil.rmtree(extracted_dir, ignore_errors=True)
    with tarfile.open(tar_path) as tar:
        safe_extract(tar, path=target_dir)
    completed_detector.touch()
    return extracted_dir


def _make_manifests(wavs: List[Path],) -> Tuple[RecordingSet, SupervisionSet]:
    recordings, supervisions = [], []
    for audio_path in wavs:
        words = audio_path.stem.split("_")
        assert len(words) == 8 and set(words) <= {"0", "1"}, (
            f"Unexpected yesno filename: {audio_path.name}"
        )
        recording = Recording.from_file(audio_path.absolute())
        recordings.append(recording)
        supervisions.append(
            SupervisionSegment(
                id=audio_path.stem,
                recording_id=audio_path.stem,
                start=0.0,
                duration=recording.duration,
                channel=0,
                language="Hebrew",
                text=" ".join(_WORD_MAP[w] for w in words),
            )
        )
    rs, ss = fix_manifests(
        RecordingSet.from_recordings(recordings), SupervisionSet.from_segments(supervisions))
    validate_recordings_and_supervisions(rs, ss)
    return rs, ss


def prepare_yesno(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """
    Prepare train/test manifests: the sorted wavs alternate between the
    splits — even indices train, odd indices test (reference
    recipes/yesno.py:141-143 semantics, 30/30 on the real 60-file corpus).
    """
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    wavs = sorted(corpus_dir.glob("*.wav"))
    splits = {"train": wavs[::2], "test": wavs[1::2]}

    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)

    manifests = {}
    for part, files in splits.items():
        if not files:
            continue
        recordings, supervisions = _make_manifests(files)
        if output_dir is not None:
            recordings.to_file(output_dir / f"yesno_recordings_{part}.jsonl.gz")
            supervisions.to_file(output_dir / f"yesno_supervisions_{part}.jsonl.gz")
        manifests[part] = {"recordings": recordings, "supervisions": supervisions}
    return manifests
