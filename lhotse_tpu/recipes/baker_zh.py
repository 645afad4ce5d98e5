"""
Baker Chinese TTS corpus (BZNSYP) — 12 h of a single female Mandarin voice
with prosody-annotated transcripts and pinyin.

Reference behavior: `/root/reference/lhotse/recipes/baker_zh.py`
(download_baker_zh :20-42, prepare_baker_zh :45-113 — transcript pairs of
lines in ProsodyLabeling/000001-010000.txt; prosody `#N` marks stripped into
``normalized_text``, pinyin kept in custom).
"""
import logging
import re
import shutil
import tarfile
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

_URL = "https://huggingface.co/openspeech/BZNSYP/resolve/main/BZNSYP.tar.bz2"
_PROSODY_MARKS = re.compile("#[12345]")


def download_baker_zh(
    target_dir: Pathlike = ".", force_download: Optional[bool] = False) -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "BZNSYP"
    marker = corpus_dir / ".completed"
    if marker.is_file():
        logging.info(f"Skipping BZNSYP download: {marker} exists.")
        return corpus_dir
    tar_path = target_dir / "BZNSYP.tar.bz2"
    resumable_download(_URL, filename=tar_path, force_download=force_download)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    with tarfile.open(tar_path) as tar:
        safe_extract(tar, path=target_dir)
    marker.touch()
    return corpus_dir


def _iter_label_pairs(labeling_file: Path):
    """The prosody file alternates (id + text) and pinyin lines."""
    lines = [ln.strip() for ln in labeling_file.read_text(encoding="utf-8").splitlines()]
    for text_line, pinyin in zip(lines[0::2], lines[1::2]):
        recording_id, original_text = text_line.split(None, maxsplit=1)
        yield recording_id, original_text, pinyin


def prepare_baker_zh(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """Build the single-part (``all``) manifests off the BZNSYP tree."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    labeling_file = corpus_dir / "ProsodyLabeling" / "000001-010000.txt"
    if not labeling_file.is_file():
        raise ValueError(f"{labeling_file} does not exist")

    recordings, supervisions = [], []
    for recording_id, original_text, pinyin in _iter_label_pairs(labeling_file):
        audio_path = corpus_dir / "Wave" / f"{recording_id}.wav"
        if not audio_path.is_file():
            logging.warning(f"No such file: {audio_path}")
            continue
        recording = Recording.from_file(audio_path)
        recordings.append(recording)
        supervisions.append(
            SupervisionSegment(
                id=recording_id, recording_id=recording_id, start=0.0,
                duration=recording.duration, channel=0, language="Chinese", gender="female",
                text=original_text,
                custom={
                    "pinyin": pinyin,
                    "normalized_text": _PROSODY_MARKS.sub("", original_text)}))
    return finalize_manifests(
        recordings, supervisions, output_dir=output_dir, prefix="baker_zh", part="all")
