"""
Earnings-21: 44 long-form earnings calls (~39 h) with rich NLP-format
transcripts, from the rev.com speech-datasets repository.

Layout (functional parity target: ``lhotse/recipes/earnings21.py``)::

    earnings21/
      media/*.mp3
      transcripts/nlp_references/*.nlp   # token|...| rows, header first
"""
import logging
import shutil
import string
import zipfile
from pathlib import Path
from typing import Optional, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.qa import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download

_DEFAULT_URL = ("https://codeload.github.com/revdotcom/speech-datasets/zip/refs/heads/main")


def normalize(text: str) -> str:
    """Strip punctuation and lowercase."""
    return text.translate(str.maketrans("", "", string.punctuation)).lower()


def parse_nlp_file(filename: Pathlike):
    """First (token) column of an .nlp file, header skipped."""
    rows = Path(filename).read_text().splitlines()
    return [row.split("|")[0] for row in rows[1:] if row]


def download_earnings21(
    target_dir: Pathlike = ".", force_download: Optional[bool] = False,
    url: Optional[str] = _DEFAULT_URL) -> Path:
    """Fetch the whole speech-datasets repo zip and keep only earnings21."""
    logging.info(
        "Downloading Earnings21 via the github repository zip downloads the "
        "sibling datasets too; expect extra transfer."
    )
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    extracted = target_dir / "earnings21"
    marker = extracted / ".lhotse-download.completed"
    if marker.is_file():
        logging.info(f"Skipping - {marker} exists.")
        return extracted
    zip_path = target_dir / "speech-datasets-main.zip"
    resumable_download(url, filename=zip_path, force_download=force_download)
    shutil.rmtree(extracted, ignore_errors=True)
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            if "earnings21" in member:
                zf.extract(member, path=target_dir)
    shutil.move(str(target_dir / "speech-datasets-main" / "earnings21"), str(target_dir))
    shutil.rmtree(target_dir / "speech-datasets-main")
    marker.touch()
    return extracted


def prepare_earnings21(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None, normalize_text: bool = False,
) -> Union[RecordingSet, SupervisionSet]:
    """
    Earnings-21 manifests: one whole-call supervision per mp3.

    .. caution:: ``normalize_text=True`` removes all punctuation and
        lowercases the transcript.
    """
    corpus_dir = Path(corpus_dir)
    recordings = RecordingSet.from_recordings(
        Recording.from_file(p) for p in sorted((corpus_dir / "media").glob("*.mp3"))
    )
    nlp_files = sorted((corpus_dir / "transcripts" / "nlp_references").glob("*.nlp"))
    supervisions = []
    for nlp in nlp_files:
        text = " ".join(parse_nlp_file(nlp))
        supervisions.append(
            SupervisionSegment(
                id=nlp.stem,
                recording_id=nlp.stem,
                start=0.0,
                duration=recordings[nlp.stem].duration,
                channel=0,
                language="English",
                text=normalize(text) if normalize_text else text,
            )
        )
    supervisions = SupervisionSet.from_segments(supervisions)
    recordings, supervisions = fix_manifests(recordings, supervisions)
    validate_recordings_and_supervisions(recordings, supervisions)
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        supervisions.to_file(output_dir / "earnings21_supervisions_all.jsonl.gz")
        recordings.to_file(output_dir / "earnings21_recordings_all.jsonl.gz")
    return recordings, supervisions
