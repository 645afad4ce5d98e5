"""
Mozilla CommonVoice recipe — crowd-sourced multilingual read speech (MP3
clips + per-split TSV metadata).

Reference behavior: `/root/reference/lhotse/recipes/commonvoice.py:49-336`
(download_commonvoice :49-116, _parse_utterance :148-178, _prepare_part
:181-239, prepare_commonvoice :242-336 — one tar per language; per-language
``{split}.tsv`` with client_id/path/sentence/age/gender/accents columns,
clips under ``clips/``).
"""
import csv
import logging
import shutil
import tarfile
from collections import defaultdict
from concurrent.futures.thread import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterable, Optional, Sequence, Tuple, Union

from lhotse_tpu import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.serialization import load_manifest
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

DEFAULT_COMMONVOICE_URL = (
    "https://mozilla-common-voice-datasets.s3.dualstack.us-west-2.amazonaws.com"
)
DEFAULT_COMMONVOICE_RELEASE = "cv-corpus-13.0-2023-03-09"

COMMONVOICE_LANGS = (
    "en de fr cy tt kab ca zh-TW it fa eu es ru tr nl eo zh-CN rw pt zh-HK "
    "cs pl uk"
).split()
COMMONVOICE_SPLITS = ("train", "dev", "test", "validated", "invalidated", "other")
COMMONVOICE_DEFAULT_SPLITS = ("test", "dev", "train")


def download_commonvoice(
    target_dir: Pathlike = ".", languages: Union[str, Iterable[str]] = "all",
    force_download: bool = False, base_url: str = DEFAULT_COMMONVOICE_URL,
    release: str = DEFAULT_COMMONVOICE_RELEASE) -> Path:
    """Download and untar per-language CommonVoice archives (release >= 8.0;
    earlier releases require a manual e-mail-gated download)."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    if languages == "all":
        languages = COMMONVOICE_LANGS
    elif isinstance(languages, str):
        languages = [languages]
    if float(release.split("-")[2]) < 8.0:
        raise NotImplementedError(
            "CommonVoice releases before 8.0 require an e-mail-gated manual "
            "download; please fetch them yourself or pick a newer release."
        )
    for lang in languages:
        part_dir = target_dir / release / lang
        completed_detector = part_dir / ".completed"
        if completed_detector.is_file():
            logging.info(f"Skipping {lang} because {completed_detector} exists.")
            continue
        tar_path = target_dir / f"{lang}.tar.gz"
        resumable_download(
            f"{base_url}/{release}/{release}-{lang}.tar.gz", filename=tar_path,
            force_download=force_download)
        shutil.rmtree(part_dir, ignore_errors=True)
        with tarfile.open(tar_path) as tar:
            safe_extract(tar, path=target_dir)
        completed_detector.touch()
    return target_dir / release


def _parse_utterance(
    lang_path: Path, language: str, audio_info: Dict[str, str],
) -> Optional[Tuple[Recording, SupervisionSegment]]:
    audio_path = lang_path / "clips" / audio_info["path"]
    if not audio_path.is_file():
        logging.info(f"No such file: {audio_path}")
        return None
    recording_id = Path(audio_info["path"]).stem
    recording = Recording.from_file(path=audio_path, recording_id=recording_id)
    segment = SupervisionSegment(
        id=recording_id, recording_id=recording_id, start=0.0, duration=recording.duration,
        channel=0, language=language, speaker=audio_info.get("client_id"),
        text=(audio_info.get("sentence") or "").strip(), gender=audio_info.get("gender"),
        custom={ "age": audio_info.get("age"), "accents": audio_info.get("accents"), "variant": audio_info.get("variant"), },
    )
    return recording, segment


def _prepare_part(
    lang: str, part: str, lang_path: Pathlike, num_jobs: int = 1,
) -> Tuple[RecordingSet, SupervisionSet]:
    """One split of one language: read {part}.tsv, probe the referenced clips."""
    lang_path = Path(lang_path)
    tsv_path = lang_path / f"{part}.tsv"
    with open(tsv_path) as f:
        # QUOTE_NONE: the CV TSVs contain unbalanced quotes.
        rows = list(csv.DictReader(f, delimiter="\t", quoting=csv.QUOTE_NONE))
    recordings, supervisions = [], []
    with ThreadPoolExecutor(num_jobs) as ex:
        for result in ex.map(lambda row: _parse_utterance(lang_path, lang, row), rows):
            if result is None:
                continue
            recordings.append(result[0])
            supervisions.append(result[1])
    return (RecordingSet.from_recordings(recordings), SupervisionSet.from_segments(supervisions))


def prepare_commonvoice(
    corpus_dir: Pathlike, output_dir: Pathlike, languages: Union[str, Sequence[str]] = "auto",
    splits: Union[str, Sequence[str]] = COMMONVOICE_DEFAULT_SPLITS, num_jobs: int = 1,
) -> Dict[str, Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]]:
    """
    Prepare manifests: ``result[language][split] = {recordings, supervisions}``.

    :param corpus_dir: the release directory (contains per-language dirs).
    :param languages: "auto" scans the corpus dir; else code(s) like "en".
    """
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    if isinstance(splits, str):
        splits = [splits]
    if languages == "auto":
        languages = sorted(
            d.name for d in corpus_dir.iterdir() if d.is_dir() and (d / "clips").is_dir()
        )
    elif isinstance(languages, str):
        languages = [languages]

    manifests = defaultdict(dict)
    for lang in languages:
        logging.info(f"Processing CommonVoice language: {lang}")
        lang_path = corpus_dir / lang
        for part in splits:
            rec_path = output_dir / f"cv_recordings_{lang}_{part}.jsonl.gz"
            sup_path = output_dir / f"cv_supervisions_{lang}_{part}.jsonl.gz"
            if rec_path.is_file() and sup_path.is_file():
                logging.info(f"Skipping {lang}/{part} - already prepared.")
                manifests[lang][part] = {
                    "recordings": load_manifest(rec_path), "supervisions": load_manifest(sup_path)}
                continue
            recordings, supervisions = _prepare_part(lang, part, lang_path, num_jobs=num_jobs)
            recordings, supervisions = fix_manifests(recordings, supervisions)
            validate_recordings_and_supervisions(recordings, supervisions)
            recordings.to_file(rec_path)
            supervisions.to_file(sup_path)
            manifests[lang][part] = {"recordings": recordings, "supervisions": supervisions}
    return dict(manifests)
