"""
VoxPopuli: European Parliament speech in 23 languages. We prepare the ASR
subset from the released full-session OGG audio plus the per-language
annotation TSV (segment timestamps inside the sessions) — segment wavs are
never materialized.

Layout (functional parity target: ``lhotse/recipes/voxpopuli.py``)::

    raw_audios/<lang>/<year>/<session>_<lang>.ogg          # asr subset: lang="original"
    (annotations fetched to output_dir as asr_<lang>.tsv.gz)
"""
import csv
import gzip
import logging
import re
import tarfile
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.qa import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

LANGUAGES = (
    "en", "de", "fr", "es", "pl", "it", "ro", "hu", "cs", "nl", "fi", "hr", "sk", "sl", "et", "lt",
    "pt", "bg", "el", "lv", "mt", "sv", "da")
LANGUAGES_V2 = tuple(f"{x}_v2" for x in LANGUAGES)
YEARS = tuple(range(2009, 2021))
ASR_LANGUAGES = (
    "en", "de", "fr", "es", "pl", "it", "ro", "hu", "cs", "nl", "fi", "hr", "sk", "sl", "et", "lt")
# ASR transcriptions also exist for accented English (reference: voxpopuli.py:54).
ASR_ACCENTED_LANGUAGES = ("en_accented",)
# Speech-to-speech pairs: any ASR language into the 23 EP languages, with
# human (not auto-aligned) target transcription for en/fr/es
# (reference: voxpopuli.py:58-65).
S2S_SRC_LANGUAGES = ASR_LANGUAGES
S2S_TGT_LANGUAGES = LANGUAGES
S2S_TGT_LANGUAGES_WITH_HUMAN_TRANSCRIPTION = ("en", "fr", "es")
DOWNLOAD_BASE_URL = "https://dl.fbaipublicfiles.com/voxpopuli"

_SUBSET_LANGS = {"400k": LANGUAGES, "100k": LANGUAGES, "10k": LANGUAGES, "asr": ("original",)}
_SUBSET_YEARS = {
    "400k": YEARS + tuple(f"{y}_2" for y in YEARS), "100k": YEARS, "10k": (2019, 2020),
    "asr": YEARS}


def download_voxpopuli(target_dir: Pathlike = ".", subset: Optional[str] = "asr") -> Path:
    """Fetch + untar the session audio tars for a subset or language."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    if subset in LANGUAGES_V2:
        languages = [subset.split("_")[0]]
        years = YEARS + tuple(f"{y}_2" for y in YEARS)
    elif subset in LANGUAGES:
        languages, years = [subset], YEARS
    else:
        languages = _SUBSET_LANGS.get(subset)
        years = _SUBSET_YEARS.get(subset)
        if languages is None:
            raise ValueError(f"Unknown VoxPopuli subset: {subset}")
    out_root = target_dir / "raw_audios"
    out_root.mkdir(exist_ok=True, parents=True)
    urls = [f"{DOWNLOAD_BASE_URL}/audios/{lang}_{year}.tar" for lang in languages for year in years]
    logging.info(f"{len(urls)} files to download...")
    for url in urls:
        tar_path = out_root / Path(url).name
        resumable_download(url, filename=tar_path)
        with tarfile.open(tar_path, "r") as tar:
            safe_extract(tar, out_root)
        tar_path.unlink()
    return target_dir


class RecordingIdFn:
    """Picklable path -> recording-id mapper (strips language/original affix)."""

    def __init__(self, language: str):
        self.language = language

    def __call__(self, path: Path) -> str:
        rid = re.sub(f"_{self.language}$", "", path.stem)
        return re.sub("_original$", "", rid)


def prepare_voxpopuli(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None, task: str = "asr",
    lang: str = "en", source_lang: Optional[str] = None, target_lang: Optional[str] = None,
    num_jobs: int = 1) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """
    VoxPopuli manifests. Only the "asr" task is currently supported (the
    reference also stubs out "s2s" and "lm").
    """
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(exist_ok=True, parents=True)
    if task != "asr":
        raise NotImplementedError(f"VoxPopuli task not implemented yet: {task}")
    if lang not in ASR_LANGUAGES:
        raise AssertionError(f"Unsupported language: {lang}")

    manifests = _prepare_asr(corpus_dir, output_dir, lang, num_jobs=num_jobs)
    for split in [s for s, pair in manifests.items() if len(pair["recordings"]) == 0]:
        logging.warning(f"VoxPopuli {lang}/{split} has no recordings; skipping.")
        del manifests[split]
    for split, pair in manifests.items():
        recordings, supervisions = fix_manifests(**pair)
        validate_recordings_and_supervisions(recordings, supervisions)
        pair["recordings"], pair["supervisions"] = recordings, supervisions
        if output_dir is not None:
            recordings.to_file(output_dir / f"voxpopuli-{task}-{lang}_recordings_{split}.jsonl.gz")
            supervisions.to_file(
                output_dir / f"voxpopuli-{task}-{lang}_supervisions_{split}.jsonl.gz"
            )
    return manifests


def _prepare_asr(
    corpus_dir: Path, output_dir: Optional[Path], lang: str, num_jobs: int = 1,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    logging.info("Preparing recordings (this may take a few minutes)...")
    recordings = RecordingSet.from_dir(
        corpus_dir / "raw_audios" / lang, "*.ogg", num_jobs=num_jobs,
        recording_id=RecordingIdFn(language=lang))

    # Segment annotations ship separately as a per-language TSV.
    url = f"{DOWNLOAD_BASE_URL}/annotations/asr/asr_{lang}.tsv.gz"
    tsv_path = (output_dir or Path(".")) / Path(url).name
    if not tsv_path.exists():
        logging.info(f"Downloading: {url} -> {tsv_path}")
        resumable_download(url, filename=tsv_path)
    with gzip.open(tsv_path, "rt") as f:
        rows = list(csv.DictReader(f, delimiter="|"))

    per_split = defaultdict(list)
    seg_counter = defaultdict(int)
    for row in rows:
        split = row["split"]
        if split not in ("train", "dev", "test"):
            continue
        rid = row["session_id"]
        begin = float(row["start_time"])
        seg_counter[rid] += 1
        per_split[split].append(
            SupervisionSegment(
                id=f"{rid}-{seg_counter[rid]}",
                recording_id=rid,
                start=round(begin, ndigits=8),
                duration=round(float(row["end_time"]) - begin, ndigits=8),
                channel=0,
                language=lang,
                speaker=row["speaker_id"],
                gender=row["gender"],
                text=row["normed_text"],
                custom={"orig_text": row["original_text"]},
            )
        )

    manifests = {}
    for split in ("train", "dev", "test"):
        wanted = {s.recording_id for s in per_split[split]}
        manifests[split] = {
            "recordings": recordings.filter(lambda r: r.id in wanted),
            "supervisions": SupervisionSet.from_segments(per_split[split])}
    return manifests
