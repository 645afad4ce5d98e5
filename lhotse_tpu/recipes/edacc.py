"""
EdAcc — Edinburgh International Accents of English Corpus: ~40 h of dyadic
video-call conversations across many L1/L2 English varieties, with a
linguistic-background profile per speaker
(https://datashare.ed.ac.uk/handle/10283/4836).

Reference behavior: `/root/reference/lhotse/recipes/edacc.py`
(download_edacc :33-66 — zip containing edacc_v1.0.tar.gz; prepare_edacc
:68-119 — Kaldi-style dev/test dirs with a wav.scp materialized from the
shared data/ pool, speaker metadata merged from linguistic_background.csv,
``is_conversational`` flag from conv.list).

Deviation: linguistic_background.csv is parsed with the csv module.
"""
import csv
import logging
import shutil
import tarfile
import zipfile
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.qa import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

_EDACC_SAMPLING_RATE = 32000

_COLUMN_MAP = {
    "What is your gender?": "gender",
    "What’s your ethnic background? ": "ethnicity",
    "What is your higher level of education?": "education",
    "How would you describe your accent in English? (e.g. Italian, Glaswegian)": "accent",
    "Do you speak any second languages? separate them with commas  "
    "(e.g., Mandarin,Catalan,French )": "other_languages",
    "What’s your year of birth? (e.g., 1992)": "birth_year",
    "What year did you start learning English? (e.g., 1999)": "start_english_year"}


def download_edacc(
    target_dir: Pathlike = ".", force_download: bool = False,
    base_url: str = "https://datashare.ed.ac.uk/download/") -> Path:
    """Fetch the datashare zip and unpack the inner tarball."""
    target_dir = Path(target_dir)
    corpus_dir = target_dir / "edacc"
    target_dir.mkdir(parents=True, exist_ok=True)
    marker = corpus_dir / ".completed"
    if marker.is_file():
        logging.info(f"Skipping EDACC download because {marker} exists.")
        return corpus_dir
    archive_path = target_dir / "DS_10283_8983.zip"
    resumable_download(
        f"{base_url}/DS_10283_8983.zip", filename=archive_path,
        force_download=force_download)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    with zipfile.ZipFile(archive_path) as zf:
        zf.extractall(path=corpus_dir)
    with tarfile.open(corpus_dir / "edacc_v1.0.tar.gz") as tar:
        safe_extract(tar, corpus_dir)
    marker.touch()
    return corpus_dir


def parse_linguistic_background(path: Pathlike) -> Dict[str, dict]:
    """Per-participant metadata dict off the background questionnaire CSV."""
    def to_int(val):
        try:
            return int(float(val))
        except (TypeError, ValueError):
            return None

    spk2meta = {}
    with open(path, encoding="utf-8", newline="") as f:
        for row in csv.DictReader(f):
            meta = {
                new: (row.get(old) or "").strip()
                for old, new in _COLUMN_MAP.items() if new not in
                ("birth_year", "start_english_year", "other_languages")}
            langs = (row.get(
                "Do you speak any second languages? separate them with commas  "
                "(e.g., Mandarin,Catalan,French )") or "").strip()
            meta["other_languages"] = (
                [v.strip() for v in langs.split(",")] if langs else [])
            birth = to_int(row.get("What’s your year of birth? (e.g., 1992)"))
            start = to_int(row.get("What year did you start learning English? (e.g., 1999)"))
            meta["age"] = 2022 - birth if birth is not None else None
            meta["years_speaking_english"] = 2022 - start if start is not None else None
            spk2meta[row["PARTICIPANT_ID"]] = meta
    return spk2meta


def prepare_edacc(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """dev/test manifests off the edacc_v1.0 Kaldi-style layout."""
    from lhotse_tpu.kaldi import load_kaldi_data_dir

    corpus_dir = Path(corpus_dir) / "edacc_v1.0"
    audio_dir = corpus_dir / "data"
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
    spk2meta = parse_linguistic_background(corpus_dir / "linguistic_background.csv")
    pool = RecordingSet.from_dir(audio_dir, "*.wav")
    for r in pool:
        assert r.num_channels == 1, f"Unexpected multi-channel recording: {r}"
        assert r.sampling_rate == _EDACC_SAMPLING_RATE
    wav_scp = {r.id: f"{r.id} {r.sources[0].source}" for r in pool}

    manifests = {}
    for split in ("dev", "test"):
        data_dir = corpus_dir / split
        split_rec_ids = {
            line.split()[1] for line in (data_dir / "segments").read_text().splitlines()}
        with open(data_dir / "wav.scp", "w") as f:
            for rid, row in sorted(wav_scp.items()):
                if rid in split_rec_ids:
                    print(row, file=f)
        recordings, supervisions, _ = load_kaldi_data_dir(
            data_dir, sampling_rate=_EDACC_SAMPLING_RATE)
        conv_rec_ids = {
            line.strip() for line in (data_dir / "conv.list").read_text().splitlines()}
        for s in supervisions:
            s.language = "English"
            s.is_conversational = s.recording_id in conv_rec_ids
            for key, val in spk2meta[s.speaker].items():
                setattr(s, key, val)
        recordings, supervisions = fix_manifests(recordings, supervisions)
        validate_recordings_and_supervisions(recordings, supervisions)
        manifests[split] = {"recordings": recordings, "supervisions": supervisions}
        if output_dir is not None:
            recordings.to_file(output_dir / f"edacc_recordings_{split}.jsonl.gz")
            supervisions.to_file(output_dir / f"edacc_supervisions_{split}.jsonl.gz")
    return manifests
