"""
EARS: 100+ hours of anechoic full-band (48 kHz) speech from 107 speakers —
emotional speech, reading styles, free speech — for speech enhancement and
dereverberation benchmarking (github.com/facebookresearch/ears_dataset).

Layout (functional parity target: ``lhotse/recipes/ears.py``)::

    p001/ .. p107/ *.wav        # per-speaker zips, utterance-style file stems
    speaker_statistics.json     # speaker -> {age, gender, native language, ...}
    transcripts.json            # utterance stem -> transcript (read styles)
"""
import json
import logging
import shutil
import zipfile
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests, manifests_exist
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download

_EARS_RELEASE = "https://github.com/facebookresearch/ears_dataset"
EARS_SPEAKERS = tuple(f"p{n:03d}" for n in range(1, 108))


class _SpeakerRecordingId:
    """Picklable path -> '<spk>_<stem>' mapper for RecordingSet.from_dir."""

    def __init__(self, spk: str):
        self.spk = spk

    def __call__(self, path: Path) -> str:
        return f"{self.spk}_{path.stem}"


def download_ears(target_dir: Pathlike = ".", force_download: bool = False) -> Path:
    """Fetch metadata + all 107 per-speaker zips from the GitHub release."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    for meta in ("speaker_statistics.json", "transcripts.json"):
        resumable_download(
            f"{_EARS_RELEASE.replace('github.com', 'raw.githubusercontent.com')}/main/{meta}",
            filename=target_dir / meta, force_download=force_download)
    for spk in EARS_SPEAKERS:
        zip_path = target_dir / f"{spk}.zip"
        spk_dir = target_dir / spk
        if spk_dir.is_dir() and not force_download:
            continue
        resumable_download(
            f"{_EARS_RELEASE}/releases/download/dataset/{spk}.zip", filename=zip_path,
            force_download=force_download)
        shutil.rmtree(spk_dir, ignore_errors=True)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(target_dir)
        zip_path.unlink()
    return target_dir


def prepare_ears(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None, num_jobs: int = 1,
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """One flat EARS manifest pair; speaker metadata in supervision.custom."""
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")
    # Cached re-run: return the previously written flat manifest pair
    # (reference parity: ears.py:44-156 `_read_manifests_if_cached_no_parts`).
    if output_dir is not None:
        rec_path = Path(output_dir) / "ears_recordings.jsonl.gz"
        sup_path = Path(output_dir) / "ears_supervisions.jsonl.gz"
        if rec_path.is_file() and sup_path.is_file():
            logging.info("EARS manifests already prepared - reading them back.")
            return {
                "recordings": RecordingSet.from_file(rec_path),
                "supervisions": SupervisionSet.from_file(sup_path),
            }
    spk2meta = json.loads((corpus_dir / "speaker_statistics.json").read_text())
    utt2text = json.loads((corpus_dir / "transcripts.json").read_text())

    recordings, supervisions = [], []
    for spk in EARS_SPEAKERS:
        spk_dir = corpus_dir / spk
        if not spk_dir.is_dir():
            continue
        recs = RecordingSet.from_dir(
            spk_dir, "*.wav", num_jobs=num_jobs, recording_id=_SpeakerRecordingId(spk))
        for rec in recs:
            recordings.append(rec)
            meta = dict(spk2meta[spk])
            utt = rec.id.split("_", 1)[1]
            supervisions.append(
                SupervisionSegment(
                    id=rec.id,
                    recording_id=rec.id,
                    start=0.0,
                    duration=rec.duration,
                    channel=0,
                    text=utt2text.get(utt),
                    language="English",
                    speaker=spk,
                    gender=meta.pop("gender", None),
                    custom=meta,
                )
            )
    result = finalize_manifests(recordings, supervisions)
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        result["supervisions"].to_file(output_dir / "ears_supervisions.jsonl.gz")
        result["recordings"].to_file(output_dir / "ears_recordings.jsonl.gz")
    return result
