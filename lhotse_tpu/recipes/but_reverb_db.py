"""
BUT Speech@FIT Reverb Database — real room impulse responses + environmental
noises from 9 rooms (https://speech.fit.vutbr.cz/software/but-speech-fit-reverb-database).

Reference behavior: `/root/reference/lhotse/recipes/but_reverb_db.py`
(download_but_reverb_db :47-74; prepare_but_reverb_db :76-123 — parts
'silence'/'rir' selected by the wav's parent dir name, recording ids built
from the room/mic/speaker/utterance path components + version suffix).
"""
import logging
import tarfile
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.cut import CutSet
from lhotse_tpu.utils import Pathlike, resumable_download

BUT_REVERB_DB_URL = (
    "http://merlin.fit.vutbr.cz/ReverbDB/BUT_ReverbDB_rel_19_06_RIR-Only.tgz")


def download_but_reverb_db(
    target_dir: Pathlike = ".", url: Optional[str] = BUT_REVERB_DB_URL,
    force_download: Optional[bool] = False) -> Path:
    """Fetch and untar the RIR-Only release."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    tgz_path = target_dir / "BUT_ReverbDB.tgz"
    if tgz_path.exists() and not force_download:
        logging.info(f"Skipping {tgz_path.name} because file exists.")
    resumable_download(url, tgz_path, force_download=force_download)
    tgz_dir = target_dir / "BUT_ReverbDB"
    if not tgz_dir.exists():
        logging.info(f"Untarring {tgz_path.name}.")
        with tarfile.open(tgz_path) as tar:
            tar.extractall(path=target_dir)
    return tgz_dir


def prepare_but_reverb_db(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
    parts: Sequence[str] = ("silence", "rir"),
) -> Dict[str, Dict[str, Union[RecordingSet, CutSet]]]:
    """Per-part recording manifests (RIRs and room noises)."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    if not parts:
        raise ValueError("No parts specified for manifest preparation.")
    if isinstance(parts, str):
        parts = [parts]

    by_part = defaultdict(list)
    for wav_file in sorted(corpus_dir.rglob("*.wav")):
        part = wav_file.parent.name.lower()
        if part not in parts:
            continue
        room_id = wav_file.parent.parent.parent.parent.parent.stem
        mic_id = wav_file.parent.parent.parent.parent.stem
        spk_id = wav_file.parent.parent.parent.stem
        uid = wav_file.parent.parent.stem
        version = wav_file.stem.split(".")[-1]
        by_part[part].append(
            Recording.from_file(
                wav_file, recording_id=f"{room_id}-{mic_id}-{spk_id}-{uid}-v{version}"))

    manifests = {
        part: {"recordings": RecordingSet.from_recordings(by_part[part])}
        for part in parts}
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        for part in parts:
            manifests[part]["recordings"].to_file(
                output_dir / f"but-reverb-db_{part}_recordings.jsonl.gz")
    return manifests
