"""
Grid audiovisual sentence corpus — 34 talkers x 1000 short command sentences
("put red at G9 now") with word alignments (https://zenodo.org/record/3625687).

Reference behavior: `/root/reference/lhotse/recipes/grid.py`
(download_grid :29-106 — zenodo_get + unzip + the published speaker-folder
permutation fix for the alignments; prepare_grid :108-166 — one Recording
per .mpg video, supervisions from ``.align`` files in milliseconds-of-40
units/1000, 'sil' tokens dropped from the text).
"""
import logging
import shutil
import subprocess
import tempfile
import zipfile
from concurrent.futures import ProcessPoolExecutor, as_completed
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import AlignmentItem, SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, is_module_available

GRID_ZENODO_ID = "10.5281/zenodo.3625687"

# The Zenodo alignments zip has its speaker folders permuted; this maps
# target folder -> source folder (published fix).
SPEAKER_FIX_MAP = {
    "s1": "s1", "s2": "s2", "s3": "s3", "s4": "s4", "s5": "s6", "s6": "s5", "s7": "s7",
    "s8": "s8", "s9": "s9", "s10": "s13", "s11": "s10", "s12": "s11", "s13": "s12",
    "s14": "s15", "s15": "s14", "s16": "s16", "s17": "s17", "s18": "s19", "s19": "s18",
    "s20": "s21", "s22": "s23", "s23": "s22", "s24": "s24", "s25": "s25", "s26": "s27",
    "s27": "s26", "s28": "s29", "s29": "s28", "s30": "s30", "s31": "s31", "s32": "s33",
    "s33": "s32", "s34": "s34"}


def download_grid(target_dir: Pathlike = ".", force_download: bool = False) -> Path:
    """Fetch via zenodo_get, unzip, and repair the alignment folder mapping."""
    if not is_module_available("zenodo_get"):
        raise RuntimeError(
            "To download Grid Audio-Visual Speech Corpus please 'pip install zenodo_get'."
        )
    corpus_dir = Path(target_dir)
    corpus_dir.mkdir(parents=True, exist_ok=True)
    download_marker = corpus_dir / ".downloaded"
    if not download_marker.exists() or force_download:
        subprocess.run(
            f"zenodo_get {GRID_ZENODO_ID}", shell=True, check=True, cwd=corpus_dir)
        download_marker.touch()
    for p in corpus_dir.glob("*.zip"):
        with zipfile.ZipFile(p) as f:
            f.extractall(corpus_dir)
    input_dir = corpus_dir / "alignments"
    staging = Path(tempfile.mkdtemp(dir=corpus_dir))
    for tgt_folder, src_folder in SPEAKER_FIX_MAP.items():
        shutil.copytree(input_dir / src_folder, staging / tgt_folder)
        logging.info(f"Copied alignment folder {src_folder} -> {tgt_folder}")
    shutil.rmtree(input_dir)
    staging.rename(input_dir)
    return corpus_dir


def process_single(
    video_path: Path, speaker: str, ali_dir: Path, with_supervisions: bool):
    """One (Recording, Optional[SupervisionSegment]) for one .mpg video."""
    video_id = video_path.stem
    try:
        recording = Recording.from_file(video_path, recording_id=f"{speaker}_{video_id}")
    except Exception as e:
        logging.warning(f"Unexpected error for {video_path}: {e}")
        return None
    supervision = None
    ali_path = (ali_dir / speaker / video_id).with_suffix(".align")
    if with_supervisions and ali_path.is_file():
        ali = [
            AlignmentItem(symbol=w, start=float(b) / 1000,
                          duration=float(int(e) - int(b)) / 1000)
            for b, e, w in (line.split() for line in ali_path.read_text().splitlines())]
        supervision = SupervisionSegment(
            id=recording.id, recording_id=recording.id, start=0.0,
            duration=recording.duration, channel=recording.channel_ids,
            text=" ".join(item.symbol for item in ali if item.symbol != "sil"),
            language="English", speaker=speaker, alignment={"word": ali})
    return recording, supervision


def prepare_grid(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
    with_supervisions: bool = True, num_jobs: int = 1,
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """Recordings (and alignment supervisions) off the extracted Grid tree."""
    corpus_dir = Path(corpus_dir)
    ali_dir = corpus_dir / "alignments"
    assert ali_dir.is_dir()
    assert (corpus_dir / "audio_25k").is_dir()

    videos = [p for p in corpus_dir.rglob("*.mpg") if "MACOSX" not in str(p)]
    recordings, supervisions = [], []
    with ProcessPoolExecutor(num_jobs) as pool:
        futures = [
            pool.submit(process_single, p, p.parent.name, ali_dir, with_supervisions)
            for p in videos]
        for f in as_completed(futures):
            try:
                result = f.result()
            except Exception:
                continue
            if result is None:
                continue
            recording, maybe_supervision = result
            recordings.append(recording)
            if maybe_supervision is not None:
                supervisions.append(maybe_supervision)

    recordings = RecordingSet.from_recordings(recordings)
    if with_supervisions:
        fixed = finalize_manifests(recordings, supervisions)
        recordings, supervisions = fixed["recordings"], fixed["supervisions"]
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        recordings.to_file(output_dir / "grid_recordings.jsonl.gz")
        if with_supervisions:
            supervisions.to_file(output_dir / "grid_supervisions.jsonl.gz")
    out = {"recordings": recordings}
    if with_supervisions:
        out["supervisions"] = supervisions
    return out
