"""
otoSpeech — full-duplex spontaneous multi-speaker conversations (141 h) for
speech-to-speech/dialogue modeling, with Parakeet-v3 pseudo labels
(https://huggingface.co/datasets/otoearth/otoSpeech-full-duplex-processed-141h).

Reference behavior: `/root/reference/lhotse/recipes/oto_speech.py`
(download_oto_speech :33-90 — HF snapshot (needs HF_TOKEN) + gdown'd
seglst.json labels; prepare_oto_speech :105-190 — tar shards flattened into
unpacked/, recordings lazily resampled, seglst segments with optional word
alignments).
"""
import json
import logging
import os
import tarfile
from pathlib import Path
from typing import Dict, Tuple, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.qa import fix_manifests
from lhotse_tpu.supervision import AlignmentItem, SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, is_module_available, safe_extract

_LABELS_URL = (
    "https://drive.google.com/file/d/16htmj5O14D51C-EjOUMF_cXOxo6vruui/view?usp=sharing")


def download_oto_speech(
    target_dir: Pathlike = ".", parts: Tuple[str, ...] = ("train",),
    version: str = "full-duplex-processed-141h", force_download: bool = False) -> Path:
    """HF snapshot of the audio shards + Google-Drive pseudo labels."""
    if not is_module_available("huggingface_hub"):
        raise RuntimeError("Install via: pip install huggingface_hub")
    if not is_module_available("gdown"):
        raise RuntimeError("Install via: pip install gdown")
    import gdown
    from huggingface_hub import snapshot_download

    token = os.getenv("HF_TOKEN")
    if not token:
        raise RuntimeError("HF_TOKEN environment variable not found.")
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    for part in parts:
        if part != "train":
            logging.warning(
                f"Dataset only provides a 'train' split. Downloading '{part}' may fail.")
        logging.info(f"Downloading dataset shard for: {part}")
        snapshot_download(
            repo_id=f"otoearth/otoSpeech-{version}", repo_type="dataset",
            local_dir=target_dir, force_download=force_download,
            allow_patterns=[f"data/{part}/*"], token=token)
    labels_path = target_dir / "seglst.json"
    if not labels_path.exists() or force_download:
        logging.info("Downloading Parakeet v3 pseudo labels (seglst.json)...")
        gdown.download(_LABELS_URL, str(labels_path), quiet=False, fuzzy=True)
    return target_dir


def extract_and_flatten_tar(tar_path: Path, extract_dir: Path) -> None:
    """Extract one tar shard, flatten its tree, and drop a .done marker."""
    marker = extract_dir / f"{tar_path.name}.done"
    if marker.exists():
        return
    with tarfile.open(tar_path) as tar:
        safe_extract(tar, path=extract_dir)
    for p in extract_dir.rglob("*"):
        if p.is_file() and p.parent != extract_dir and p.suffix != ".done":
            target_path = extract_dir / p.name
            if not target_path.exists():
                p.rename(target_path)
    marker.touch()


def _segment_from_label(seg: dict, idx: int) -> SupervisionSegment:
    start, end = seg["start_time"], seg["end_time"]
    alignment = None
    if "word_alignment" in seg:
        alignment = {
            "word": [
                AlignmentItem(
                    symbol=w_text, start=round(w_start - start, 4),
                    duration=round(w_end - w_start, 4))
                for w_text, w_start, w_end in seg["word_alignment"]]}
    return SupervisionSegment(
        id=f"{seg['session_id']}-{idx}", recording_id=seg["session_id"], start=start,
        duration=round(end - start, 4), channel=0, text=seg["words"],
        speaker=seg["speaker"], language="en", alignment=alignment)


def prepare_oto_speech(
    corpus_dir: Pathlike, output_dir: Pathlike, parts: Tuple[str, ...] = ("train",),
    target_sr: int = 16000,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Unpack shards, build lazily-resampled recordings + pseudo supervisions."""
    corpus_dir = Path(corpus_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    labels_path = corpus_dir / "seglst.json"
    if not labels_path.exists():
        raise FileNotFoundError(
            f"Labels not found at {labels_path}. Please run download_oto_speech() first.")
    label_data = json.loads(labels_path.read_text(encoding="utf-8"))

    manifests = {}
    for part in parts:
        if part != "train":
            logging.warning(
                f"Preparing split '{part}', but standard otoSpeech only guarantees 'train'.")
        part_dir = corpus_dir / "data" / part
        unpacked_dir = part_dir / "unpacked"
        unpacked_dir.mkdir(parents=True, exist_ok=True)
        for tar_path in sorted(part_dir.glob("*.tar")):
            extract_and_flatten_tar(tar_path, unpacked_dir)

        recordings = RecordingSet.from_recordings(
            Recording.from_file(p) for p in sorted(unpacked_dir.glob("*.flac")))
        recordings = recordings.resample(target_sr)

        supervisions = []
        for idx, seg in enumerate(label_data):
            if seg["session_id"] not in recordings:
                continue
            if round(seg["end_time"] - seg["start_time"], 4) <= 0:
                logging.warning(
                    f"Skipped segment for rec: {seg['session_id']} at "
                    f"{seg['start_time']} due to 0 duration")
                continue
            supervisions.append(_segment_from_label(seg, idx))
        supervision_set = SupervisionSet.from_segments(supervisions)
        recordings, supervision_set = fix_manifests(recordings, supervision_set)
        recordings.to_file(output_dir / f"oto_recordings_{part}.jsonl.gz")
        supervision_set.to_file(output_dir / f"oto_supervisions_{part}.jsonl.gz")
        manifests[part] = {"recordings": recordings, "supervisions": supervision_set}
    return manifests
