"""
MUSAN corpus recipe (openslr/17) — music/speech/noise recordings used for
augmentation (CutMix noise sources and the like).

Reference behavior: `/root/reference/lhotse/recipes/musan.py`
(download_musan :33-60, prepare_musan :63-101 — music gets supervisions
carrying genre/vocals/musician annotations from the per-directory
ANNOTATIONS files; speech and noise are recordings-only).
"""
import logging
import tarfile
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Union

from lhotse_tpu import validate, validate_recordings_and_supervisions
from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

MUSAN_URL = "https://www.openslr.org/resources/17/musan.tar.gz"


def download_musan(
    target_dir: Pathlike = ".", url: Optional[str] = MUSAN_URL,
    force_download: Optional[bool] = False) -> Path:
    """Download and untar MUSAN; returns the corpus directory."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "musan"
    completed_detector = target_dir / ".musan_completed"
    if completed_detector.is_file():
        logging.info(f"Skipping musan download: {completed_detector} exists.")
        return corpus_dir
    tar_path = target_dir / "musan.tar.gz"
    resumable_download(url, filename=tar_path, force_download=force_download)
    with tarfile.open(tar_path) as tar:
        safe_extract(tar, path=target_dir)
    completed_detector.touch()
    return corpus_dir


def _scan_recordings(part_dir: Path) -> RecordingSet:
    return RecordingSet.from_recordings(
        Recording.from_file(p) for p in sorted(part_dir.rglob("*.wav"))
    )


def _read_annotations(path: Path, max_fields: int) -> Iterable[List[str]]:
    with open(path) as f:
        for line in f:
            fields = line.strip().split()
            if fields:
                yield fields[:max_fields]


def prepare_music(
    corpus_dir: Path, use_vocals: bool = True
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """Music-part manifests with genre/vocals/musician supervisions
    (reference: recipes/musan.py:97-117)."""
    corpus_dir = Path(corpus_dir)
    music_dir = corpus_dir / "music"
    recordings = _scan_recordings(music_dir)
    supervisions = SupervisionSet.from_segments(
        SupervisionSegment( id=utt, recording_id=utt, start=0, duration=recordings.duration(utt), speaker=musician, custom={"genres": genres.split(","), "vocals": vocals == "Y"}, ) for ann_file in sorted(music_dir.rglob("ANNOTATIONS")) for utt,
        genres, vocals, musician in _read_annotations(ann_file, max_fields=4))
    if not use_vocals:
        supervisions = supervisions.filter(lambda s: s.custom["vocals"] is False)
    return {"recordings": recordings, "supervisions": supervisions}


def prepare_musan(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
    parts: Sequence[str] = ("music", "speech", "noise"), use_vocals: bool = True,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """
    Prepare per-part manifests: ``music`` with annotation supervisions,
    ``speech``/``noise`` recordings-only.
    """
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    if isinstance(parts, str):
        parts = [parts]
    if not parts:
        raise ValueError("No MUSAN parts specified for manifest preparation.")

    manifests: Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]] = {}
    if "music" in parts:
        manifests["music"] = prepare_music(corpus_dir, use_vocals=use_vocals)
        validate_recordings_and_supervisions(**manifests["music"])
    for part in ("speech", "noise"):
        if part in parts:
            manifests[part] = {"recordings": _scan_recordings(corpus_dir / part)}
            validate(manifests[part]["recordings"])

    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        for part, part_manifests in manifests.items():
            for key, manifest in part_manifests.items():
                manifest.to_file(output_dir / f"musan_{key}_{part}.jsonl.gz")
    return manifests
