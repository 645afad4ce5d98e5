"""
Shared skeleton for the simple Chinese OpenSLR corpora (thchs-30, stcmds,
magicdata, primewords, aidatatang): download one or more tars with a
.completed marker, then build per-split manifests by pairing scanned wavs
with a transcript dict.
"""
import logging
import shutil
import tarfile
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional, Union

from lhotse_tpu import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract


def download_tars(
    url: str, tar_names: Iterable[str], target_dir: Pathlike, corpus_name: str,
    force_download: bool = False) -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / corpus_name
    for tar_name in tar_names:
        tar_path = target_dir / tar_name
        extracted_dir = corpus_dir / tar_name.replace(".tar.gz", "")
        completed_detector = extracted_dir / ".completed"
        if completed_detector.is_file():
            logging.info(f"Skipping {tar_name}: {completed_detector} exists.")
            continue
        resumable_download(f"{url}/{tar_name}", filename=tar_path, force_download=force_download)
        shutil.rmtree(extracted_dir, ignore_errors=True)
        with tarfile.open(tar_path) as tar:
            safe_extract(tar, path=corpus_dir)
        completed_detector.touch()
    return corpus_dir


def build_part_manifests(
    wav_paths: Iterable[Path], transcript_dict: Dict[str, str],
    speaker_of: Callable[[Path], Optional[str]], language: str = "Chinese",
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    recordings, supervisions = [], []
    for audio_path in sorted(wav_paths):
        idx = audio_path.stem
        if idx not in transcript_dict:
            logging.warning(f"{audio_path} has no transcript.")
            continue
        recording = Recording.from_file(audio_path)
        recordings.append(recording)
        supervisions.append(
            SupervisionSegment(
                id=idx,
                recording_id=idx,
                start=0.0,
                duration=recording.duration,
                channel=0,
                language=language,
                speaker=speaker_of(audio_path),
                text=transcript_dict[idx].strip(),
            )
        )
    recording_set = RecordingSet.from_recordings(recordings)
    supervision_set = SupervisionSet.from_segments(supervisions)
    if recordings:  # an absent split legitimately yields empty manifests
        recording_set, supervision_set = fix_manifests(recording_set, supervision_set)
        validate_recordings_and_supervisions(recording_set, supervision_set)
    return {"recordings": recording_set, "supervisions": supervision_set}


def maybe_store(manifests, output_dir: Optional[Pathlike], prefix: str, part: str):
    if output_dir is None:
        return
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    manifests["recordings"].to_file(output_dir / f"{prefix}_recordings_{part}.jsonl.gz")
    manifests["supervisions"].to_file(output_dir / f"{prefix}_supervisions_{part}.jsonl.gz")
