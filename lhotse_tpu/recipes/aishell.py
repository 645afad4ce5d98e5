"""
AISHELL-1 recipe (openslr/33) — 170h Mandarin read speech.

Reference behavior: `/root/reference/lhotse/recipes/aishell.py`
(download_aishell :41-83, prepare_aishell :85-157 — one shared transcript
file ``aishell_transcript_v0.8.txt``; wavs under ``wav/{train,dev,test}/
<speaker>/<utt>.wav``; fullwidth latin letters normalized, spaces removed
from the Mandarin text).
"""
import logging
import os
import shutil
import tarfile
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

_FULLWIDTH = str.maketrans("ａｂｃｋｔ", "abckt")


def text_normalize(line: str) -> str:
    """Map fullwidth latin letters to ASCII and uppercase (the WeNet-style
    normalization the reference applies, aishell.py:24-39)."""
    return line.translate(_FULLWIDTH).upper()


def download_aishell(
    target_dir: Pathlike = ".", force_download: bool = False,
    base_url: str = "http://www.openslr.org/resources") -> Path:
    """Download data + resource tarballs and untar (incl. per-speaker inner
    tars); returns the corpus directory."""
    url = f"{base_url}/33"
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "aishell"
    for tar_name in ("data_aishell.tgz", "resource_aishell.tgz"):
        tar_path = target_dir / tar_name
        extracted_dir = corpus_dir / tar_name[:-4]
        completed_detector = extracted_dir / ".completed"
        if completed_detector.is_file():
            logging.info(f"Skipping {tar_name}: {completed_detector} exists.")
            continue
        resumable_download(f"{url}/{tar_name}", filename=tar_path, force_download=force_download)
        shutil.rmtree(extracted_dir, ignore_errors=True)
        with tarfile.open(tar_path) as tar:
            safe_extract(tar, path=corpus_dir)
        if tar_name == "data_aishell.tgz":
            wav_dir = extracted_dir / "wav"
            for sub_tar_name in os.listdir(wav_dir):
                with tarfile.open(wav_dir / sub_tar_name) as tar:
                    safe_extract(tar, path=wav_dir)
        completed_detector.touch()
    return corpus_dir


def prepare_aishell(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Prepare train/dev/test manifests from an extracted AISHELL-1 tree."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)

    transcript_path = (corpus_dir / "data_aishell/transcript/aishell_transcript_v0.8.txt")
    transcript_dict = {}
    with open(transcript_path, encoding="utf-8") as f:
        for line in f:
            fields = line.split()
            if not fields:
                continue
            transcript_dict[fields[0]] = text_normalize(" ".join(fields[1:]))

    manifests = defaultdict(dict)
    for part in ("train", "dev", "test"):
        logging.info(f"Processing aishell subset: {part}")
        recordings, supervisions = [], []
        wav_path = corpus_dir / "data_aishell" / "wav" / part
        for audio_path in sorted(wav_path.rglob("**/*.wav")):
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
                    language="Chinese",
                    speaker=audio_path.parts[-2],
                    # No spaces between Mandarin words in the final text.
                    text=transcript_dict[idx].strip().replace(" ", ""),
                )
            )
        recording_set, supervision_set = fix_manifests(
            RecordingSet.from_recordings(recordings), SupervisionSet.from_segments(supervisions))
        validate_recordings_and_supervisions(recording_set, supervision_set)
        if output_dir is not None:
            recording_set.to_file(output_dir / f"aishell_recordings_{part}.jsonl.gz")
            supervision_set.to_file(output_dir / f"aishell_supervisions_{part}.jsonl.gz")
        manifests[part] = {"recordings": recording_set, "supervisions": supervision_set}
    return dict(manifests)
