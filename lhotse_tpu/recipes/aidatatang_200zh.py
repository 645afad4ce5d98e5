"""
aidatatang_200zh recipe (openslr/62) — 200h Mandarin from Beijing DataTang;
one shared transcript file, per-speaker inner tars, wavs under
``corpus/{train,dev,test}/<speaker>/``.

Reference behavior: `/root/reference/lhotse/recipes/aidatatang_200zh.py:33-150`.
"""
import logging
import os
import shutil
import tarfile
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes._zh_common import build_part_manifests, maybe_store
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract


def download_aidatatang_200zh(
    target_dir: Pathlike = ".", force_download: bool = False,
    base_url: str = "http://www.openslr.org/resources") -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "aidatatang_200zh"
    tar_name = "aidatatang_200zh.tgz"
    extracted_dir = corpus_dir / tar_name[:-4]
    completed_detector = extracted_dir / ".completed"
    if completed_detector.is_file():
        logging.info(f"Skipping {tar_name}: {completed_detector} exists.")
        return corpus_dir
    tar_path = target_dir / tar_name
    resumable_download(
        f"{base_url}/62/{tar_name}", filename=tar_path, force_download=force_download)
    shutil.rmtree(extracted_dir, ignore_errors=True)
    with tarfile.open(tar_path) as tar:
        safe_extract(tar, path=corpus_dir)
    # Per-speaker inner tars under corpus/{split}/.
    for split_dir in (extracted_dir / "corpus").iterdir():
        for sub_tar_name in os.listdir(split_dir):
            if sub_tar_name.endswith((".tar.gz", ".tgz")):
                with tarfile.open(split_dir / sub_tar_name) as tar:
                    safe_extract(tar, path=split_dir)
    completed_detector.touch()
    return corpus_dir


def prepare_aidatatang_200zh(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    corpus_dir = Path(corpus_dir)
    d = corpus_dir / "aidatatang_200zh"
    assert d.is_dir(), f"No such directory: {d}"
    transcript_path = d / "transcript" / "aidatatang_200_zh_transcript.txt"
    assert transcript_path.is_file(), f"No such file: {transcript_path}"
    transcript_dict = {}
    for line in transcript_path.read_text(encoding="utf-8").splitlines():
        fields = line.split()
        if not fields:
            continue
        content = " ".join(fields[1:]).replace("Ａ", "A").upper()
        transcript_dict[fields[0]] = content

    manifests = {}
    for part in ("dev", "test", "train"):
        part_manifests = build_part_manifests(
            (d / "corpus" / part).rglob("**/*.wav"), transcript_dict,
            speaker_of=lambda p: p.parts[-2])
        maybe_store(part_manifests, output_dir, "aidatatang_200zh", part)
        manifests[part] = part_manifests
    return manifests
