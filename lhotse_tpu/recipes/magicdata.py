"""
MagicData recipe (openslr/68) — 755h Mandarin read speech; per-split
``TRANS.txt`` tables (UtteranceID / SpeakerID / Transcription), wavs under
``<split>/<speaker>/``.

Reference behavior: `/root/reference/lhotse/recipes/magicdata.py:25-200`
(WeNet-style punctuation-stripping text normalization).
"""
import re
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes._zh_common import (build_part_manifests, download_tars, maybe_store)
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import Pathlike

# Punctuation + noise tokens the WeNet prep strips.
_STRIP = re.compile("[！？，－：；。`,:?/·\"“”\\\\…、\\[\\]《》　﻿]|FIL|SPK|\\[ |《 ")


def text_normalize(line: str) -> str:
    return _STRIP.sub("", line).upper()


def download_magicdata(
    target_dir: Pathlike = ".", force_download: bool = False,
    base_url: str = "http://www.openslr.org/resources") -> Path:
    return download_tars(
        f"{base_url}/68", ["train_set.tar.gz", "dev_set.tar.gz", "test_set.tar.gz"], target_dir,
        "magicdata", force_download)


def prepare_magicdata(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    transcript_dict = {}
    for part in ("train", "dev", "test"):
        trans = corpus_dir / part / "TRANS.txt"
        if not trans.is_file():
            continue
        for line in trans.read_text(encoding="utf-8").splitlines():
            if line.startswith("UtteranceID"):
                continue
            fields = line.split()
            if len(fields) < 3:
                continue
            utt_id = fields[0].split(".")[0]
            transcript_dict[utt_id] = text_normalize(" ".join(fields[2:]))

    manifests = {}
    for part in ("train", "dev", "test"):
        wav_path = corpus_dir / part
        if not wav_path.is_dir():
            continue
        part_manifests = build_part_manifests(
            wav_path.rglob("**/*.wav"), transcript_dict, speaker_of=lambda p: p.parts[-2])
        maybe_store(part_manifests, output_dir, "magicdata", part)
        manifests[part] = part_manifests
    return manifests
