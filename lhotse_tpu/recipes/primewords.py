"""
Primewords Chinese recipe (openslr/47) — 100h Mandarin smartphone
recordings; one JSON transcript table (``set1_transcript.json`` entries with
file/text/user_id).

Reference behavior: `/root/reference/lhotse/recipes/primewords.py:20-133`.
"""
import json
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes._zh_common import (build_part_manifests, download_tars, maybe_store)
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import Pathlike


def download_primewords(
    target_dir: Pathlike = ".", force_download: bool = False,
    base_url: str = "http://www.openslr.org/resources") -> Path:
    return download_tars(
        f"{base_url}/47", ["primewords_md_2018_set1.tar.gz"], target_dir, "primewords",
        force_download)


def prepare_primewords(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    root = corpus_dir / "primewords_md_2018_set1"
    transcript_path = root / "set1_transcript.json"
    assert transcript_path.is_file(), f"No such file: {transcript_path}"
    transcript_dict, speaker_dict = {}, {}
    for utt in json.loads(transcript_path.read_text(encoding="utf-8")):
        uttid = utt["file"].split(".")[0]
        transcript_dict[uttid] = utt["text"]
        speaker_dict[uttid] = str(utt["user_id"])

    manifests = build_part_manifests(
        (root / "audio_files").rglob("**/*.wav"), transcript_dict,
        speaker_of=lambda p: speaker_dict.get(p.stem))
    maybe_store(manifests, output_dir, "primewords", "train")
    return {"train": manifests}
