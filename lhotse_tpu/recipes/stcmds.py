"""
ST-CMDS recipe (openslr/38) — 100h Mandarin commands/short messages; one
``.txt`` transcript per ``.wav``, speaker encoded in chars 8-15 of the id.

Reference behavior: `/root/reference/lhotse/recipes/stcmds.py:23-142`
(WeNet-style normalization: drop fullwidth commas, uppercase).
"""
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes._zh_common import (build_part_manifests, download_tars, maybe_store)
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import Pathlike


def text_normalize(line: str) -> str:
    return line.replace("，", "").upper()


def download_stcmds(
    target_dir: Pathlike = ".", force_download: bool = False,
    base_url: str = "http://www.openslr.org/resources") -> Path:
    return download_tars(
        f"{base_url}/38", ["ST-CMDS-20170001_1-OS.tar.gz"], target_dir, "stcmds", force_download)


def prepare_stcmds(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    path = corpus_dir / "ST-CMDS-20170001_1-OS"
    transcript_dict = {
        p.stem: text_normalize(p.read_text(encoding="utf-8").strip())
        for p in path.rglob("**/*.txt")
    }
    manifests = build_part_manifests(
        path.rglob("**/*.wav"),
        transcript_dict,
        # e.g. 20170001P00001A0001 -> speaker P00001A
        speaker_of=lambda p: p.stem[8:15],
    )
    maybe_store(manifests, output_dir, "stcmds", "train")
    return {"train": manifests}
