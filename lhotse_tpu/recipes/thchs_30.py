"""
THCHS-30 recipe (openslr/18) — 30h Mandarin read speech from Tsinghua;
per-wav ``.wav.trn`` files whose first line is the character transcript
(lines 2-3 are pinyin/phones), splits as train/dev/test directories of
symlinks into ``data/``.

Reference behavior: `/root/reference/lhotse/recipes/thchs_30.py:24-153`.
"""
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes._zh_common import (build_part_manifests, download_tars, maybe_store)
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import Pathlike


def text_normalize(line: str) -> str:
    return line.replace(" l =", "").upper()


def download_thchs_30(
    target_dir: Pathlike = ".", force_download: bool = False,
    base_url: str = "http://www.openslr.org/resources") -> Path:
    return download_tars(
        f"{base_url}/18", ["data_thchs30.tgz"], target_dir, "thchs_30", force_download)


def prepare_thchs_30(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    data = corpus_dir / "data_thchs30" / "data"
    transcript_dict = {}
    for trn in data.rglob("**/*.wav.trn"):
        idx = Path(trn.stem).stem  # B11_374.wav.trn -> B11_374
        first_line = trn.read_text(encoding="utf-8").splitlines()[0]
        transcript_dict[idx] = text_normalize(first_line)

    manifests = {}
    for part in ("train", "dev", "test"):
        part_manifests = build_part_manifests(
            (corpus_dir / "data_thchs30" / part).rglob("**/*.wav"), transcript_dict,
            speaker_of=lambda p: p.stem.split("_")[0])
        maybe_store(part_manifests, output_dir, "thchs_30", part)
        manifests[part] = part_manifests
    return manifests
