"""
AISHELL-4 (OpenSLR 111): Mandarin meetings recorded with an 8-mic array;
FLAC sessions + TextGrid annotations, splits train_{L,M,S} and test.

Speaker ids in TextGrids are session-local; we mint globally unique ids per
(session, local id) pair.  Functional parity target:
``lhotse/recipes/aishell4.py``.
"""
import logging
import re
import tarfile
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.textgrid import read_textgrid
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

AISHELL4_PARTS = ("train_L", "train_M", "train_S", "test")

_FULLWIDTH = str.maketrans(
    {"Ａ": "A", "ａ": "A", "ｂ": "B", "ｃ": "C", "ｋ": "K", "ｔ": "T",
     "，": "", "丶": "", "。": "", "、": "", "？": ""}
)
_TAGS = ("<sil>", "<%>", "<->", "<$>", "<#>", "<_>", "<space>", "`", "&", ",", "\r", "\n")


def text_normalize(line: str) -> str:
    for tag in _TAGS:
        line = line.replace(tag, "")
    line = line.translate(_FULLWIDTH)
    if re.search("[a-zA-Z]", line):
        line = line.upper()
    return line


def download_aishell4(
    target_dir: Pathlike = ".", force_download: Optional[bool] = False,
    base_url: Optional[str] = "http://www.openslr.org/resources") -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    for tar_name in ("train_L.tar.gz", "train_M.tar.gz", "train_S.tar.gz", "test.tar.gz"):
        archive = target_dir / tar_name
        resumable_download(
            f"{base_url}/111/{tar_name}", filename=archive, force_download=force_download)
        with tarfile.open(archive) as tar:
            safe_extract(tar, path=target_dir)
    return target_dir


def prepare_aishell4(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None, normalize_text: bool = False,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """AISHELL-4 manifests with globally unique speaker ids."""
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")

    global_speakers: Dict[tuple, str] = {}
    manifests = defaultdict(dict)
    for part in AISHELL4_PARTS:
        recordings, supervisions = [], []
        for flac in sorted((corpus_dir / part / "wav").rglob("*.flac")):
            session = flac.stem
            tg_path = corpus_dir / part / "TextGrid" / f"{session}.TextGrid"
            try:
                tiers = read_textgrid(tg_path)
            except (ValueError, FileNotFoundError):
                logging.warning(f"{session} has annotation issues; skipping.")
                continue
            rec = Recording.from_file(flac)
            recordings.append(rec)
            for tier in tiers:
                key = (session, tier.name)
                if key not in global_speakers:
                    global_speakers[key] = f"SPK{len(global_speakers) + 1:04d}"
                spk = global_speakers[key]
                for j, iv in enumerate(tier.intervals):
                    if not iv.mark:
                        continue
                    text = iv.mark.strip()
                    supervisions.append(
                        SupervisionSegment(
                            id=f"{session}-{spk}-{j}",
                            recording_id=session,
                            start=iv.minTime,
                            duration=round(iv.maxTime - iv.minTime, 4),
                            channel=rec.channel_ids,
                            language="Chinese",
                            speaker=spk,
                            text=text_normalize(text) if normalize_text else text,
                        )
                    )
        if not recordings:
            logging.warning(f"AISHELL-4 part {part} has no sessions; skipping.")
            continue
        manifests[part] = finalize_manifests(
            recordings, supervisions, output_dir=output_dir, prefix="aishell4", part=part)
    return dict(manifests)
