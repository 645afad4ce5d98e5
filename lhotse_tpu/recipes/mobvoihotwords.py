"""
MobvoiHotwords (OpenSLR 87): keyword-spotting corpus for the wake words
"Hi Xiaowen" / "Nihao Wenwen" plus free-text negatives.

Layout (functional parity target: ``lhotse/recipes/mobvoihotwords.py``)::

    MobvoiHotwords/
      mobvoi_hotword_dataset/<utt>.wav
      mobvoi_hotword_dataset_resources/{p,n}_{train,dev,test}.json
        # entries: {utt_id, speaker_id, keyword_id (0/1/-1)}
"""
import json
import logging
import tarfile
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import (finalize_manifests, manifests_exist, read_manifests_if_cached)
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

_KEYWORD_TEXT = {0: "HiXiaowen", 1: "NihaoWenwen", -1: "FREETEXT"}


def download_mobvoihotwords(
    target_dir: Pathlike = ".", force_download: Optional[bool] = False,
    base_url: Optional[str] = "http://www.openslr.org/resources") -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "MobvoiHotwords"
    for tar_name in ("mobvoi_hotword_dataset.tgz", "mobvoi_hotword_dataset_resources.tgz"):
        extracted = corpus_dir / tar_name[:-4]
        marker = extracted / ".completed"
        if marker.is_file():
            logging.info(f"Skip {tar_name} because {marker} exists.")
            continue
        archive = target_dir / tar_name
        resumable_download(
            f"{base_url}/87/{tar_name}", filename=archive, force_download=force_download)
        with tarfile.open(archive) as tar:
            safe_extract(tar, path=corpus_dir)
        marker.touch()
    return corpus_dir


def prepare_mobvoihotwords(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Per-split MobvoiHotwords manifests (positives + negatives merged)."""
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")
    parts = ("train", "dev", "test")

    manifests = {}
    if output_dir is not None:
        manifests = read_manifests_if_cached(
            dataset_parts=parts, output_dir=output_dir, prefix="mobvoi") or {}

    for part in parts:
        if manifests_exist(part=part, output_dir=output_dir, prefix="mobvoi"):
            logging.info(f"MobvoiHotwords subset: {part} already prepared - skipping.")
            continue
        logging.info(f"Preparing MobvoiHotwords subset: {part}")
        recordings, supervisions = [], []
        for polarity in ("p", "n"):
            entries_path = (
                corpus_dir / "mobvoi_hotword_dataset_resources" / f"{polarity}_{part}.json"
            )
            for entry in json.loads(entries_path.read_text(encoding="utf-8")):
                utt = entry["utt_id"]
                wav = corpus_dir / "mobvoi_hotword_dataset" / f"{utt}.wav"
                if not wav.is_file():
                    logging.warning(f"No such file: {wav}")
                    continue
                if entry["keyword_id"] not in _KEYWORD_TEXT:
                    raise AssertionError(f"Unexpected keyword_id: {entry['keyword_id']}")
                rec = Recording.from_file(wav)
                recordings.append(rec)
                supervisions.append(
                    SupervisionSegment(
                        id=utt,
                        recording_id=utt,
                        start=0.0,
                        duration=rec.duration,
                        channel=0,
                        language="Chinese",
                        speaker=entry["speaker_id"] if entry["speaker_id"] is not None else utt,
                        text=_KEYWORD_TEXT[entry["keyword_id"]],
                    )
                )
        manifests[part] = finalize_manifests(
            recordings, supervisions, output_dir=output_dir, prefix="mobvoi", part=part)
    return manifests
