"""
GigaST — speech translation labels over GigaSpeech audio: machine-translated
train text + human-translated test text (https://arxiv.org/abs/2204.03939).
Requires GigaSpeech manifests prepared beforehand.

Reference behavior: `/root/reference/lhotse/recipes/gigast.py`
(GigaST reader class :31-42 — streams segments across the per-audio JSON
tree; prepare_gigast :82-160 — walks the GigaSpeech supervisions in order
and attaches translated text where segment ids line up; only supervisions
are written, recordings stay GigaSpeech's).
"""
import json
import logging
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes.utils import manifests_exist, read_manifests_if_cached
from lhotse_tpu.supervision import SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download

GIGASPEECH_PARTS = ("XL", "L", "M", "S", "XS", "DEV", "TEST")
GIGAST_LANGS = ("de", "zh")

_BASE_URL = "https://lf3-nlp-opensource.bytetos.com/obj/nlp-opensource/datasets/GigaST"


class GigaST:
    """Streams segment rows across the per-audio structure of GigaST.json."""

    def __init__(self, corpus_dir: Pathlike, lang: str):
        with open(Path(corpus_dir) / f"GigaST.{lang}.json") as f:
            self.audio_generator = iter(json.load(f)["audios"])
        self.segment_generator = iter(next(self.audio_generator)["segments"])

    def get_next_line(self):
        try:
            return next(self.segment_generator)
        except StopIteration:
            self.segment_generator = iter(next(self.audio_generator)["segments"])
            return next(self.segment_generator)


def download_gigast(
    target_dir: Pathlike = ".", languages: Union[str, Sequence[str]] = "all",
    force_download: bool = False) -> Path:
    """Fetch the per-language GigaST JSON files."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    if languages == "all":
        languages = GIGAST_LANGS
    elif isinstance(languages, str):
        languages = [languages]
    for lang in languages:
        marker = target_dir / f".{lang}_completed"
        if marker.is_file():
            logging.info(f"Skipping {lang} because {marker} exists.")
            continue
        json_name = f"GigaST.{lang}.json"
        resumable_download(
            f"{_BASE_URL}/{json_name}", filename=target_dir / json_name,
            force_download=force_download)
        marker.touch()
    return target_dir


def prepare_gigast(
    corpus_dir: Pathlike, manifests_dir: Pathlike, output_dir: Optional[Pathlike],
    languages: Union[str, Sequence[str]] = "auto",
    dataset_parts: Union[str, Sequence[str]] = "auto",
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Translated supervision manifests aligned to GigaSpeech segment ids."""
    corpus_dir = Path(corpus_dir)
    manifests_dir = Path(manifests_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    logging.info("Preparing GigaST...")
    languages = GIGAST_LANGS if languages == "auto" else languages
    if isinstance(languages, str):
        languages = [languages]
    dataset_parts = ("XL", "TEST") if dataset_parts == "auto" else dataset_parts
    if isinstance(dataset_parts, str):
        dataset_parts = [dataset_parts]
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)

    gigaspeech = read_manifests_if_cached(
        dataset_parts=dataset_parts, output_dir=manifests_dir, prefix="gigaspeech",
        suffix="jsonl.gz")
    assert gigaspeech is not None
    assert len(gigaspeech) == len(dataset_parts), (
        len(gigaspeech), len(dataset_parts), list(gigaspeech.keys()), dataset_parts)

    out = {}
    for lang in languages:
        assert lang in GIGAST_LANGS, (lang, GIGAST_LANGS)
        logging.info(f"Loading GigaST.{lang}.json")
        gigast = GigaST(corpus_dir, lang)
        for partition, m in gigaspeech.items():
            if manifests_exist(
                    part=partition, output_dir=output_dir, prefix=f"gigast-{lang}",
                    suffix="jsonl.gz"):
                logging.info(
                    f"GigaST {lang} subset: {partition} already prepared - skipping.")
                # Unlike the reference (gigast.py:152-160, which also checks a
                # hardcoded 'gigast-de' prefix for every language and returns
                # None), read the cached manifest back so re-runs are
                # equivalent to first runs.
                cached = read_manifests_if_cached(
                    dataset_parts=[partition], output_dir=output_dir,
                    prefix=f"gigast-{lang}", suffix="jsonl.gz",
                    types=("supervisions",))
                if cached and partition in cached:
                    out[f"{lang}-{partition}"] = cached[partition]
                continue
            logging.info(f"Processing {partition}")
            supervisions = []
            cur_line = gigast.get_next_line()
            for sup in m["supervisions"]:
                if cur_line["sid"] != sup.id:
                    continue
                if partition != "TEST":
                    sup.custom = {
                        "text_raw": cur_line["text_raw"], "extra": cur_line["extra"]}
                else:
                    sup.custom = {"text_raw": cur_line["text_raw"]}
                supervisions.append(sup)
                try:
                    cur_line = gigast.get_next_line()
                except StopIteration:
                    break
            logging.info(f"Saving GigaST {lang} subset: {partition}")
            supervisionset = SupervisionSet.from_segments(supervisions)
            if output_dir is not None:
                supervisionset.to_file(
                    output_dir / f"gigast-{lang}_supervisions_{partition}.jsonl.gz")
            out[f"{lang}-{partition}"] = {"supervisions": supervisionset}
    return out
