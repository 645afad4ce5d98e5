"""
LibriTTS / LibriTTS-R recipe (openslr/60 and /141) — 24 kHz TTS corpus
derived from LibriSpeech, with original + normalized texts and per-utterance
SNR metadata.

Reference behavior: `/root/reference/lhotse/recipes/libritts.py`
(download_libritts :80-136, prepare_libritts :137-287 — per-chapter
``*.trans.tsv`` (id / original / normalized text), ``*.book.tsv`` SNR column,
``SPEAKERS.txt`` gender map, optional previous-utterance chaining).
"""
import logging
import re
import shutil
import tarfile
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

from lhotse_tpu import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.recipes.utils import manifests_exist, read_manifests_if_cached
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

LIBRITTS = (
    "dev-clean", "dev-other", "test-clean", "test-other", "train-clean-100", "train-clean-360",
    "train-other-500")


def download_libritts(
    target_dir: Pathlike = ".", use_librittsr: bool = False,
    dataset_parts: Optional[Union[str, Sequence[str]]] = "all",
    force_download: Optional[bool] = False,
    base_url: Optional[str] = "http://www.openslr.org/resources") -> Path:
    """Download and untar LibriTTS (or LibriTTS-R with use_librittsr=True)."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    if dataset_parts == "all" or dataset_parts[0] == "all":
        dataset_parts = LIBRITTS
    elif isinstance(dataset_parts, str):
        dataset_parts = [dataset_parts]

    name = "LibriTTS_R" if use_librittsr else "LibriTTS"
    openslr_corpus_id = "141" if use_librittsr else "60"

    for part in dataset_parts:
        if part not in LIBRITTS:
            logging.warning(
                f"Skipping invalid dataset part name: {part} "
                f"(possible choices: {LIBRITTS})"
            )
            continue
        tar_name = f"{part}.tar.gz"
        tar_path = target_dir / tar_name
        part_dir = target_dir / name / part
        completed_detector = part_dir / ".completed"
        if completed_detector.is_file():
            logging.info(f"Skipping {part} because {completed_detector} exists.")
            continue
        full_url = f"{base_url}/{openslr_corpus_id}/{tar_name}"
        if use_librittsr:
            full_url = full_url.replace("-", "_")
        resumable_download(full_url, filename=tar_path, force_download=force_download)
        shutil.rmtree(part_dir, ignore_errors=True)
        with tarfile.open(tar_path) as tar:
            safe_extract(tar, path=target_dir)
        completed_detector.touch()
    return target_dir


def download_librittsr(
    target_dir: Pathlike = ".", dataset_parts: Optional[Union[str, Sequence[str]]] = "all",
    force_download: Optional[bool] = False,
    base_url: Optional[str] = "http://www.openslr.org/resources") -> Path:
    return download_libritts(
        target_dir=target_dir, dataset_parts=dataset_parts, force_download=force_download,
        base_url=base_url, use_librittsr=True)


def _read_speakers(corpus_dir: Path) -> Dict[str, str]:
    """SPEAKERS.txt: ';'-commented, '|'-separated (id | gender | subset...)."""
    path = corpus_dir / "SPEAKERS.txt"
    if not path.is_file():
        return {}
    out = {}
    for line in path.read_text().splitlines():
        if line.startswith(";"):
            continue
        fields = line.split("|")
        if len(fields) >= 2:
            out[fields[0].strip()] = fields[1].strip()
    return out


def prepare_libritts(
    corpus_dir: Pathlike, dataset_parts: Union[str, Sequence[str]] = "all",
    output_dir: Optional[Pathlike] = None, num_jobs: int = 1, link_previous_utt: bool = False,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """
    Prepare per-split manifests; supervisions carry the normalized text as
    ``text`` and the original text + SNR (and, optionally, the previous
    utterance id for chain reconstruction) in ``custom``.
    """
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    if dataset_parts == "all" or dataset_parts[0] == "all":
        dataset_parts = LIBRITTS
    elif isinstance(dataset_parts, str):
        assert dataset_parts in LIBRITTS
        dataset_parts = [dataset_parts]

    manifests = {}
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        manifests = read_manifests_if_cached(
            dataset_parts=dataset_parts, output_dir=output_dir, prefix="libritts")

    spk2gender = _read_speakers(corpus_dir)

    for part in dataset_parts:
        if manifests_exist(part=part, output_dir=output_dir, prefix="libritts"):
            logging.info(f"LibriTTS subset: {part} already prepared - skipping.")
            continue
        part_path = corpus_dir / part
        # Skip macOS resource forks and the known-corrupted file.
        recordings = RecordingSet.from_dir(
            part_path, "*.wav", num_jobs=num_jobs,
            exclude_pattern=r"^(\._.+|1092_134562_000013_000004\.wav)$")
        supervisions = []
        for trans_path in sorted(part_path.rglob("*.trans.tsv")):
            if re.match(r"^\._.+$", trans_path.name):
                continue
            book_path = trans_path.parent / trans_path.name.replace(".trans.tsv", ".book.tsv")
            utt2snr = {}
            uttids = []
            if book_path.is_file():
                for fields in map(str.split, book_path.read_text().splitlines()):
                    if len(fields) >= 2:
                        uttids.append(fields[0])
                        utt2snr[fields[0]] = float(fields[-1])
            utt2prevutt = (dict(zip(uttids + [None], [None] + uttids)) if link_previous_utt else {})

            prev_rec_id = None
            for line in trans_path.read_text().splitlines():
                rec_id, orig_text, norm_text = line.split("\t")
                if rec_id not in recordings:
                    logging.warning(
                        f"No recording exists for utterance id {rec_id}, "
                        f"skipping (in {trans_path})"
                    )
                    continue
                spk_id = rec_id.split("_")[0]
                customd = {"orig_text": orig_text, "snr": utt2snr.get(rec_id)}
                if link_previous_utt:
                    prev_utt = utt2prevutt.get(rec_id)
                    customd["prev_utt"] = (prev_utt if prev_utt == prev_rec_id else None)
                    prev_rec_id = rec_id
                supervisions.append(
                    SupervisionSegment(
                        id=rec_id,
                        recording_id=rec_id,
                        start=0.0,
                        duration=recordings[rec_id].duration,
                        channel=0,
                        language="English",
                        text=norm_text,
                        speaker=spk_id,
                        gender=spk2gender.get(spk_id),
                        custom=customd,
                    )
                )

        recordings, supervisions = fix_manifests(
            recordings, SupervisionSet.from_segments(supervisions))
        validate_recordings_and_supervisions(recordings, supervisions)
        if output_dir is not None:
            for kind, manifest in (("recordings", recordings), ("supervisions", supervisions)):
                manifest.to_file(output_dir / f"libritts_{kind}_{part}.jsonl.gz")
        manifests[part] = {"recordings": recordings, "supervisions": supervisions}
    return manifests


prepare_librittsr = prepare_libritts
