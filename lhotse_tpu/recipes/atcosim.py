"""
ATCOSIM — 10 h of English ATC operator speech from real-time simulations
(TU Graz / Eurocontrol), close-talk mic, ten non-native speakers.

Reference behavior: `/root/reference/lhotse/recipes/atcosim.py`
(download_atcosim :26-85 — ISO image extraction via pycdlib with MD5 pin;
text_normalize :95-129; prepare_atcosim :141-222 — rows of
TXTdata/fulldata.csv streamed straight into lazy manifest writers, corrupt
recordings skipped, duration snapped to a whole sample count).

Deviation: fulldata.csv is parsed with the csv module instead of pandas.
"""
import csv
import hashlib
import logging
import re
import shutil
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import (
    Pathlike, Seconds, compute_num_samples, is_module_available, resumable_download)

_ISO_URL = "https://www2.spsc.tugraz.at/databases/ATCOSIM/.ISO/atcosim.iso"
_ISO_MD5 = "cd5f0c82be46242a75d3382e340f6dca"

FIX_TYPOS = {"hm": "hmm", "ohh": "oh", "hallo": "hello", "viscinity": "vicinity"}

_FOREIGN = re.compile(r"<FL>\s*</FL>")
_OFF_TALK = re.compile(r"<OT>(.*?)</OT>")
_CUT_PREFIX = re.compile(r"=(\w+)")
_CUT_SUFFIX = re.compile(r"(\w+)=")
_MULTISPACE = re.compile(r"  +")
# Reference-compat names (reference: atcosim.py:96-100).
FOREIGN_PATTERN = _FOREIGN
OFF_TALK_PATTERN = _OFF_TALK
INTERRUPTED_PATTERN1 = _CUT_PREFIX
INTERRUPTED_PATTERN2 = _CUT_SUFFIX
WHITESPACE_PATTERN = _MULTISPACE


def download_atcosim(
    target_dir: Pathlike = ".", force_download: Optional[bool] = False) -> Path:
    """Fetch and unpack the corpus ISO image (requires pycdlib)."""
    if not is_module_available("pycdlib"):
        raise ImportError("Please 'pip install pycdlib' first.")
    import pycdlib

    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "atcosim"
    marker = corpus_dir / ".completed"
    if marker.is_file():
        logging.info(f"Skipping atcosim because {marker} exists.")
        return corpus_dir
    iso_path = target_dir / "atcosim.iso"
    resumable_download(
        _ISO_URL, filename=iso_path, completed_file_size=2597789696,
        force_download=force_download)
    if hashlib.md5(iso_path.read_bytes()).hexdigest() != _ISO_MD5:
        raise RuntimeError("MD5 checksum does not match")
    shutil.rmtree(corpus_dir, ignore_errors=True)

    iso = pycdlib.PyCdlib()
    iso.open(iso_path)
    flavor = (
        "udf" if iso.has_udf()
        else "rr" if iso.has_rock_ridge()
        else "joliet" if iso.has_joliet()
        else "iso")
    path_arg = flavor + "_path"
    queue = [iso.get_record(**{path_arg: "/"})]
    while queue:
        record = queue.pop()
        abs_path = iso.full_path_from_dirrecord(record, rockridge=flavor == "rr")
        rel_path = abs_path.lstrip("/")
        if record.is_dir():
            (corpus_dir / rel_path).mkdir(parents=True, exist_ok=True)
            queue.extend(
                child for child in iso.list_children(**{path_arg: abs_path})
                if child and not child.is_dot() and not child.is_dotdot())
        elif record.is_symlink():
            logging.warning("symlink not implemented")
        else:
            iso.get_file_from_iso(corpus_dir / rel_path, **{path_arg: abs_path})
    iso.close()
    marker.touch()
    return corpus_dir


def text_normalize(
    text: str, silence_sym: str, breath_sym: str, foreign_sym: str,
    partial_sym: Optional[str], unknown_sym: str) -> str:
    """ATCOSIM orthography -> plain uppercase words + event symbols."""
    text = _OFF_TALK.sub(r"\1", text)
    words = [
        w[1:] if w[0] in "@~" else FIX_TYPOS.get(w, w)
        for w in text.split()]
    text = " ".join(words).upper()
    text = text.replace("[EMPTY]", silence_sym).replace("[HNOISE]", breath_sym)
    text = _FOREIGN.sub(foreign_sym, text)
    if partial_sym is None:
        text = text.replace("=", "")
    else:
        text = _CUT_PREFIX.sub(partial_sym, text)
        text = _CUT_SUFFIX.sub(partial_sym, text)
    for unk in ("[FRAGMENT]", "[NONSENSE]", "[UNKNOWN]"):
        text = text.replace(unk, unknown_sym)
    text = text.replace("AIR SPACE", "AIRSPACE")
    return _MULTISPACE.sub(" ", text).strip()


def fix_duration(duration: Seconds, sampling_rate: int) -> Seconds:
    """Snap to a whole sample count so compute_num_frames stays consistent."""
    return compute_num_samples(duration, sampling_rate) / sampling_rate


def prepare_atcosim(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
    silence_sym: Optional[str] = "", breath_sym: Optional[str] = "",
    foreign_sym: Optional[str] = "<unk>", partial_sym: Optional[str] = "<unk>",
    unknown_sym: Optional[str] = "<unk>",
) -> Tuple[RecordingSet, SupervisionSet]:
    """Stream fulldata.csv rows into lazy recording/supervision manifests,
    returned as a (recordings, supervisions) tuple (reference parity)."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    if output_dir is None:
        raise ValueError("prepare_atcosim requires output_dir (manifests are streamed).")
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    csv_path = corpus_dir / "TXTdata/fulldata.csv"
    with open(csv_path, encoding="utf-8", newline="") as f, \
            RecordingSet.open_writer(
                output_dir / "atcosim_recordings_all.jsonl.gz", overwrite=True,
            ) as recs_writer, \
            SupervisionSet.open_writer(
                output_dir / "atcosim_supervisions_all.jsonl.gz", overwrite=True,
            ) as sups_writer:
        for row in csv.DictReader(f, quoting=csv.QUOTE_NONE):
            if row["recording_corrupt"] not in ("", "0", "False", "false"):
                continue
            text = text_normalize(
                row["transcription"], silence_sym=silence_sym, breath_sym=breath_sym,
                foreign_sym=foreign_sym, partial_sym=partial_sym,
                unknown_sym=unknown_sym)
            if not text:
                continue
            wav_path = (
                corpus_dir / "WAVdata" / row["directory"] / row["subdirectory"]
                / (row["filename"] + ".wav"))
            recording = Recording.from_file(wav_path, recording_id=row["recording_id"])
            length_sec = float(row["length_sec"])
            sups_writer.write(
                SupervisionSegment(
                    id=f"atcosim_{row['filename']}_{0:06d}_{int(length_sec * 100):06d}",
                    recording_id=row["recording_id"], start=0.0,
                    duration=fix_duration(length_sec, recording.sampling_rate),
                    channel=0, language="English", text=text,
                    speaker=row["speaker_id"], gender=row["speaker_id"][1].upper(),
                    custom={"orig_text": row["transcription"]}))
            recs_writer.write(recording)
    logging.warning(
        "Manifests are lazily materialized. You may want to call "
        "`lhotse_tpu.qa.fix_manifests()` to ensure that all supervisions fall "
        "within the corresponding recordings.")
    # NOTE: a (recordings, supervisions) TUPLE, matching the reference's
    # actual return (atcosim.py:254 — its docstring claims a dict, the code
    # returns a tuple; migrating users tuple-unpack it).
    return (
        RecordingSet.from_jsonl_lazy(recs_writer.path),
        SupervisionSet.from_jsonl_lazy(sups_writer.path),
    )
