"""
HI-MIA (openslr/85) + HI-MIA-CW (openslr/120) — far-field text-dependent
speaker verification: the Chinese wake word 你好米雅 plus confusion-word
negatives.

Reference behavior: `/root/reference/lhotse/recipes/himia.py`
(download_himia :64-124 — per-part tars off openslr 85/120 with the CW parts
nested under cw_test/; _prepare_train_dev_test :128-168 — wav lists come
from ``{part}.scp``/``wav.scp``; _prepare_cw_test :170-213 — transcripts at
cw_test/resource/transcription.txt; wake-word text is constant).
"""
import logging
import shutil
import tarfile
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

SOURCE_FILE = {
    "train": "train.tar.gz", "dev": "dev.tar.gz", "test": "test_v2.tar.gz",
    "data": "data.tgz", "resource": "resource.tgz"}
EXTRACTED_FOLDER = {
    "train": "train", "dev": "dev", "test": "test", "data": "16k_wav_file",
    "resource": "resource"}
CW_PARTS = ["cw_test"]
CW_SOURCE_FILE_LIST = ["data", "resource"]
CW_FILES = ["data.tgz", "resource.tgz"]
HI_MIA_PARTS = ["train", "dev", "test"]
HI_MIA_AND_CW_PARTS = HI_MIA_PARTS + CW_PARTS

_WAKE_WORD = "你好米雅"
_TOTAL_NUM_WAVS = {"train": 993083, "dev": 164640, "test": 165120, "cw_test": 16343}


def _validate_dataset_parts(dataset_parts) -> None:
    valid = set(HI_MIA_AND_CW_PARTS) | {"auto", "himia"}
    names = [dataset_parts] if isinstance(dataset_parts, str) else list(dataset_parts)
    for name in names:
        assert name in valid, (
            f"{name} is not a valid subset. You may want to select one from "
            f"{HI_MIA_AND_CW_PARTS + ['auto', 'himia']}")


def _resolve_parts(dataset_parts) -> Sequence[str]:
    if dataset_parts == "auto":
        return HI_MIA_AND_CW_PARTS
    if dataset_parts == "himia":
        return HI_MIA_PARTS
    if isinstance(dataset_parts, str):
        return [dataset_parts]
    return list(dataset_parts)


def download_himia(
    target_dir: Pathlike = ".", dataset_parts: Optional[Union[str, Sequence[str]]] = "auto",
    force_download: bool = False, base_url: str = "http://www.openslr.org/resources",
) -> Path:
    """Fetch and untar the requested HI-MIA / HI-MIA-CW archives."""
    target_dir = Path(target_dir)
    corpus_dir = target_dir / "HiMia"
    _validate_dataset_parts(dataset_parts)
    requested = _resolve_parts(dataset_parts)
    files_to_download = []
    for name in requested:
        files_to_download.extend(CW_SOURCE_FILE_LIST if name == "cw_test" else [name])

    for part in files_to_download:
        tar_name = SOURCE_FILE[part]
        ext_name = EXTRACTED_FOLDER[part]
        is_cw = tar_name in CW_FILES
        url = f"{base_url}/{120 if is_cw else 85}"
        dest_dir = (corpus_dir / "cw_test" / ext_name) if is_cw else (corpus_dir / ext_name)
        marker = dest_dir / ".completed"
        if marker.is_file():
            logging.info(f"Skipping {tar_name} because {marker} exists.")
            continue
        tar_path = target_dir / tar_name
        resumable_download(f"{url}/{tar_name}", filename=tar_path, force_download=force_download)
        logging.info(f"Extracting {tar_name}.")
        shutil.rmtree(dest_dir, ignore_errors=True)
        extract_into = dest_dir if tar_name == "resource.tgz" else dest_dir.parent
        extract_into.mkdir(parents=True, exist_ok=True)
        with tarfile.open(tar_path) as tar:
            safe_extract(tar, path=extract_into)
        marker.touch()
    return corpus_dir


def _prepare_train_dev_test(
    corpus_dir: Path, part: str) -> Tuple[RecordingSet, SupervisionSet]:
    logging.info(f"Processing HI_MIA subset: {part}")
    suffix_path = "" if part == "test" else "SPEECHDATA"
    scp_name = "wav" if part == "test" else part
    scp_dir = corpus_dir / part / suffix_path
    wav_scp_path = scp_dir / f"{scp_name}.scp"
    assert wav_scp_path.is_file(), f"{wav_scp_path}"
    wav_subdir = "wav/" if part == "test" else ""

    recordings, supervisions = [], []
    for wav_entry in wav_scp_path.read_text().splitlines():
        wav_entry = wav_entry.strip()
        if not wav_entry:
            continue
        audio_path = (scp_dir / wav_subdir / wav_entry).resolve()
        if not audio_path.is_file():
            logging.warning(f"No such file: {audio_path}")
            continue
        recording = Recording.from_file(audio_path)
        recordings.append(recording)
        name = audio_path.stem
        supervisions.append(
            SupervisionSegment(
                id=name, recording_id=name, start=0.0, duration=recording.duration,
                channel=0, language="Chinese", speaker=name.split("_")[0],
                text=_WAKE_WORD))
    out = finalize_manifests(recordings, supervisions)
    return out["recordings"], out["supervisions"]


def _prepare_cw_test(corpus_path: Path) -> Tuple[RecordingSet, SupervisionSet]:
    logging.info("Processing HI_MIA_CW dataset")
    cw_test_path = corpus_path / "cw_test/16k_wav_file"
    transcripts = {}
    with open(corpus_path / "cw_test/resource/transcription.txt", encoding="utf-8") as f:
        for line in f:
            fields = line.split()
            if fields:
                transcripts[fields[0]] = " ".join(fields[1:])
    if len(transcripts) != _TOTAL_NUM_WAVS["cw_test"]:
        logging.warning(
            f"Expected {_TOTAL_NUM_WAVS['cw_test']} CW transcripts, "
            f"found {len(transcripts)}")

    recordings, supervisions = [], []
    for wav_name, text in transcripts.items():
        audio_path = (cw_test_path / wav_name).resolve()
        assert audio_path.is_file(), f"{audio_path} does not exist."
        recording = Recording.from_file(audio_path)
        recordings.append(recording)
        name = audio_path.stem
        supervisions.append(
            SupervisionSegment(
                id=name, recording_id=name, start=0.0, duration=recording.duration,
                channel=0, language="Chinese", speaker=name.split("_")[0],
                text=text.strip()))
    out = finalize_manifests(recordings, supervisions)
    return out["recordings"], out["supervisions"]


def prepare_himia(
    corpus_dir: Pathlike, dataset_parts: Union[str, Sequence[str]] = "auto",
    output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Per-part manifests for HI-MIA (train/dev/test) and HI-MIA-CW (cw_test)."""
    _validate_dataset_parts(dataset_parts)
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)

    manifests = {}
    for part in _resolve_parts(dataset_parts):
        if part == "cw_test":
            recordings, supervisions = _prepare_cw_test(corpus_dir)
        else:
            recordings, supervisions = _prepare_train_dev_test(corpus_dir, part)
        if output_dir is not None:
            supervisions.to_file(output_dir / f"himia_supervisions_{part}.jsonl.gz")
            recordings.to_file(output_dir / f"himia_recordings_{part}.jsonl.gz")
        manifests[part] = {"recordings": recordings, "supervisions": supervisions}
    return manifests
