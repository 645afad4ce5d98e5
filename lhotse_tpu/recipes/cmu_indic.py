"""
CMU INDIC — 13 phonetically-balanced single-speaker TTS databases across
8 Indian languages (http://festvox.org/cmu_indic/).

Reference behavior: `/root/reference/lhotse/recipes/cmu_indic.py`
(download_cmu_indic :70-103 — per-speaker festvox tarballs;
prepare_cmu_indic :105-180 — txt.done.data transcripts, language from the
speaker prefix, 'arctic' utterances marked English with the language as
accent, age read from voice.feats when present).
"""
import logging
import shutil
import tarfile
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

BASE_URL = "http://festvox.org/h2r_indic/"

SPEAKERS = (
    "ben_rm", "guj_ad", "guj_dp", "guj_kt", "hin_ab", "kan_plv", "mar_aup", "mar_slp",
    "pan_amp", "tam_sdr", "tel_kpn", "tel_sk", "tel_ss")

GENDER_MAP = {
    "tel_kpn": "F", "hin_ab": "F", "kan_plv": "F", "ben_rm": "F", "guj_ad": "M",
    "mar_slp": "F", "guj_dp": "F", "tam_sdr": "F", "guj_kt": "F", "pan_amp": "F",
    "tel_ss": "F", "tel_sk": "M", "mar_aup": "M"}

LANGUAGE_MAP = {
    "ben": "Bengali", "guj": "Gujarati", "kan": "Kannada", "hin": "Hindi",
    "mar": "Marathi", "pan": "Punjabi", "tam": "Tamil", "tel": "Telugu"}


def download_cmu_indic(
    target_dir: Pathlike = ".", speakers: Sequence[str] = SPEAKERS,
    force_download: Optional[bool] = False, base_url: Optional[str] = BASE_URL) -> Path:
    """Fetch and untar the per-speaker festvox packages."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    for spk in speakers:
        name = f"cmu_indic_{spk}"
        part_dir = target_dir / name
        marker = part_dir / ".completed"
        if marker.is_file():
            logging.info(f"Skipping {spk} because {marker} exists.")
            continue
        tar_path = target_dir / f"{name}.tar.bz2"
        resumable_download(
            f"{base_url}{name}.tar.bz2", filename=tar_path, force_download=force_download)
        shutil.rmtree(part_dir, ignore_errors=True)
        with tarfile.open(tar_path) as tar:
            safe_extract(tar, path=target_dir)
        marker.touch()
    return target_dir


def _speaker_of(dirname: str) -> str:
    # "cmu_indic_ben_rm" -> "ben_rm"
    return dirname.split("_", maxsplit=2)[2]


def _read_age(voice_feats: Path) -> Optional[int]:
    try:
        return int(voice_feats.read_text().splitlines()[1].replace("age ", "").strip())
    except Exception:
        return None


def prepare_cmu_indic(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """Single-part manifests across every unpacked cmu_indic_* package."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    recordings = RecordingSet.from_recordings(
        Recording.from_file(
            wav, recording_id=f"{_speaker_of(wav.parent.parent.name)}-{wav.stem}")
        for wav in corpus_dir.rglob("*.wav"))

    supervisions = []
    for path in corpus_dir.rglob("txt.done.data"):
        speaker = _speaker_of(path.parent.parent.name)
        language = LANGUAGE_MAP[speaker.split("_")[0]]
        age = _read_age(path.parent / "voice.feats")
        for line in path.read_text().splitlines():
            line = line[2:-2]  # strip "( " and " )"
            seg_id, text = line.split(maxsplit=1)
            seg_id = f"{speaker}-{seg_id}"
            is_english = "arctic" in seg_id  # English arctic prompts read with accent
            custom = {}
            if is_english:
                custom["accent"] = language
            if age is not None:
                custom["age"] = age
            supervisions.append(
                SupervisionSegment(
                    id=seg_id, recording_id=seg_id, start=0,
                    duration=recordings[seg_id].duration, text=text.replace('"', ""),
                    language="English" if is_english else language, speaker=speaker,
                    gender=GENDER_MAP.get(speaker), custom=custom or None))
    return finalize_manifests(
        recordings, supervisions, output_dir=output_dir, prefix="cmu-indic", part="all")
