"""
"RIRs and Noises" (OpenSLR 28): point-source noises, isotropic noises, real
RIRs (RWCP + REVERB 2014 + Aachen AIR), and simulated RIRs — the standard
reverberation/noise augmentation package.

Layout (functional parity target: ``lhotse/recipes/rir_noise.py``)::

    RIRS_NOISES/
      pointsource_noises/*.wav
      real_rirs_isotropic_noises/*.wav   # "*noise*" = iso noise, "*rir*" = RIR
      simulated_rirs/{small,medium,large}room/**/*.wav
"""
import logging
import zipfile
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.cut import CutSet
from lhotse_tpu.utils import Pathlike, resumable_download

RIR_NOISE_ZIP_URL = "https://www.openslr.org/resources/28/rirs_noises.zip"

_PART_DIRS = {
    "point_noise": "pointsource_noises", "iso_noise": "real_rirs_isotropic_noises",
    "real_rir": "real_rirs_isotropic_noises", "sim_rir": "simulated_rirs"}
# Reference-compat name (reference: rir_noise.py:60).
PARTS = _PART_DIRS


def download_rir_noise(
    target_dir: Pathlike = ".", url: Optional[str] = RIR_NOISE_ZIP_URL,
    force_download: Optional[bool] = False) -> Path:
    """Fetch + unzip rirs_noises.zip."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    zip_path = target_dir / "rirs_noises.zip"
    if zip_path.exists() and not force_download:
        logging.info(f"Skipping {zip_path.name} because file exists.")
    else:
        resumable_download(url, zip_path, force_download=force_download)
    out_dir = target_dir / "RIRS_NOISES"
    if not out_dir.exists():
        logging.info(f"Unzipping {zip_path.name}.")
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(target_dir)
    return out_dir


def _collect(part: str, audio_dir: Path) -> RecordingSet:
    if part == "sim_rir":
        # Room sizes reuse file names; prefix the room type to keep ids unique.
        recs = [
            Recording.from_file(wav, recording_id=f"{room}-{wav.stem}")
            for room in ("small", "medium", "large")
            for wav in (audio_dir / f"{room}room").rglob("*.wav")
        ]
        return RecordingSet.from_recordings(recs)
    wavs = audio_dir.rglob("*.wav")
    if part == "iso_noise":
        wavs = (w for w in wavs if "noise" in w.stem)
    elif part == "real_rir":
        wavs = (w for w in wavs if "rir" in w.stem)
    return RecordingSet.from_recordings(Recording.from_file(w) for w in wavs)


def prepare_rir_noise(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
    parts: Sequence[str] = ("point_noise", "iso_noise", "real_rir", "sim_rir"),
) -> Dict[str, Dict[str, Union[RecordingSet, CutSet]]]:
    """Per-part recording manifests for the RIR/noise package."""
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")
    if not parts:
        raise ValueError("No parts specified for manifest preparation.")
    if isinstance(parts, str):
        parts = [parts]

    manifests = {}
    for part in parts:
        if part not in _PART_DIRS:
            raise ValueError(f"Unknown RIR/noise part: {part}")
        audio_dir = corpus_dir / _PART_DIRS[part]
        if not audio_dir.is_dir():
            raise AssertionError(f"No such directory: {audio_dir}")
        manifests[part] = {"recordings": _collect(part, audio_dir)}

    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        for part, entry in manifests.items():
            for key, manifest in entry.items():
                manifest.to_file(output_dir / f"{part.replace('_', '-')}_{key}_all.jsonl.gz")
    return manifests
