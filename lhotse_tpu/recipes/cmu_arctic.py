"""
CMU ARCTIC: phonetically balanced single-speaker TTS databases (~1150
utterances per speaker, 16 kHz).

Layout per speaker (functional parity target: ``lhotse/recipes/cmu_arctic.py``)::

    cmu_us_<spk>_arctic/
      wav/arctic_{a,b}NNNN.wav
      etc/txt.done.data      # ( arctic_a0001 "Prompt text." ) per line

Recording/supervision ids take the form ``<spk>-arctic_a0001``.
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

BASE_URL = "http://festvox.org/cmu_arctic/packed/"

SPEAKERS = (
    "aew", "ahw", "aup", "awb", "axb", "bdl", "clb", "eey", "fem", "gka", "jmk", "ksp", "ljm",
    "lnh", "rms", "rxr", "slp", "slt")

# Metadata that is readily documented; other speakers stay unannotated.
GENDERS = {
    "bdl": "male", "rms": "male", "jmk": "male", "awb": "male", "ksp": "male", "slt": "female",
    "clb": "female"}
ACCENTS = {
    "bdl": "US Midwest", "slt": "US Midwest", "clb": "US", "rms": "US", "jmk": "Canadian Ontario",
    "awb": "Scottish South Eastern", "ksp": "Indian"}
# Reference-compat name (reference: cmu_arctic.py:76).
ACCENT_MAP = ACCENTS


def _speaker_of(package_dir_name: str) -> str:
    # cmu_us_<spk>_arctic -> <spk>
    return package_dir_name.split("_")[2]


def download_cmu_arctic(
    target_dir: Pathlike = ".", speakers: Sequence[str] = SPEAKERS,
    force_download: Optional[bool] = False, base_url: Optional[str] = BASE_URL) -> Path:
    """Fetch + untar the per-speaker ARCTIC packages from festvox.org."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    for spk in speakers:
        package = f"cmu_us_{spk}_arctic"
        marker = target_dir / package / ".completed"
        if marker.is_file():
            logging.info(f"Skipping {spk}: {marker} exists.")
            continue
        archive = target_dir / f"{package}.tar.bz2"
        resumable_download(
            f"{base_url}{archive.name}", filename=archive, force_download=force_download)
        shutil.rmtree(target_dir / package, ignore_errors=True)
        with tarfile.open(archive) as tar:
            safe_extract(tar, path=target_dir)
        marker.touch()
    return target_dir


def prepare_cmu_arctic(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """CMU ARCTIC manifests over every downloaded speaker package."""
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")

    recordings = RecordingSet.from_recordings(
        Recording.from_file(
            wav, recording_id=f"{_speaker_of(wav.parent.parent.name)}-{wav.stem}"
        )
        for wav in corpus_dir.rglob("*.wav")
    )

    supervisions = []
    for prompts in corpus_dir.rglob("txt.done.data"):
        spk = _speaker_of(prompts.parent.parent.name)
        for line in prompts.read_text().splitlines():
            # Each line: ( arctic_a0001 "Author of the danger trail." )
            body = line.strip()[2:-2]
            utt, text = body.split(maxsplit=1)
            seg_id = f"{spk}-{utt}"
            supervisions.append(
                SupervisionSegment(
                    id=seg_id,
                    recording_id=seg_id,
                    start=0,
                    duration=recordings[seg_id].duration,
                    text=text.replace('"', ""),
                    language="English",
                    speaker=spk,
                    gender=GENDERS.get(spk),
                    custom={"accent": ACCENTS.get(spk)},
                )
            )

    # A handful of prompts have no recording (or vice versa) upstream.
    return finalize_manifests(
        recordings, supervisions, output_dir=output_dir, prefix="cmu-arctic", part="all")
