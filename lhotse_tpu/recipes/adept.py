"""
ADEPT: a benchmark of prosodically marked-up English speech for evaluating
prosody transfer in TTS (Zenodo record 5117102).

Layout (functional parity target: ``lhotse/recipes/adept.py``)::

    ADEPT/
      wav_44khz/<annotation_type>/<label>/<prompt>.wav
      txt/<annotation_type>/<label>/<prompt>.txt
      adept_prompts.json        # interpretation texts per prompt/label
"""
import json
import logging
import shutil
import zipfile
from pathlib import Path
from typing import Optional

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment
from lhotse_tpu.utils import Pathlike, resumable_download

ADEPT_URL = "https://zenodo.org/record/5117102/files/ADEPT.zip"


def download_adept(target_dir: Pathlike = ".", force_download: bool = False) -> Path:
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "ADEPT"
    marker = corpus_dir / ".completed"
    if marker.is_file():
        logging.info(f"Skipping downloading ADEPT because {marker} exists.")
        return corpus_dir
    zip_path = target_dir / "ADEPT.zip"
    resumable_download(ADEPT_URL, filename=zip_path, force_download=force_download)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(path=corpus_dir)
    marker.touch()
    return corpus_dir


def _flat_id(path: Path) -> str:
    # .../<annotation_type>/<label>/<prompt>.wav -> type_label_prompt
    return str(path.relative_to(path.parent.parent.parent))[:-4].replace("/", "_")


def prepare_adept(corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None):
    """ADEPT manifests; prosody class/label/interpretation in custom fields."""
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")
    recordings = RecordingSet.from_recordings(
        Recording.from_file(path=wav, recording_id=_flat_id(wav))
        for wav in (corpus_dir / "wav_44khz").rglob("*.wav")
    )
    interpretations = json.loads((corpus_dir / "adept_prompts.json").read_text())

    supervisions = []
    for txt in (corpus_dir / "txt").rglob("*.txt"):
        annotation_type, label, prompt_id = str(
            txt.relative_to(txt.parent.parent.parent)
        )[:-4].split("/")
        rec_id = f"{annotation_type}_{label}_{prompt_id}"
        custom = {"type": annotation_type, "label": label, "prompt_id": prompt_id}
        group = interpretations.get(annotation_type)
        if group:
            custom["text"] = group[prompt_id][label]
        rec = recordings[rec_id]
        supervisions.append(
            SupervisionSegment(
                id=rec_id,
                recording_id=rec_id,
                start=0,
                duration=rec.duration,
                channel=0,
                text=txt.read_text().strip(),
                language="English",
                speaker=f"ADEPT_{prompt_id.split('_')[0]}",
                custom=custom,
            )
        )
    return finalize_manifests(
        recordings, supervisions, output_dir=output_dir, prefix="adept", part="all")
