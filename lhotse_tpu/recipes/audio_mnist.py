"""
AudioMNIST: 30k spoken-digit recordings (60 speakers x 10 digits x 50 takes,
48 kHz mono), distributed as a GitHub repo.

Layout (functional parity target: ``lhotse/recipes/audio_mnist.py``)::

    AudioMNIST/data/
      audioMNIST_meta.txt     # JSON: speaker id -> {age, gender, accent, ...}
      01/ .. 60/              # <digit>_<speaker>_<take>.wav
"""
import logging
import os
import tarfile
from pathlib import Path
from typing import Dict, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.serialization import load_json
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download

AUDIO_MNIST_URL = "https://github.com/soerenab/AudioMNIST/archive/refs/heads/master.tar.gz"

_DIGIT_WORDS = ("zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine")


def download_audio_mnist(target_dir: Pathlike = ".", force_download: bool = False) -> Path:
    """Fetch the AudioMNIST GitHub tarball and extract it."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    archive = target_dir / "master.tar.gz"
    resumable_download(AUDIO_MNIST_URL, archive, force_download=force_download)
    out_dir = target_dir / "AudioMNIST"
    if not out_dir.exists():
        logging.info(f"Untarring {archive.name}.")
        with tarfile.open(archive) as tar:
            tar.extractall(path=target_dir)
        os.rename(str(target_dir / "AudioMNIST-master"), str(out_dir))
    return out_dir


def prepare_audio_mnist(
    corpus_dir: Pathlike, output_dir: Pathlike) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """AudioMNIST manifests; speaker metadata lands in supervision.custom."""
    data_dir = Path(corpus_dir) / "data"
    meta_path = data_dir / "audioMNIST_meta.txt"
    if not meta_path.is_file():
        raise AssertionError(f"Missing speaker metadata file: {meta_path}")
    speakers = load_json(meta_path)

    recordings = RecordingSet.from_recordings(
        Recording.from_file(path=wav, recording_id=wav.stem)
        for spk_id in sorted(speakers)
        for wav in (data_dir / spk_id).rglob("*.wav")
    )

    supervisions = []
    for rec in recordings:
        digit, spk_id, _ = rec.id.split("_")
        supervisions.append(
            SupervisionSegment(
                id=rec.id,
                recording_id=rec.id,
                start=0,
                duration=rec.duration,
                channel=0,
                text=_DIGIT_WORDS[int(digit)],
                language="English",
                speaker=spk_id,
                custom=speakers[spk_id],
            )
        )

    # The reference writes this corpus without a part suffix; keep "all".
    return finalize_manifests(
        recordings, supervisions, output_dir=output_dir, prefix="audio_mnist", part="all")
