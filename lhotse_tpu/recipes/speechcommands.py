"""
Google Speech Commands v0.01 / v0.02: one-second spoken command words plus
background-noise clips (https://arxiv.org/abs/1804.03209).

Layout (functional parity target: ``lhotse/recipes/speechcommands.py``)::

    SpeechCommands<V>/
      speech_commands_v0.0<V>/
        <word>/<speaker>_nohash_<take>.wav
        _background_noise_/*.wav
        validation_list.txt  testing_list.txt   # relative paths
      speech_commands_test_set_v0.0<V>/         # the official test release
        <word>/... (words outside the core set live under _unknown_/_silence_)

Splits: train = everything not in validation/testing lists; valid = the
validation list (+ one background clip); test = the separate test archive.
"""
import logging
import shutil
import tarfile
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download

_SPLITS = ("train", "valid", "test")
BACKGROUND_NOISE = "_background_noise_"

# The ten core command words of the classification task; in the official
# test archive, everything else lives flattened under the _unknown_ and
# _silence_ directories (reference: speechcommands.py:39-41,283-298).
WORDS = ["down", "go", "left", "no", "off", "on", "right", "stop", "up", "yes"]
SILENCE = "_silence_"
UNKNOWN = "_unknown_"


def _archive_names(version: str) -> Tuple[str, str]:
    return (f"speech_commands_v0.0{version}", f"speech_commands_test_set_v0.0{version}")


def download_speechcommands(
    speechcommands_version: str = "2", target_dir: Pathlike = ".", force_download: bool = False,
) -> Path:
    """Fetch + extract both Speech Commands archives (main + test set)."""
    target_dir = Path(target_dir)
    corpus_dir = target_dir / f"SpeechCommands{speechcommands_version}"
    corpus_dir.mkdir(parents=True, exist_ok=True)
    for part in _archive_names(speechcommands_version):
        part_dir = corpus_dir / part
        marker = part_dir / ".completed"
        if marker.is_file():
            logging.info(f"Skipping {part} because {marker} exists.")
            continue
        archive = corpus_dir / f"{part}.tar.gz"
        resumable_download(
            f"http://download.tensorflow.org/data/{archive.name}", filename=archive,
            force_download=force_download)
        shutil.rmtree(part_dir, ignore_errors=True)
        with tarfile.open(archive) as tar:
            tar.extractall(part_dir)
        marker.touch()
    return corpus_dir


def _relative_wavs(root: Path):
    for wav in root.rglob("*.wav"):
        yield str(wav.relative_to(root))


def _utterance(root: Path, rel_path: str):
    """One wav -> (Recording, SupervisionSegment)."""
    word, filename = rel_path.split("/", 1)
    rec_id = rel_path.replace("/", "_")[: -len(".wav")]
    rec = Recording.from_file(root / rel_path, recording_id=rec_id)
    if word in (BACKGROUND_NOISE, SILENCE):
        speaker, text = None, ""
    elif word == UNKNOWN:
        # Official test archive flattens unknown words into
        # _unknown_/<word>_<speaker>_nohash_<n>.wav.
        parts = filename.split("_")
        speaker = parts[1] if len(parts) > 1 else None
        text = parts[0].strip()
    else:
        speaker = filename.split("_")[0]
        text = word.strip()
    sup = SupervisionSegment(
        id=rec_id, recording_id=rec_id, start=0.0, duration=rec.duration, channel=0, text=text,
        language="English", speaker=speaker)
    return rec, sup


def prepare_speechcommands(
    speechcommands_version: str = "2", corpus_dir: Pathlike = ".",
    output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """Per-split (train/valid/test) Speech Commands manifests."""
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")
    main_name, test_name = _archive_names(speechcommands_version)
    main_root = corpus_dir / main_name
    test_root = corpus_dir / test_name

    held_out_test = set((main_root / "testing_list.txt").read_text().strip().splitlines())
    valid_paths = set((main_root / "validation_list.txt").read_text().strip().splitlines())
    # The published validation list carries no silence; add one noise clip.
    valid_paths.add(f"{BACKGROUND_NOISE}/running_tap.wav")
    train_paths = set(_relative_wavs(main_root)) - valid_paths - held_out_test

    split_sources = {
        "train": (main_root, sorted(train_paths)), "valid": (main_root, sorted(valid_paths)),
        "test": (test_root, sorted(_relative_wavs(test_root)) if test_root.is_dir() else [])}

    prefix = f"speechcommands{speechcommands_version}"
    manifests = {}
    for split, (root, paths) in split_sources.items():
        recordings, supervisions = [], []
        for rel in paths:
            if not (root / rel).is_file():
                logging.warning(f"No such file: {root / rel}")
                continue
            rec, sup = _utterance(root, rel)
            recordings.append(rec)
            supervisions.append(sup)
        if not recordings:
            continue
        manifests[split] = finalize_manifests(
            recordings, supervisions, output_dir=output_dir, prefix=prefix, part=split)
    return manifests
