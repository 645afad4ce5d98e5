"""
VoxConverse: speaker diarization on YouTube "in the wild" audio (dev + test
wav releases, RTTM annotations from the companion GitHub repo).

Functional parity target: ``lhotse/recipes/voxconverse.py`` (including the
optional re-split of the larger test part into dev/test halves).
"""
import shutil
import zipfile
from pathlib import Path
from typing import Dict, Optional

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, resumable_download

DEV_AUDIO_ZIP = ("https://www.robots.ox.ac.uk/~vgg/data/voxconverse/data/voxconverse_dev_wav.zip")
TEST_AUDIO_ZIP = ("https://www.robots.ox.ac.uk/~vgg/data/voxconverse/data/voxconverse_test_wav.zip")
ANNOTATIONS_ZIP = "https://github.com/joonson/voxconverse/archive/master.zip"


def _fetch_and_flatten(url: str, corpus_dir: Path, zip_name: str, inner: str, dest: str):
    resumable_download(url, corpus_dir / zip_name)
    with zipfile.ZipFile(corpus_dir / zip_name) as zf:
        zf.extractall(corpus_dir / dest if inner else corpus_dir)
    if inner:
        shutil.copytree(corpus_dir / dest / inner, corpus_dir / dest, dirs_exist_ok=True)
        shutil.rmtree(corpus_dir / dest / inner)
    (corpus_dir / zip_name).unlink()


def download_voxconverse(corpus_dir: Pathlike, force_download: bool = False):
    corpus_dir = Path(corpus_dir)
    corpus_dir.mkdir(parents=True, exist_ok=True)
    marker = corpus_dir / ".completed"
    if marker.is_file() and not force_download:
        return
    _fetch_and_flatten(DEV_AUDIO_ZIP, corpus_dir, "dev.zip", "audio", "dev")
    _fetch_and_flatten(TEST_AUDIO_ZIP, corpus_dir, "test.zip", "voxconverse_test_wav", "test")
    resumable_download(ANNOTATIONS_ZIP, corpus_dir / "annotations.zip")
    with zipfile.ZipFile(corpus_dir / "annotations.zip") as zf:
        zf.extractall(corpus_dir)
    shutil.copytree(corpus_dir / "voxconverse-master", corpus_dir, dirs_exist_ok=True)
    shutil.rmtree(corpus_dir / "voxconverse-master")
    (corpus_dir / "annotations.zip").unlink()
    marker.touch()


def _speaker_turns(rttm: Path):
    for line in rttm.read_text().splitlines():
        if line.strip().startswith("SPEAKER"):
            fields = line.split()
            yield float(fields[3]), float(fields[4]), fields[7]


def prepare_voxconverse(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None, split_test: bool = False,
) -> Dict[str, Dict[str, object]]:
    """
    VoxConverse manifests.  With ``split_test`` the (larger) test release is
    halved into dev/test and the original dev release becomes train.
    """
    corpus_dir = Path(corpus_dir).absolute()
    if split_test:
        test_wavs = sorted((corpus_dir / "test").glob("*.wav"))
        half = len(test_wavs) // 2
        splits = {
            "train": sorted((corpus_dir / "dev").glob("*.wav")), "dev": test_wavs[:half],
            "test": test_wavs[half:]}
        rttm_dir_of = {"train": "dev", "dev": "test", "test": "test"}
    else:
        splits = {
            "dev": sorted((corpus_dir / "dev").glob("*.wav")),
            "test": sorted((corpus_dir / "test").glob("*.wav"))}
        rttm_dir_of = {"dev": "dev", "test": "test"}

    manifests = {}
    for subset, wavs in splits.items():
        recordings, supervisions = [], []
        for wav in wavs:
            rec = Recording.from_file(wav)
            recordings.append(rec)
            rttm = corpus_dir / rttm_dir_of[subset] / f"{wav.stem}.rttm"
            for k, (start, duration, speaker) in enumerate(_speaker_turns(rttm)):
                supervisions.append(
                    SupervisionSegment(
                        id=f"{rec.id}-{k}",
                        recording_id=rec.id,
                        start=start,
                        duration=duration,
                        channel=0,
                        language="en",
                        speaker=speaker,
                    )
                )
        manifests[subset] = finalize_manifests(
            recordings, supervisions, output_dir=output_dir, prefix="voxconverse", part=subset)
    return manifests
