"""
DailyTalk: 2,541 recorded two-speaker dialogues for conversational TTS
(https://github.com/keonlee9420/DailyTalk).

Layout (functional parity target: ``lhotse/recipes/daily_talk.py``)::

    dailytalk/
      metadata.json    # {dialog_idx: {utt_idx: {index, text, speaker, turn, ...}}}
      data/**/<utt>_<speaker>_d<dialog>.wav
"""
import logging
import zipfile
from pathlib import Path
from typing import Tuple

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.qa import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.serialization import load_json
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, is_module_available

DAILY_TALK_URL = (
    "https://drive.google.com/file/d/1nPrfJn3TcIVPc0Uf5tiAXUYLJceb_5k-/view?usp=sharing"
)


def make_recording_id(path: Path) -> str:
    return f"dailytalk_{path.stem}"


def download_daily_talk(target_dir: Pathlike, force_download: bool = False) -> Path:
    """Fetch the DailyTalk zip from Google Drive (needs gdown) and extract it."""
    if not is_module_available("gdown"):
        raise AssertionError(
            "Downloading DailyTalk requires 'pip install gdown' (Google Drive host)."
        )
    import gdown

    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    corpus_dir = target_dir / "dailytalk"
    corpus_zip = corpus_dir.with_suffix(".zip")
    if force_download or not corpus_zip.exists():
        logging.info(f"Running: gdown --fuzzy {DAILY_TALK_URL}")
        gdown.download(DAILY_TALK_URL, str(corpus_zip), fuzzy=True, quiet=False)
    else:
        logging.info(f"{corpus_zip} already exists. Skipping download.")
    if force_download or not corpus_dir.exists():
        logging.info(f"Extracting {corpus_zip} to {target_dir}")
        with zipfile.ZipFile(corpus_zip) as zf:
            zf.extractall(path=target_dir)
    return corpus_dir


def prepare_daily_talk(
    corpus_dir: Pathlike, output_dir: Pathlike = None, num_jobs: int = 1,
) -> Tuple[RecordingSet, SupervisionSet]:
    """
    DailyTalk manifests.  Dialogue metadata (turn/topic/emotion/act) lands in
    ``supervision.custom``; returns ``(recordings, supervisions)`` to mirror
    the reference's signature for this recipe.
    """
    corpus_dir = Path(corpus_dir)
    recordings = RecordingSet.from_dir(
        corpus_dir / "data", "*.wav", num_jobs=num_jobs, recording_id=make_recording_id)

    supervisions = []
    for dialog_idx, dialog in load_json(corpus_dir / "metadata.json").items():
        for utt_idx, utt in dialog.items():
            if utt["speaker"] not in (0, 1):
                raise AssertionError(f"Unknown speaker index: {utt['speaker']}")
            rec_id = f"dailytalk_{utt_idx}_{utt['speaker']}_d{dialog_idx}"
            supervisions.append(
                SupervisionSegment(
                    id=f"dailytalk_{utt['index']}",
                    recording_id=rec_id,
                    start=0.0,
                    duration=recordings[rec_id].duration,
                    channel=0,
                    text=utt["text"],
                    language="English",
                    speaker=f"dailytalk_spk{utt['speaker']}",
                    gender="F" if utt["speaker"] == 1 else "M",
                    custom={k: utt[k] for k in ("turn", "topic", "emotion", "act")},
                )
            )

    recordings, supervisions = fix_manifests(recordings, SupervisionSet.from_segments(supervisions))
    validate_recordings_and_supervisions(recordings, supervisions)
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(exist_ok=True, parents=True)
        recordings.to_file(output_dir / "dailytalk_recordings_all.jsonl.gz")
        supervisions.to_file(output_dir / "dailytalk_supervisions_all.jsonl.gz")
    return recordings, supervisions
