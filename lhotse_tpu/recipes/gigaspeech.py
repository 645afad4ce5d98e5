"""
GigaSpeech recipe — 10k-hour English ASR corpus distributed through the
``speechcolab`` SDK (gated; requires a corpus password).

Reference behavior: `/root/reference/lhotse/recipes/gigaspeech.py:30-173` —
the SDK serves per-audio JSON entries (aid/path/sample_rate/segments with
begin/end/speaker/text_tn); manifests are written lazily (recordings,
supervisions, and cuts) since the XL subset is too large to hold eagerly.
``parse_utterance`` is SDK-independent and tested directly.
"""
import logging
from itertools import repeat
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

from lhotse_tpu import CutSet, fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.audio import AudioSource, Recording, RecordingSet
from lhotse_tpu.parallel import parallel_map
from lhotse_tpu.recipes.utils import manifests_exist, read_manifests_if_cached
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import (Pathlike, Seconds, compute_num_samples, is_module_available)

GIGASPEECH_PARTS = ("XL", "L", "M", "S", "XS", "DEV", "TEST")


def _require_speechcolab():
    if not is_module_available("speechcolab"):
        raise ImportError(
            "To process the GigaSpeech corpus, please install the optional "
            "dependency: pip install speechcolab"
        )
    from speechcolab.datasets.gigaspeech import GigaSpeech

    return GigaSpeech


def download_gigaspeech(
    password: str, target_dir: Pathlike = ".",
    dataset_parts: Optional[Union[str, Sequence[str]]] = "auto", host: Optional[str] = "tsinghua",
) -> Path:
    GigaSpeech = _require_speechcolab()
    gigaspeech = GigaSpeech(target_dir)
    if dataset_parts == "auto":
        dataset_parts = ("XL", "DEV", "TEST")
    elif isinstance(dataset_parts, str):
        dataset_parts = [dataset_parts]
    for part in dataset_parts:
        logging.info(f"Downloading GigaSpeech part: {part}")
        gigaspeech.download(password, "{" + part + "}", host=host)
    return Path(target_dir)


def parse_utterance(
    audio: Any, root_path: Path) -> Optional[Tuple[Recording, List[SupervisionSegment]]]:
    """One SDK JSON audio entry -> (Recording, [SupervisionSegment])."""
    sampling_rate = int(audio["sample_rate"])
    recording = Recording(
        id=audio["aid"],
        sources=[ AudioSource( type="file", channels=list(range(int(audio["channels"]))), source=str(Path(root_path) / audio["path"]), ) ],
        num_samples=compute_num_samples( duration=Seconds(audio["duration"]), sampling_rate=sampling_rate ),
        sampling_rate=sampling_rate, duration=Seconds(audio["duration"]))
    segments = [
        SupervisionSegment(
            id=seg["sid"],
            recording_id=audio["aid"],
            start=Seconds(seg["begin_time"]),
            duration=round(
                Seconds(seg["end_time"] - seg["begin_time"]), ndigits=8
            ),
            channel=0,
            language="English",
            speaker=seg["speaker"],
            text=seg["text_tn"],
        )
        for seg in audio["segments"]
    ]
    return recording, segments


def prepare_gigaspeech(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike],
    dataset_parts: Union[str, Sequence[str]] = "auto", num_jobs: int = 1,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet, CutSet]]]:
    """Prepare lazily-written recordings/supervisions/cuts manifests."""
    GigaSpeech = _require_speechcolab()
    subsets = ("XL", "DEV", "TEST") if dataset_parts == "auto" else dataset_parts
    if isinstance(subsets, str):
        subsets = [subsets]
    corpus_dir = Path(corpus_dir)
    gigaspeech = GigaSpeech(corpus_dir)

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    # types includes "cuts": the reference (gigaspeech.py:80-86) uses the
    # default (recordings, supervisions) and silently loses the cuts manifest
    # from its return value on a cached re-run.
    manifests = read_manifests_if_cached(
        dataset_parts=subsets, output_dir=output_dir, prefix="gigaspeech", suffix="jsonl.gz",
        types=("recordings", "supervisions", "cuts"), lazy=True)

    for part in subsets:
        logging.info(f"Processing GigaSpeech subset: {part}")
        if manifests_exist(
            part=part, output_dir=output_dir, prefix="gigaspeech", suffix="jsonl.gz"):
            logging.info(f"GigaSpeech subset: {part} already prepared - skipping.")
            continue
        out_of = lambda kind: output_dir / f"gigaspeech_{kind}_{part}.jsonl.gz"
        with RecordingSet.open_writer(out_of("recordings")) as rec_writer, \
                SupervisionSet.open_writer(out_of("supervisions")) as sup_writer, \
                CutSet.open_writer(out_of("cuts")) as cut_writer:
            for recording, segments in parallel_map(
                parse_utterance, gigaspeech.audios("{" + part + "}"),
                repeat(gigaspeech.gigaspeech_dataset_dir), num_jobs=num_jobs):
                one_rec = RecordingSet.from_recordings([recording])
                one_rec, segments = fix_manifests(
                    recordings=one_rec, supervisions=SupervisionSet.from_segments(segments))
                validate_recordings_and_supervisions(recordings=one_rec, supervisions=segments)
                rec_writer.write(one_rec[0])
                for seg in segments:
                    sup_writer.write(seg)
                cuts = CutSet.from_manifests(recordings=one_rec, supervisions=segments)
                cut_writer.write(cuts[0])
        manifests[part] = {
            "recordings": RecordingSet.from_jsonl_lazy(rec_writer.path),
            "supervisions": SupervisionSet.from_jsonl_lazy(sup_writer.path),
            "cuts": CutSet.from_jsonl_lazy(cut_writer.path)}
    return dict(manifests)
