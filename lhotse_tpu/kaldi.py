"""
Kaldi data-dir import/export.

Reference behavior: `/root/reference/lhotse/kaldi.py`
(floor_duration_to_milliseconds :23-41, get_duration :44-73,
load_kaldi_data_dir :76-294, export_to_kaldi :297-486,
load_start_and_duration :489-521, load_kaldi_text_file :524-545,
load_kaldi_text_mapping :548-560, save_kaldi_text_mapping :563-567,
make_wavscp_channel_string_map :570-624).
"""
import logging
import math
import warnings
from collections import defaultdict
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

from lhotse_tpu.audio import AudioSource, Recording, RecordingSet, info
from lhotse_tpu.features import Features, FeatureSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import (
    Pathlike,
    Seconds,
    add_durations,
    compute_num_samples,
    fastcopy,
    is_module_available,
    to_list,
)


def floor_duration_to_milliseconds(duration: float) -> float:
    """
    Floor the duration to multiples of 0.001 s to avoid float-precision
    mismatches downstream (supervision end vs cut end) — stays within the 2ms
    ASR validation tolerance.
    """
    return math.floor(1000 * duration) / 1000


def get_duration(path: Pathlike) -> Optional[float]:
    """
    Duration of an audio file or a Kaldi-style pipe command; None on a read
    error (so the caller can drop the recording).
    """
    path = str(path)
    if path.strip().endswith("|"):
        if not is_module_available("kaldi_native_io"):
            raise ValueError(
                "To read Kaldi's data dir where wav.scp has 'pipe' inputs, "
                "please 'pip install kaldi_native_io' first."
            )
        import kaldi_native_io

        try:
            wave = kaldi_native_io.read_wave(path)
            assert wave.data.shape[0] == 1, (
                f"Expect 1 channel. Given {wave.data.shape[0]}"
            )
            return floor_duration_to_milliseconds(wave.duration)
        except Exception:
            return None

    try:
        audio_info = info(path)
    except Exception:
        return None
    return floor_duration_to_milliseconds(audio_info.duration)


def load_kaldi_data_dir(
    path: Pathlike,
    sampling_rate: int,
    frame_shift: Optional[Seconds] = None,
    map_string_to_underscores: Optional[str] = None,
    use_reco2dur: bool = True,
    num_jobs: int = 1,
    feature_type: str = "kaldi-fbank",
) -> Tuple[RecordingSet, Optional[SupervisionSet], Optional[FeatureSet]]:
    """
    Load a Kaldi data directory into (RecordingSet, SupervisionSet?,
    FeatureSet?). Requires at least wav.scp; supervisions come from
    segments (or whole-recording utt2spk), features from feats.scp (needs
    kaldi_native_io + frame_shift).
    """
    path = Path(path)
    assert path.is_dir()

    def fix_id(t: Optional[str]) -> Optional[str]:
        if map_string_to_underscores is None or t is None:
            return t
        return t.replace(map_string_to_underscores, "_")

    recordings = load_kaldi_text_mapping(path / "wav.scp", must_exist=True)
    reco2dur = path / "reco2dur"
    if use_reco2dur and reco2dur.is_file():
        durations = load_kaldi_text_mapping(reco2dur, float_vals=True)
        assert len(durations) == len(recordings), (
            "The duration file reco2dur does not have the same length as the "
            "wav.scp file"
        )
    else:
        # Large chunks per child process avoid executor overhead/hangs on
        # very large datasets.
        chunksize = max(1, len(recordings) // (num_jobs * 10))
        if num_jobs == 1:
            dur_vals = [get_duration(p) for p in recordings.values()]
        else:
            with ProcessPoolExecutor(max_workers=num_jobs) as ex:
                dur_vals = list(
                    ex.map(get_duration, recordings.values(), chunksize=chunksize)
                )
        durations = dict(zip(recordings.keys(), dur_vals))

    for recording_id, dur_value in list(durations.items()):
        if dur_value is None:
            logging.warning(
                f"[{recording_id}] Could not get duration. Failed to read audio "
                f"from `{recordings[recording_id]}`. Dropping the recording "
                f"from manifest."
            )
            del recordings[recording_id]
    if len(recordings) < len(durations) * 0.8:
        raise RuntimeError(
            f'Failed to load more than 20% utterances of the dataset: "{path}"'
        )

    recording_set = RecordingSet.from_recordings(
        Recording(
            id=recording_id,
            sources=[
                AudioSource(
                    type="command" if path_or_cmd.endswith("|") else "file",
                    channels=[0],
                    source=(path_or_cmd[:-1] if path_or_cmd.endswith("|") else path_or_cmd),
                )
            ],
            sampling_rate=sampling_rate,
            num_samples=compute_num_samples(durations[recording_id], sampling_rate),
            duration=durations[recording_id],
        )
        for recording_id, path_or_cmd in recordings.items()
    )

    supervision_set = None
    segments = path / "segments"
    utt2spk_f = path / "utt2spk"
    feats_scp = path / "feats.scp"

    utt_id_to_start_and_duration = load_start_and_duration(
        segments_path=segments, feats_path=feats_scp, frame_shift=frame_shift
    )

    if segments.is_file():
        supervisions = []
        with segments.open() as f:
            supervision_segments = [sup_string.strip().split() for sup_string in f]

        texts = load_kaldi_text_file(path / "text", allow_empty_ref=True)
        speakers = load_kaldi_text_mapping(path / "utt2spk")
        genders = load_kaldi_text_mapping(path / "spk2gender")
        languages = load_kaldi_text_mapping(path / "utt2lang")

        for segment_id, recording_id, start, end in supervision_segments:
            if utt_id_to_start_and_duration:
                # duration computed from feats.scp
                _, duration = utt_id_to_start_and_duration[segment_id]
            else:
                # <end-time> of -1 means "until the end of the recording"
                duration = add_durations(
                    float(end) if end != "-1" else durations[recording_id],
                    -float(start),
                    sampling_rate=sampling_rate,
                )
            supervisions.append(
                SupervisionSegment(
                    id=fix_id(segment_id),
                    recording_id=recording_id,
                    start=float(start),
                    duration=duration,
                    channel=0,
                    text=texts.get(segment_id),
                    language=languages[segment_id],
                    speaker=fix_id(speakers[segment_id]),
                    gender=genders[speakers[segment_id]],
                )
            )
        supervision_set = SupervisionSet.from_segments(supervisions)
    elif utt2spk_f.is_file():
        # No segments file: supervisions span whole recordings.
        speakers = load_kaldi_text_mapping(path / "utt2spk")
        assert len(speakers) == len(recording_set)

        texts = load_kaldi_text_mapping(path / "text")
        genders = load_kaldi_text_mapping(path / "spk2gender")
        languages = load_kaldi_text_mapping(path / "utt2lang")
        supervision_set = SupervisionSet.from_segments(
            SupervisionSegment(
                id=fix_id(rec_id),
                recording_id=rec_id,
                start=0.0,
                duration=durations[rec_id],
                channel=0,
                text=texts[rec_id],
                language=languages[rec_id],
                speaker=fix_id(spkr),
                gender=genders[spkr],
            )
            for rec_id, spkr in speakers.items()
        )

    feature_set = None
    if feats_scp.exists() and is_module_available("kaldi_native_io"):
        if frame_shift is not None:
            import kaldi_native_io

            from lhotse_tpu.features.io import KaldiReader

            features = []
            with open(feats_scp) as f:
                for line in f:
                    utt_id, ark = line.strip().split(maxsplit=1)
                    mat_shape = kaldi_native_io.MatrixShape.read(ark)

                    if utt_id_to_start_and_duration:
                        start, duration = utt_id_to_start_and_duration[utt_id]
                    else:
                        start = 0
                        duration = mat_shape.num_rows * frame_shift

                    features.append(
                        Features(
                            type=feature_type,
                            num_frames=mat_shape.num_rows,
                            num_features=mat_shape.num_cols,
                            frame_shift=frame_shift,
                            sampling_rate=sampling_rate,
                            start=start,
                            duration=duration,
                            storage_type=KaldiReader.name,
                            storage_path=ark,
                            storage_key=utt_id,
                            recording_id=(
                                supervision_set[fix_id(utt_id)].recording_id
                                if supervision_set is not None
                                else utt_id
                            ),
                            channels=0,
                        )
                    )
            feature_set = FeatureSet.from_features(features)
        else:
            warnings.warn(
                "Failed to import Kaldi 'feats.scp': frame_shift must be not "
                "None. Feature import omitted."
            )

    return recording_set, supervision_set, feature_set


def export_to_kaldi(
    recordings: RecordingSet,
    supervisions: SupervisionSet,
    output_dir: Pathlike,
    map_underscores_to: Optional[str] = None,
    prefix_spk_id: Optional[bool] = False,
):
    """
    Export a compatible (RecordingSet, SupervisionSet) pair to a Kaldi data
    directory. Multi-channel recordings are broken into per-channel entries
    (not losslessly round-trippable).
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    if map_underscores_to is not None:
        supervisions = supervisions.map(
            lambda s: fastcopy(
                s,
                id=s.id.replace("_", map_underscores_to),
                speaker=s.speaker.replace("_", map_underscores_to),
            )
        )

    if prefix_spk_id:
        supervisions = supervisions.map(lambda s: fastcopy(s, id=f"{s.speaker}-{s.id}"))

    if all(r.num_channels == 1 for r in recordings):
        # Single channel: keep plain IDs so the export round-trips.
        save_kaldi_text_mapping(
            data={
                recording.id: make_wavscp_channel_string_map(
                    source,
                    sampling_rate=recording.sampling_rate,
                    transforms=recording.transforms,
                )[0]
                for recording in recordings
                for source in recording.sources
            },
            path=output_dir / "wav.scp",
        )
        save_kaldi_text_mapping(
            data={
                sup.id: f"{sup.recording_id} {sup.start} {sup.end}"
                for sup in supervisions
            },
            path=output_dir / "segments",
        )
        save_kaldi_text_mapping(
            data={recording.id: recording.duration for recording in recordings},
            path=output_dir / "reco2dur",
        )
        save_kaldi_text_mapping(
            data={sup.id: sup.text for sup in supervisions},
            path=output_dir / "text",
        )
        save_kaldi_text_mapping(
            data={sup.id: sup.speaker for sup in supervisions},
            path=output_dir / "utt2spk",
        )
        save_kaldi_text_mapping(
            data={sup.id: sup.duration for sup in supervisions},
            path=output_dir / "utt2dur",
        )
        if all(s.language is not None for s in supervisions):
            save_kaldi_text_mapping(
                data={sup.id: sup.language for sup in supervisions},
                path=output_dir / "utt2lang",
            )
        if all(s.gender is not None for s in supervisions):
            save_kaldi_text_mapping(
                data={sup.id: sup.gender for sup in supervisions},
                path=output_dir / "utt2gender",
            )
    else:
        save_kaldi_text_mapping(
            data={
                f"{recording.id}_{channel}": make_wavscp_channel_string_map(
                    source,
                    sampling_rate=recording.sampling_rate,
                    transforms=recording.transforms,
                )[channel]
                for recording in recordings
                for source in recording.sources
                for channel in source.channels
            },
            path=output_dir / "wav.scp",
        )
        save_kaldi_text_mapping(
            data={
                f"{recording.id}_{channel}": recording.duration
                for recording in recordings
                for source in recording.sources
                for channel in source.channels
            },
            path=output_dir / "reco2dur",
        )
        save_kaldi_text_mapping(
            data={
                sup.id + f"-{channel}": f"{sup.recording_id}_{channel} {sup.start} {sup.end}"
                for sup in supervisions
                for channel in to_list(sup.channel)
            },
            path=output_dir / "segments",
        )
        save_kaldi_text_mapping(
            data={
                sup.id + f"-{channel}": sup.text
                for sup in supervisions
                for channel in to_list(sup.channel)
            },
            path=output_dir / "text",
        )
        save_kaldi_text_mapping(
            data={
                sup.id + f"-{channel}": sup.speaker
                for sup in supervisions
                for channel in to_list(sup.channel)
            },
            path=output_dir / "utt2spk",
        )
        save_kaldi_text_mapping(
            data={
                sup.id + f"-{channel}": sup.duration
                for sup in supervisions
                for channel in to_list(sup.channel)
            },
            path=output_dir / "utt2dur",
        )
        if all(s.language is not None for s in supervisions):
            save_kaldi_text_mapping(
                data={
                    sup.id + f"-{channel}": sup.language
                    for sup in supervisions
                    for channel in to_list(sup.channel)
                },
                path=output_dir / "utt2lang",
            )
        if all(s.gender is not None for s in supervisions):
            save_kaldi_text_mapping(
                data={
                    sup.id + f"-{channel}": sup.gender
                    for sup in supervisions
                    for channel in to_list(sup.channel)
                },
                path=output_dir / "utt2gender",
            )


def load_start_and_duration(
    segments_path: Path = None,
    feats_path: Path = None,
    frame_shift: Optional[Seconds] = None,
) -> Dict[str, Tuple[float, float]]:
    """
    Start times from segments + durations from feats.scp matrix shapes, when
    both are available (keeps supervisions aligned with stored features).
    """
    utt_id_to_start_and_duration = {}
    if (
        segments_path.is_file()
        and feats_path.is_file()
        and is_module_available("kaldi_native_io")
        and frame_shift is not None
    ):
        import kaldi_native_io

        with segments_path.open() as segments_f, feats_path.open() as feats_f:
            for segments_line, feats_line in zip(segments_f, feats_f):
                segment_id, _, start, _ = segments_line.strip().split()
                utt_id, ark = feats_line.strip().split(maxsplit=1)
                if segment_id != utt_id:
                    raise ValueError(f"{segments_path} and {feats_path} not aligned.")

                mat_shape = kaldi_native_io.MatrixShape.read(ark)
                duration = mat_shape.num_rows * frame_shift

                utt_id_to_start_and_duration[utt_id] = (float(start), duration)
    return utt_id_to_start_and_duration


def load_kaldi_text_file(path: Path, allow_empty_ref: bool = True) -> Dict[str, str]:
    """Load the Kaldi `text` file as a dict (optionally allowing empty refs)."""
    if not path.is_file():
        raise ValueError(f"No such file: {path}")

    mapping = dict()
    with path.open() as f:
        for line in f:
            line = line.strip()
            if " " in line:
                key, value = line.split(maxsplit=1)
                mapping[key] = value
            elif allow_empty_ref:
                mapping[line] = ""
            else:
                raise ValueError(f"Empty ref. text in: {line} ({path})")

    return mapping


def load_kaldi_text_mapping(
    path: Path, must_exist: bool = False, float_vals: bool = False
) -> Dict[str, Optional[str]]:
    """Load Kaldi mapping files (utt2spk, spk2gender, ...) as a dict."""
    mapping = defaultdict(lambda: None)
    if path.is_file():
        with path.open() as f:
            mapping = dict(line.strip().split(maxsplit=1) for line in f)
        if float_vals:
            mapping = {key: float(val) for key, val in mapping.items()}
        mapping = defaultdict(lambda: None, mapping)
    elif must_exist:
        raise ValueError(f"No such file: {path}")
    return mapping


def save_kaldi_text_mapping(data: Dict[str, Any], path: Path):
    """Save a flat dict as a sorted Kaldi mapping file."""
    with path.open("w") as f:
        for key, value in sorted(data.items()):
            print(key, value, file=f)


def make_wavscp_channel_string_map(
    source: AudioSource, sampling_rate: int, transforms: Optional[List[Dict]] = None
) -> Dict[int, str]:
    if source.type == "url":
        raise ValueError("URL audio sources are not supported by Kaldi.")
    elif source.type == "command":
        if len(source.channels) != 1:
            raise ValueError("Command audio multichannel sources are not supported yet.")
        return {0: f"{source.source} |"}
    elif source.type == "file":
        if (
            Path(source.source).suffix == ".wav"
            and len(source.channels) == 1
            and transforms is None
        ):
            # Single-channel wav: no conversion pipe needed.
            return {channel: source.source for channel in source.channels}
        if Path(source.source).suffix == ".sph":
            # sph2pipe handles shorten compression that ffmpeg doesn't.
            return {
                channel: (
                    f"sph2pipe {source.source} -f wav -c {channel + 1} -p | "
                    "ffmpeg -threads 1"
                    f" -i pipe:0 -ar {sampling_rate} -f wav -threads 1 pipe:1 |"
                )
                for channel in source.channels
            }
        else:
            audios = dict()
            for channel in source.channels:
                if len(source.channels) == 1:
                    audios[channel] = (
                        f"ffmpeg -threads 1 -i {source.source} -ar {sampling_rate} "
                        f"-map_channel 0.0.0  -f wav -threads 1 pipe:1 |"
                    )
                else:
                    audios[channel] = (
                        f"ffmpeg -threads 1 -i {source.source} -ar {sampling_rate} "
                        f"-map_channel 0.0.{channel}  -f wav -threads 1 pipe:1 |"
                    )
            return audios
    else:
        raise ValueError(f"Unknown AudioSource type: {source.type}")
