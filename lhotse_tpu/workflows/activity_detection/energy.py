"""
Voice activity detection workflow.

Reference behavior: `/root/reference/lhotse/workflows/activity_detection/`
(silero-based VAD). This framework provides a self-contained energy-based
detector (no model download required); a model-based detector can be plugged
in through the same interface.
"""
from typing import List

import numpy as np

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.parallel import parallel_map
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet


def detect_activity_energy_single(
    recording: Recording, threshold: float = 0.01, min_duration: float = 0.25,
    min_pause: float = 0.15, frame_size: float = 0.025, frame_shift: float = 0.010,
) -> List[SupervisionSegment]:
    """
    Frame-RMS voice activity detection on one recording: frames whose RMS
    exceeds ``threshold × max_rms`` are speech; runs shorter than
    ``min_duration`` are dropped and gaps shorter than ``min_pause`` merged.
    """
    audio = recording.load_audio()[0]
    sr = recording.sampling_rate
    flen = int(frame_size * sr)
    fshift = int(frame_shift * sr)
    if len(audio) < flen:
        return []

    n_frames = 1 + (len(audio) - flen) // fshift
    strided = np.lib.stride_tricks.as_strided(
        audio, shape=(n_frames, flen), strides=(audio.strides[0] * fshift, audio.strides[0]))
    rms = np.sqrt((strided.astype(np.float64) ** 2).mean(axis=1))
    peak = rms.max()
    if peak <= 0:
        return []
    active = rms > threshold * peak

    # Active frames → (start, end) second spans.
    spans = []
    start = None
    for i, a in enumerate(active):
        t = i * frame_shift
        if a and start is None:
            start = t
        elif not a and start is not None:
            spans.append((start, t + frame_size))
            start = None
    if start is not None:
        spans.append((start, (n_frames - 1) * frame_shift + frame_size))

    # Merge close spans, drop short ones.
    merged = []
    for s, e in spans:
        if merged and s - merged[-1][1] < min_pause:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    merged = [(s, min(e, recording.duration)) for s, e in merged if e - s >= min_duration]

    return [
        SupervisionSegment( id=f"{recording.id}-vad-{i:04d}", recording_id=recording.id, start=round(s, 3), duration=round(e - s, 3), channel=0, ) for i,
        (s, e) in enumerate(merged)]


def detect_activity_energy(
    recordings: RecordingSet, threshold: float = 0.01, min_duration: float = 0.25,
    num_jobs: int = 1) -> SupervisionSet:
    """Run energy VAD over a RecordingSet (optionally in parallel)."""
    from functools import partial

    work = partial(detect_activity_energy_single, threshold=threshold, min_duration=min_duration)
    segments = []
    if num_jobs == 1:
        for r in recordings:
            segments.extend(work(r))
    else:
        for segs in parallel_map(work, recordings, num_jobs=num_jobs):
            segments.extend(segs)
    return SupervisionSet.from_segments(segments)
