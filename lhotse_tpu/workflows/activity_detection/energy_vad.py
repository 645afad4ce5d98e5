"""
Model-free energy VAD as an :class:`ActivityDetector`.

This framework's default activity detector (the reference's default is the
downloaded Silero model, `silero_vad.py:50`; an energy detector needs no
weights and runs anywhere). The span logic is shared with the functional API
in :mod:`.energy`.
"""
from __future__ import annotations

from typing import List

import numpy as np

from lhotse_tpu.workflows.activity_detection.base import Activity, ActivityDetector


class EnergyVAD(ActivityDetector):
    """Frame-RMS thresholding relative to the track's peak RMS."""

    def __init__(
        self, sampling_rate: int = 16000, device: str = "cpu", threshold: float = 0.01,
        min_duration: float = 0.25, min_pause: float = 0.15, frame_size: float = 0.025,
        frame_shift: float = 0.010):
        super().__init__(detector_name="energy_vad", sampling_rate=sampling_rate, device=device)
        self.threshold = threshold
        self.min_duration = min_duration
        self.min_pause = min_pause
        self.frame_size = frame_size
        self.frame_shift = frame_shift

    def forward(self, track: np.ndarray) -> List[Activity]:
        sr = self._sampling_rate
        flen = int(self.frame_size * sr)
        fshift = int(self.frame_shift * sr)
        if len(track) < flen:
            return []
        n_frames = 1 + (len(track) - flen) // fshift
        strided = np.lib.stride_tricks.as_strided(
            track, shape=(n_frames, flen), strides=(track.strides[0] * fshift, track.strides[0]))
        rms = np.sqrt((strided.astype(np.float64) ** 2).mean(axis=1))
        peak = rms.max()
        if peak <= 0:
            return []
        active = rms > self.threshold * peak

        spans = []
        start = None
        for i, a in enumerate(active):
            t = i * self.frame_shift
            if a and start is None:
                start = t
            elif not a and start is not None:
                spans.append((start, t + self.frame_size))
                start = None
        if start is not None:
            spans.append((start, (n_frames - 1) * self.frame_shift + self.frame_size))

        merged = []
        for s, e in spans:
            if merged and s - merged[-1][1] < self.min_pause:
                merged[-1] = (merged[-1][0], e)
            else:
                merged.append((s, e))
        duration = len(track) / sr
        return [
            Activity(start=round(s, 3), duration=round(min(e, duration) - s, 3)) for s,
            e in merged if e - s >= self.min_duration]
