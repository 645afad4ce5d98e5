"""
FeatureMixer: mix feature matrices in the feature domain.

Reference behavior: `/root/reference/lhotse/features/mixer.py:9-177` — pads
with a low log-energy value (default -1000), computes SNR gains from the
extractor-defined ``compute_energy`` (power quantities ⇒ gain is the plain
energy ratio), and combines via the extractor-defined ``mix``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from lhotse_tpu.features.base import FeatureExtractor
from lhotse_tpu.utils import Decibels, Seconds, compute_num_frames


class FeatureMixer:
    """
    Mix multiple feature matrices into one; instantiated per MixedCut with the
    reference features; relies on the FeatureExtractor's ``mix`` /
    ``compute_energy``.
    """

    def __init__(
        self,
        feature_extractor: FeatureExtractor,
        base_feats: np.ndarray,
        frame_shift: Seconds,
        padding_value: float = -1000.0,
        reference_energy: Optional[float] = None,
    ):
        self.feature_extractor = feature_extractor
        self.tracks = [base_feats]
        self.num_channels = 1 if base_feats.ndim == 2 else base_feats.shape[-1]
        self.gains = []
        self.frame_shift = frame_shift
        self.padding_value = padding_value
        self.dtype = self.tracks[0].dtype
        if reference_energy is None:
            self.reference_energy = feature_extractor.compute_energy(base_feats)
        else:
            self.reference_energy = reference_energy

    @property
    def num_features(self):
        return self.tracks[0].shape[1]

    @property
    def unmixed_feats(self) -> np.ndarray:
        """(num_tracks, num_frames, num_features) with per-track padding/scaling."""
        return np.stack(self.tracks)

    @property
    def mixed_feats(self) -> np.ndarray:
        """(num_frames, num_features) mix of all tracks."""
        result = self.tracks[0]
        for feats_to_add, gain in zip(self.tracks[1:], self.gains):
            result = self.feature_extractor.mix(
                features_a=result, features_b=feats_to_add, energy_scaling_factor_b=gain
            )
        return result

    def _get_dummy_array(self, num_frames: int) -> np.ndarray:
        shape = (
            (num_frames, self.num_features)
            if self.num_channels == 1
            else (num_frames, self.num_features, self.num_channels)
        )
        return np.full(shape=shape, fill_value=self.padding_value, dtype=self.dtype)

    def add_to_mix(
        self,
        feats: np.ndarray,
        sampling_rate: int,
        snr: Optional[Decibels] = None,
        offset: Seconds = 0.0,
    ):
        """Add a feature matrix, padding all tracks to the common mix length."""
        if len(feats) == 0:
            return
        assert offset >= 0.0, "Negative offset in mixing is not supported."
        assert self.tracks[0].ndim == feats.ndim, "Feature dimensions mismatch in mixing"

        reference_feats = self.tracks[0]
        num_frames_offset = compute_num_frames(
            duration=offset, frame_shift=self.frame_shift, sampling_rate=sampling_rate
        )
        current_num_frames = reference_feats.shape[0]
        incoming_num_frames = feats.shape[0] + num_frames_offset
        mix_num_frames = max(current_num_frames, incoming_num_frames)

        feats_to_add = feats

        if current_num_frames < mix_num_frames:
            for idx in range(len(self.tracks)):
                self.tracks[idx] = np.vstack(
                    [
                        self.tracks[idx],
                        self._get_dummy_array(mix_num_frames - current_num_frames),
                    ]
                )
        if offset > 0:
            feats_to_add = np.vstack(
                [self._get_dummy_array(num_frames_offset), feats_to_add]
            )
        if incoming_num_frames < mix_num_frames:
            feats_to_add = np.vstack(
                [feats_to_add, self._get_dummy_array(mix_num_frames - incoming_num_frames)]
            )

        gain = 1.0
        if snr is not None and self.reference_energy > 0.0:
            added_feats_energy = self.feature_extractor.compute_energy(feats)
            if added_feats_energy > 0.0:
                target_energy = self.reference_energy * (10.0 ** (-snr / 10))
                gain = target_energy / added_feats_energy
        self.tracks.append(feats_to_add)
        self.gains.append(gain)
