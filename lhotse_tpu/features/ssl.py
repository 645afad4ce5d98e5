"""
Self-supervised speech embeddings as features (gated on ``s3prl``).

Parity target: `/root/reference/lhotse/features/ssl.py:12-116` (``S3PRLSSL``,
registry name ``"s3prl-ssl"`` — wav2vec2/HuBERT/WavLM upstream embeddings,
20 ms stride). Config and name match so manifests deserialize; extraction
needs the optional ``s3prl`` package (and torch) at runtime.
"""
from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Any, Dict, Optional

import numpy as np

from lhotse_tpu.features.base import FeatureExtractor, register_extractor
from lhotse_tpu.utils import Seconds, compute_num_frames_from_samples, is_module_available


@dataclass
class S3PRLSSLConfig:
    """Reference: ssl.py:12-36."""

    sampling_rate: int = 16000
    ssl_model: str = "wav2vec2_large_ll60k"
    layer: int = -1
    frame_shift: float = 0.02
    feature_dim: int = 1024
    device: str = "cpu"

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "S3PRLSSLConfig":
        return S3PRLSSLConfig(**data)


@register_extractor
class S3PRLSSL(FeatureExtractor):
    """Reference: ssl.py:39-116."""

    name = "s3prl-ssl"
    config_type = S3PRLSSLConfig

    def __init__(self, config: Optional[S3PRLSSLConfig] = None):
        super().__init__(config)
        assert is_module_available("s3prl.hub"), (
            "To use s3prl ssl extractors, please install s3prl first."
        )
        import s3prl.hub as hub

        assert self.config.ssl_model in dir(hub), (
            f"S3PRL does not support model: {self.config.ssl_model}."
        )
        assert self.config.sampling_rate == 16000, (
            "All the upstream models in S3PRL only support 16 kHz audio."
        )
        self.ssl_model = getattr(hub, self.config.ssl_model)().to(self.config.device)
        self.ssl_model.eval()

    @property
    def device(self) -> str:
        return self.config.device

    @property
    def sampling_rate(self) -> int:
        return self.config.sampling_rate

    @property
    def frame_shift(self) -> Seconds:
        return self.config.frame_shift

    def feature_dim(self, sampling_rate: int) -> int:
        return self.config.feature_dim

    def fix_off_by_one_error(self, feats: np.ndarray, num_samples: int) -> np.ndarray:
        """Zero-pad a feature matrix that is one frame short of the canonical
        count for ``num_samples`` (parity: reference ``ssl.py:75`` — SSL
        models emit a truncated final frame)."""
        num_frames, num_features = feats.shape
        expected = compute_num_frames_from_samples(
            num_samples=num_samples, frame_shift=self.frame_shift,
            sampling_rate=self.sampling_rate)
        assert abs(expected - num_frames) <= 1
        if expected - num_frames == 1:
            feats = np.concatenate([feats, np.zeros([1, num_features])], axis=0)
        return feats

    def extract(self, samples: np.ndarray, sampling_rate: int) -> np.ndarray:
        import torch

        assert sampling_rate == self.config.sampling_rate
        samples = np.atleast_2d(np.asarray(samples))
        assert samples.shape[0] == 1, "S3PRLSSL works with single-channel audio."
        wav = torch.from_numpy(samples.astype(np.float32)).to(self.config.device)
        with torch.no_grad():
            hidden = self.ssl_model(list(wav))["hidden_states"][self.config.layer]
        feats = hidden.squeeze(0).cpu().numpy()
        # Trim/pad to the canonical frame count for the duration.
        target = compute_num_frames_from_samples(
            num_samples=samples.shape[1], frame_shift=self.frame_shift, sampling_rate=sampling_rate)
        if len(feats) > target:
            feats = feats[:target]
        elif len(feats) < target:
            feats = np.pad(feats, ((0, target - len(feats)), (0, 0)), "edge")
        return feats.astype(np.float32)
