"""
openSMILE paralinguistic feature extractor (gated on the ``opensmile`` pip
package, which bundles the native openSMILE binary).

Parity target: `/root/reference/lhotse/features/opensmile.py:12-153`. The
registry name and config surface match, so reference-produced manifests with
``feature_type: "opensmile-extractor"`` deserialize; extraction requires the
optional package at runtime.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Union

import numpy as np

from lhotse_tpu.features.base import FeatureExtractor, register_extractor
from lhotse_tpu.utils import Seconds, asdict_nonull, is_module_available


@dataclass
class OpenSmileConfig:
    """Reference: opensmile.py:12-61; predefined config sets from
    https://github.com/audeering/opensmile-python."""

    feature_set: Union[str, Any] = "ComParE_2016"
    feature_level: Union[str, Any] = "lld"
    options: Optional[dict] = None
    loglevel: int = 2
    logfile: Optional[str] = None
    sampling_rate: Optional[int] = None
    channels: Union[int, Sequence[int]] = 0
    mixdown: bool = False
    resample: bool = False
    num_workers: Optional[int] = 1
    verbose: bool = False

    def to_dict(self) -> Dict[str, Any]:
        return asdict_nonull(self)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "OpenSmileConfig":
        return OpenSmileConfig(**data)

    @staticmethod
    def featuresets_names():
        assert is_module_available("opensmile"), (
            'To use opensmile extractors, please "pip install opensmile" first.'
        )
        import opensmile

        return list(opensmile.FeatureSet.__members__)


@register_extractor
class OpenSmileExtractor(FeatureExtractor):
    """Reference: opensmile.py:64-153."""

    name = "opensmile-extractor"
    config_type = OpenSmileConfig

    def __init__(self, config: Optional[OpenSmileConfig] = None):
        super().__init__(config=config)
        assert is_module_available("opensmile"), (
            'To use opensmile extractors, please "pip install opensmile" first.'
        )
        import opensmile

        feature_set = self.config.feature_set
        if isinstance(feature_set, str) and feature_set in list(opensmile.FeatureSet.__members__):
            feature_set = opensmile.FeatureSet[feature_set]
        feature_level = self.config.feature_level
        if isinstance(feature_level, str):
            feature_level = opensmile.FeatureLevel(feature_level)
        self.smileExtractor = opensmile.Smile(
            feature_set=feature_set, feature_level=feature_level, options=self.config.options,
            loglevel=self.config.loglevel, logfile=self.config.logfile,
            sampling_rate=self.config.sampling_rate, channels=self.config.channels,
            mixdown=self.config.mixdown, resample=self.config.resample,
            num_workers=self.config.num_workers, verbose=self.config.verbose)

    @property
    def frame_shift(self) -> Seconds:
        import opensmile

        if self.config.feature_level == opensmile.FeatureLevel.LowLevelDescriptors.value:
            return 0.01
        raise ValueError(
            "frame_shift is not defined for openSMILE functionals "
            "(one vector per utterance)."
        )

    def feature_dim(self, sampling_rate: int) -> int:
        return len(self.smileExtractor.feature_names)

    @property
    def feature_names(self):
        """Names of the extracted features (parity: reference opensmile.py:98)."""
        return self.smileExtractor.feature_names

    def is_lld_or_lld_de(self) -> bool:
        """True when the configured level yields frame-level (LLD) features
        rather than one functional vector per utterance (parity:
        reference opensmile.py:101)."""
        import opensmile

        level = self.config.feature_level
        if isinstance(level, str):
            level = opensmile.FeatureLevel(level)
        return level in (
            opensmile.FeatureLevel.LowLevelDescriptors,
            opensmile.FeatureLevel.LowLevelDescriptors_Deltas,
        )

    def extract(self, samples: np.ndarray, sampling_rate: int) -> np.ndarray:
        samples = np.atleast_2d(np.asarray(samples))
        df = self.smileExtractor.process_signal(samples, sampling_rate)
        return df.to_numpy().astype(np.float32)
