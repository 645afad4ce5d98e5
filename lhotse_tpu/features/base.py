"""
FeatureExtractor ABC, the Features manifest, FeatureSet, and the offline
extraction pipeline.

Reference behavior: `/root/reference/lhotse/features/base.py` —
``FeatureExtractor`` contract (:37): name, config_type dataclass,
``extract(samples, sr)``, ``frame_shift``, ``feature_dim``; optional
feature-domain ``mix``/``compute_energy``/``scale``; generic ``extract_batch``
(:152); storage pipelines ``extract_from_samples_and_store`` (:224) and
``extract_from_recording_and_store`` (:280); extractor registry (:391);
``Features`` manifest with partial ``load(start, duration)`` (:435-560);
``FeatureSet`` + ``FeatureSetBuilder`` (:630,870); streaming
Chan–Golub–LeVeque global stats (:957,990).

TPU-first difference: extractors here operate on numpy on the host API
surface, but the bundled Kaldi-compatible extractors dispatch to batched,
jitted JAX/Pallas compute (see :mod:`lhotse_tpu.features.kaldi`).
"""
from __future__ import annotations

import multiprocessing
import pickle
import warnings
from abc import ABCMeta, abstractmethod
from concurrent.futures import ProcessPoolExecutor
from dataclasses import asdict, dataclass, is_dataclass
from itertools import chain, islice
from math import isclose
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Type, Union

import numpy as np

from lhotse_tpu.audio.recording import Recording
from lhotse_tpu.features.io import FeaturesReader, FeaturesWriter, get_reader, is_in_memory
from lhotse_tpu.lazy import AlgorithmMixin
from lhotse_tpu.serialization import LazyMixin, Serializable, load_yaml, save_to_yaml
from lhotse_tpu.utils import (
    Pathlike,
    Seconds,
    asdict_nonull,
    compute_num_frames,
    compute_num_frames_from_samples,
    exactly_one_not_null,
    fastcopy,
    ifnone,
    split_manifest_lazy,
    split_sequence,
    uuid4,
)

AugmentFn = Callable[[np.ndarray, int], np.ndarray]


class FeatureExtractor(metaclass=ABCMeta):
    """
    Base class for all feature extractors. Initialized with a dataclass config
    (``config_type``); must implement ``extract``, ``frame_shift``, and
    ``feature_dim``; extractors supporting feature-domain mixing also define
    static ``compute_energy`` and ``mix``.
    """

    name = None
    config_type = None

    def __init__(self, config: Optional[Any] = None):
        if config is None:
            config = self.config_type()
        assert is_dataclass(config), "The feature configuration object must be a dataclass."
        self.config = config

    @abstractmethod
    def extract(self, samples: np.ndarray, sampling_rate: int) -> np.ndarray:
        """Extract features from audio samples; returns the feature matrix."""
        ...

    @property
    @abstractmethod
    def frame_shift(self) -> Seconds:
        ...

    @abstractmethod
    def feature_dim(self, sampling_rate: int) -> int:
        ...

    @property
    def device(self) -> str:
        return "cpu"

    @staticmethod
    def mix(
        features_a: np.ndarray, features_b: np.ndarray, energy_scaling_factor_b: float
    ) -> np.ndarray:
        """Feature-domain mix of two signals; the mixed-in signal's energy is
        scaled by ``energy_scaling_factor_b`` to reach a target SNR."""
        raise ValueError(
            'The feature extractor\'s "mix" operation is undefined. '
            "It does not support feature-domain mix; compute the features "
            "after, rather than before, mixing the cuts."
        )

    @staticmethod
    def compute_energy(features: np.ndarray) -> float:
        """Total energy of a feature matrix (never zero when implemented)."""
        raise ValueError(
            'The feature extractor\'s "compute_energy" operation is undefined. '
            "It does not support feature-domain mix; compute the features "
            "after, rather than before, mixing the cuts."
        )

    @staticmethod
    def scale(features: np.ndarray, energy_scaling_factor: float) -> np.ndarray:
        """Scale a feature matrix by the provided energy factor."""
        raise ValueError(
            'The feature extractor\'s "scale" operation is undefined. '
            "It does not support feature-domain scaling."
        )

    def extract_batch(
        self,
        samples: Union[np.ndarray, Sequence[np.ndarray]],
        sampling_rate: int,
        lengths: Optional[np.ndarray] = None,
    ) -> Union[np.ndarray, List[np.ndarray]]:
        """
        Batch extraction over variable-length inputs. The generic fallback
        calls :meth:`extract` sequentially; extractors with true batched
        kernels (the Kaldi JAX/Pallas path) override this. With ``lengths``
        given, the input is assumed to be one padded 2-D batch and per-item
        feature lengths are sliced out afterwards.
        """
        input_is_list = False
        if lengths is not None:
            feat_lens = [
                compute_num_frames_from_samples(l, self.frame_shift, sampling_rate)
                for l in lengths
            ]
            assert (
                getattr(samples, "ndim", 0) == 2
            ), "If `lengths` is provided, `samples` must be a batched, padded 2-D array."
        else:
            if isinstance(samples, list):
                input_is_list = True
            elif samples.ndim > 1:
                samples = list(samples)
            else:
                samples = [samples.reshape(1, -1)]

        result = []
        if lengths is not None:
            for i, item in enumerate(np.asarray(samples)):
                res = self.extract(item, sampling_rate=sampling_rate)
                result.append(res[: feat_lens[i]])
        else:
            for item in samples:
                result.append(self.extract(np.asarray(item), sampling_rate=sampling_rate))

        if len(result) == 1:
            return result if input_is_list else result[0]
        if all(item.shape == result[0].shape for item in result[1:]):
            return np.stack(result, axis=0)
        return result

    def extract_from_samples_and_store(
        self,
        samples: np.ndarray,
        storage: FeaturesWriter,
        sampling_rate: int,
        offset: Seconds = 0,
        channel: Optional[Union[int, List[int]]] = None,
        augment_fn: Optional[AugmentFn] = None,
    ) -> "Features":
        """
        Full pipeline over raw samples: optional augmentation → extract →
        store → return a ``Features`` manifest (without recording reference).
        """
        from lhotse_tpu.qa import validate_features

        if augment_fn is not None:
            samples = augment_fn(samples, sampling_rate)
        duration = round(samples.shape[1] / sampling_rate, ndigits=8)
        feats = self.extract(samples=samples, sampling_rate=sampling_rate)
        storage_key = store_feature_array(feats, storage=storage)
        manifest = Features(
            start=offset,
            duration=duration,
            type=self.name,
            num_frames=feats.shape[0],
            num_features=feats.shape[1],
            frame_shift=self.frame_shift,
            sampling_rate=sampling_rate,
            channels=channel,
            storage_type=storage.name,
            storage_path=str(storage.storage_path),
            storage_key=storage_key,
        )
        validate_features(manifest, feats_data=feats)
        return manifest

    def extract_from_recording_and_store(
        self,
        recording: Recording,
        storage: FeaturesWriter,
        offset: Seconds = 0,
        duration: Optional[Seconds] = None,
        channels: Union[int, List[int]] = None,
        augment_fn: Optional[AugmentFn] = None,
    ) -> "Features":
        """
        Full pipeline over a Recording: load audio → optional augmentation →
        extract → store → return a ``Features`` manifest.
        """
        from lhotse_tpu.qa import validate_features

        samples = recording.load_audio(offset=offset, duration=duration, channels=channels)
        if augment_fn is not None:
            samples = augment_fn(samples, recording.sampling_rate)
        feats = self.extract(samples=samples, sampling_rate=recording.sampling_rate)
        storage_key = store_feature_array(feats, storage=storage)
        manifest = Features(
            recording_id=recording.id,
            channels=channels if channels is not None else recording.channel_ids,
            start=offset,
            duration=recording.duration,
            type=self.name,
            num_frames=feats.shape[0],
            num_features=feats.shape[1],
            frame_shift=self.frame_shift,
            sampling_rate=recording.sampling_rate,
            storage_type=storage.name,
            storage_path=str(storage.storage_path),
            storage_key=storage_key,
        )
        validate_features(manifest, feats_data=feats)
        return manifest

    @classmethod
    def from_dict(cls, data: dict) -> "FeatureExtractor":
        data = dict(data)
        feature_type = data.pop("feature_type")
        extractor_type = get_extractor_type(feature_type)
        config = extractor_type.config_type.from_dict(data)
        return extractor_type(config)

    def to_dict(self) -> Dict[str, Any]:
        d = self.config.to_dict()
        d["feature_type"] = self.name
        return d

    @classmethod
    def from_yaml(cls, path: Pathlike) -> "FeatureExtractor":
        return cls.from_dict(load_yaml(path))

    def to_yaml(self, path: Pathlike):
        data = self.to_dict()
        save_to_yaml(data, path=path)


FEATURE_EXTRACTORS = {}


def get_extractor_type(name: str) -> Type:
    return FEATURE_EXTRACTORS[name]


def create_default_feature_extractor(name: str) -> "Optional[FeatureExtractor]":
    return get_extractor_type(name)()


def register_extractor(cls):
    FEATURE_EXTRACTORS[cls.name] = cls
    return cls


@dataclass(order=True)
class Features:
    """
    Features extracted for a particular time range of a recording/channel,
    plus the storage metadata (storage_type/path/key) needed to load them.
    """

    type: str
    num_frames: int
    num_features: int
    frame_shift: Seconds
    sampling_rate: int
    start: Seconds
    duration: Seconds
    storage_type: str
    storage_path: str
    storage_key: Union[str, bytes]
    recording_id: Optional[str] = None
    channels: Optional[Union[int, List[int]]] = None

    @property
    def end(self) -> Seconds:
        return self.start + self.duration

    @property
    def is_in_memory(self) -> bool:
        return is_in_memory(self.storage_type)

    @property
    def is_placeholder(self) -> bool:
        return self.storage_type == "shar"

    def load(
        self,
        start: Optional[Seconds] = None,
        duration: Optional[Seconds] = None,
        channel_id: Union[int, List[int]] = 0,
    ) -> np.ndarray:
        """Load the matrix, translating second offsets to frame offsets for a
        partial read (reference: features/base.py:488)."""
        storage = get_reader(self.storage_type)(self.storage_path)
        left_offset_frames, right_offset_frames = 0, None
        if start is None:
            start = self.start
        if start < self.start - 1e-3:
            raise ValueError(
                f"Cannot load features for recording {self.recording_id} starting from "
                f"{start}s. The available range is ({self.start}, {self.end}) seconds."
            )
        if not isclose(start, self.start):
            left_offset_frames = compute_num_frames(
                start - self.start,
                frame_shift=self.frame_shift,
                sampling_rate=self.sampling_rate,
            )
        if duration is not None:
            right_offset_frames = left_offset_frames + compute_num_frames(
                duration, frame_shift=self.frame_shift, sampling_rate=self.sampling_rate
            )
        return storage.read(
            self.storage_key,
            left_offset_frames=left_offset_frames,
            right_offset_frames=right_offset_frames,
        )

    def move_to_memory(
        self,
        start: Seconds = 0,
        duration: Optional[Seconds] = None,
        lilcom: bool = False,
    ) -> "Features":
        from lhotse_tpu.features.io import get_memory_writer

        if self.storage_type in ("memory_lilcom", "memory_writer"):
            return self
        arr = self.load(start=start, duration=duration)
        if issubclass(arr.dtype.type, np.floating) and lilcom:
            writer = get_memory_writer("memory_lilcom")()
        else:
            writer = get_memory_writer("memory_raw")()
        data = writer.write("", arr)
        return fastcopy(
            self,
            start=0.0,
            duration=ifnone(duration, self.duration),
            num_frames=arr.shape[0],
            storage_type=writer.name,
            storage_key=data,
            storage_path="",
        )

    def with_path_prefix(self, path: Pathlike) -> "Features":
        return fastcopy(self, storage_path=str(Path(path) / self.storage_path))

    def copy_with(self, **kwargs) -> "Features":
        return fastcopy(self, **kwargs)

    def to_dict(self) -> dict:
        return asdict_nonull(self)

    def copy_feats(self, writer: FeaturesWriter) -> "Features":
        """Re-store the referenced feature array with ``writer`` and return an
        updated manifest."""
        feats = self.load()
        new_key = writer.write(self.storage_key, feats)
        return fastcopy(
            self,
            storage_type=writer.name,
            storage_path=writer.storage_path,
            storage_key=new_key,
        )

    @staticmethod
    def from_dict(data: dict) -> "Features":
        if "frame_shift" not in data and "storage_type" in data:
            warnings.warn(
                'The "frame_shift" field was not found in a feature manifest; '
                "inferring it from duration/num_frames."
            )
            data["frame_shift"] = round(data["duration"] / data["num_frames"], ndigits=3)
        if "storage_key" in data and "storage_type" in data and "storage_path" not in data:
            data["storage_path"] = None
        return Features(**data)

    def __repr__(self):
        return (
            f"Features(type='{self.type}', num_frames={self.num_frames}, "
            f"num_features={self.num_features}, frame_shift={self.frame_shift}, "
            f"sampling_rate={self.sampling_rate}, start={self.start}, "
            f"duration={self.duration}, storage_type='{self.storage_type}', "
            f"storage_path='{self.storage_path}', "
            f"storage_key='{self.storage_key if isinstance(self.storage_key, str) else '<binary-data>'}', "
            f"recording_id='{self.recording_id}', channels={self.channels})"
        )


class FeatureSet(Serializable, AlgorithmMixin):
    """
    A feature manifest: load features for recordings within particular
    channels and time ranges; raises KeyError when unavailable.
    """

    def __init__(self, features: Optional[List[Features]] = None) -> None:
        self.features = ifnone(features, [])
        self._features_by_recording_id: Optional[Dict[str, List[Features]]] = None

    def __eq__(self, other: "FeatureSet") -> bool:
        return self.features == other.features

    @property
    def data(self) -> Union[Dict[str, Features], Iterable[Features]]:
        return self.features

    @staticmethod
    def from_features(features: Union[Iterable[Features], LazyMixin]) -> "FeatureSet":
        return (
            FeatureSet([f for f in features])
            if isinstance(features, LazyMixin)
            else FeatureSet(list(features))
        )

    from_items = from_features

    @staticmethod
    def from_dicts(data: Iterable[dict]) -> "FeatureSet":
        return FeatureSet(features=[Features.from_dict(d) for d in data])

    def to_dicts(self) -> Iterable[dict]:
        return (f.to_dict() for f in self)

    def with_path_prefix(self, path: Pathlike) -> "FeatureSet":
        return FeatureSet.from_features(f.with_path_prefix(path) for f in self)

    def split(
        self, num_splits: int, shuffle: bool = False, drop_last: bool = False
    ) -> List["FeatureSet"]:
        return [
            FeatureSet.from_features(subset)
            for subset in split_sequence(
                self, num_splits=num_splits, shuffle=shuffle, drop_last=drop_last
            )
        ]

    def split_lazy(
        self, output_dir: Pathlike, chunk_size: int, prefix: str = ""
    ) -> List["FeatureSet"]:
        return split_manifest_lazy(
            self, output_dir=output_dir, chunk_size=chunk_size, prefix=prefix
        )

    def shuffle(self, *args, **kwargs):
        raise NotImplementedError("FeatureSet does not support shuffling.")

    def subset(self, first: Optional[int] = None, last: Optional[int] = None) -> "FeatureSet":
        assert exactly_one_not_null(first, last), "subset() can handle only one non-None arg."
        if first is not None:
            assert first > 0
            return FeatureSet.from_items(islice(self, first))
        if last is not None:
            assert last > 0
            N = len(self)
            if last > N:
                return self
            return FeatureSet.from_items(islice(self, N - last, N))

    def find(
        self,
        recording_id: str,
        channel_id: Union[int, List[int]] = 0,
        start: Seconds = 0.0,
        duration: Optional[Seconds] = None,
        leeway: Seconds = 0.05,
    ) -> Features:
        """
        Find the Features object best matching the criteria (closest time
        markers within ``leeway``); raise KeyError when none match.
        """
        if duration is not None:
            end = start + duration
        candidates = self._index_by_recording_id_and_cache().get(recording_id, [])
        candidates = (
            f
            for f in candidates
            if f.channels == channel_id and f.start - leeway <= start < f.end + leeway
        )
        if duration is not None:
            candidates = (f for f in candidates if f.end >= end - leeway)
        candidates = list(candidates)
        if not candidates:
            raise KeyError(
                f"No features available for recording '{recording_id}', channel "
                f"{channel_id} in time range [{start}s, "
                f"{'end' if duration is None else duration}s]"
            )
        if duration is not None:
            return min(candidates, key=lambda f: (start - f.start) ** 2 + (end - f.end) ** 2)
        return min(candidates, key=lambda f: (start - f.start) ** 2)

    def _index_by_recording_id_and_cache(self):
        if self._features_by_recording_id is None:
            from collections import defaultdict

            index = defaultdict(list)
            for feat in self:
                index[feat.recording_id].append(feat)
            self._features_by_recording_id = dict(index)
        return self._features_by_recording_id

    def load(
        self,
        recording_id: str,
        channel_id: Union[int, List[int]] = 0,
        start: Seconds = 0.0,
        duration: Optional[Seconds] = None,
    ) -> np.ndarray:
        feature_info = self.find(
            recording_id=recording_id, channel_id=channel_id, start=start, duration=duration
        )
        return feature_info.load(start=start, duration=duration)

    def copy_feats(self, writer: FeaturesWriter) -> "FeatureSet":
        return FeatureSet.from_features(f.copy_feats(writer=writer) for f in self)

    def compute_global_stats(self, storage_path: Optional[Pathlike] = None) -> Dict[str, np.ndarray]:
        """Single-pass global per-bin mean/std (Chan–Golub–LeVeque)."""
        return compute_global_stats(feature_manifests=self, storage_path=storage_path)

    def __repr__(self) -> str:
        return f"FeatureSet(len={len(self)})"

    def __iter__(self) -> Iterable[Features]:
        return iter(self.features)

    def __getitem__(self, i: int) -> Features:
        return self.features[i]

    def __len__(self) -> int:
        return len(self.features)


class FeatureSetBuilder:
    """
    Wrapper for the feature extraction script: consumes Recordings, extracts
    features per channel, stores them, and builds a FeatureSet.
    """

    def __init__(
        self,
        feature_extractor: FeatureExtractor,
        storage: FeaturesWriter,
        augment_fn: Optional[AugmentFn] = None,
    ):
        self.feature_extractor = feature_extractor
        self.storage = storage
        self.augment_fn = augment_fn

    def process_and_store_recordings(
        self,
        recordings: Sequence[Recording],
        output_manifest: Optional[Pathlike] = None,
        num_jobs: int = 1,
    ) -> FeatureSet:
        from tqdm.auto import tqdm

        if num_jobs == 1:
            feature_set = FeatureSet.from_features(
                tqdm(
                    chain.from_iterable(map(self._process_and_store_recording, recordings)),
                    total=len(recordings),
                    desc="Extracting and storing features",
                )
            )
        else:
            with ProcessPoolExecutor(
                num_jobs, mp_context=multiprocessing.get_context("spawn")
            ) as ex:
                feature_set = FeatureSet.from_features(
                    tqdm(
                        chain.from_iterable(
                            ex.map(self._process_and_store_recording, recordings)
                        ),
                        total=len(recordings),
                        desc="Extracting and storing features in parallel",
                    )
                )
        if output_manifest is not None:
            feature_set.to_file(output_manifest)
        return feature_set

    def _process_and_store_recording(self, recording: Recording) -> List[Features]:
        results = []
        for channel in recording.channel_ids:
            results.append(
                self.feature_extractor.extract_from_recording_and_store(
                    recording=recording,
                    storage=self.storage,
                    channels=channel,
                    augment_fn=self.augment_fn,
                )
            )
        return results


def store_feature_array(feats: np.ndarray, storage: FeaturesWriter) -> str:
    """Store a feature array under a random unique key."""
    feats_id = str(uuid4())
    return storage.write(feats_id, feats)


def compute_global_stats(
    feature_manifests: Iterable[Features], storage_path: Optional[Pathlike] = None
) -> Dict[str, np.ndarray]:
    """
    Single-pass global per-bin means and stds using the Chan–Golub–LeVeque
    streaming variance update (reference: features/base.py:957).
    """
    feature_manifests = iter(feature_manifests)
    first = next(feature_manifests)
    stats = StatsAccumulator(feature_dim=first.num_features)
    for features in chain([first], feature_manifests):
        arr = features.load().astype(np.float64)
        stats.update(arr)
    mvn = stats.get()
    if storage_path is not None:
        with open(storage_path, "wb") as f:
            pickle.dump(mvn, f)
    return mvn


class StatsAccumulator:
    def __init__(self, feature_dim: int):
        self.total_sum = np.zeros((feature_dim,), dtype=np.float64)
        self.total_unnorm_var = np.zeros((feature_dim,), dtype=np.float64)
        self.total_frames = 0

    def update(self, arr: np.ndarray) -> None:
        with np.errstate(divide="ignore", invalid="ignore"):
            arr = arr.astype(np.float64)
            curr_sum = arr.sum(axis=0)
            updated_total_sum = self.total_sum + curr_sum
            curr_frames = arr.shape[0]
            updated_total_frames = self.total_frames + curr_frames
            total_over_curr_frames = self.total_frames / curr_frames
            curr_unnorm_var = np.var(arr, axis=0) * curr_frames
            if self.total_frames > 0:
                self.total_unnorm_var = (
                    self.total_unnorm_var
                    + curr_unnorm_var
                    + total_over_curr_frames
                    / updated_total_frames
                    * (self.total_sum / total_over_curr_frames - curr_sum) ** 2
                )
            else:
                self.total_unnorm_var = curr_unnorm_var
            self.total_sum = updated_total_sum
            self.total_frames = updated_total_frames

    @property
    def norm_means(self) -> np.ndarray:
        return self.total_sum / self.total_frames

    @property
    def norm_stds(self) -> np.ndarray:
        return np.sqrt(self.total_unnorm_var / self.total_frames)

    def get(self) -> Dict[str, np.ndarray]:
        return {"norm_means": self.norm_means, "norm_stds": self.norm_stds}
