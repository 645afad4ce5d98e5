from lhotse_tpu.dataset import collation, input_strategies, signal_transforms
from lhotse_tpu.dataset.collation import (
    TokenCollater, collate_audio, collate_custom_field, collate_features, collate_images,
    collate_matrices, collate_multi_channel_audio, collate_multi_channel_features, collate_vectors,
    collate_video)
from lhotse_tpu.dataset.cut_transforms import *  # noqa: F401,F403
from lhotse_tpu.dataset.cut_transforms import __all__ as _cut_transforms_all
from lhotse_tpu.dataset.dataloading import (
    WorkerInfo, get_rank, get_worker_info, get_world_size, make_worker_init_fn, resolve_seed,
    set_worker_info, worker_init_fn)
from lhotse_tpu.dataset.input_strategies import (
    AudioSamples, BatchIO, OnTheFlyFeatures, PrecomputedFeatures)
from lhotse_tpu.dataset.audio_tagging import AudioTaggingDataset
from lhotse_tpu.dataset.diarization import DiarizationDataset
from lhotse_tpu.dataset.iterable_dataset import IdentityDataset
from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter
from lhotse_tpu.dataset.loader import DataLoader, device_prefetch
from lhotse_tpu.dataset.vis import plot_batch
from lhotse_tpu.dataset.webdataset import (
    LazyWebdatasetIterator, WebdatasetWriter, export_to_webdataset)
from lhotse_tpu.dataset.sampling import *  # noqa: F401,F403
from lhotse_tpu.dataset.sampling import __all__ as _sampling_all
from lhotse_tpu.dataset.source_separation import (
    DynamicallyMixedSourceSeparationDataset, PreMixedSourceSeparationDataset,
    SourceSeparationDataset)
from lhotse_tpu.dataset.speech_recognition import (K2SpeechRecognitionDataset, validate_for_asr)
from lhotse_tpu.dataset.speech_synthesis import SpeechSynthesisDataset
from lhotse_tpu.dataset.speech_translation import K2Speech2TextTranslationDataset
from lhotse_tpu.dataset.surt import K2SurtDataset
from lhotse_tpu.dataset.unsupervised import (
    DynamicUnsupervisedDataset, RecordingChunkIterableDataset, UnsupervisedDataset,
    UnsupervisedWaveformDataset, audio_chunk_collate, audio_chunk_worker_init_fn)
from lhotse_tpu.dataset.vad import VadDataset
from lhotse_tpu.dataset.video import UnsupervisedAudioVideoDataset
from lhotse_tpu.dataset.signal_transforms import (
    DereverbWPE, GlobalMVN, RandomizedSmoothing, SpecAugment)

__all__ = (
    [
        "AudioSamples",
        "AudioTaggingDataset",
        "BatchIO",
        "DiarizationDataset",
        "DynamicUnsupervisedDataset",
        "DynamicallyMixedSourceSeparationDataset",
        "IdentityDataset",
        "IterableDatasetWrapper",
        "K2Speech2TextTranslationDataset",
        "K2SpeechRecognitionDataset",
        "K2SurtDataset",
        "PreMixedSourceSeparationDataset",
        "RecordingChunkIterableDataset",
        "SourceSeparationDataset",
        "SpeechSynthesisDataset",
        "UnsupervisedAudioVideoDataset",
        "UnsupervisedDataset",
        "UnsupervisedWaveformDataset",
        "VadDataset",
        "audio_chunk_collate",
        "audio_chunk_worker_init_fn",
        "validate_for_asr",
        "DereverbWPE",
        "GlobalMVN",
        "OnTheFlyFeatures",
        "PrecomputedFeatures",
        "RandomizedSmoothing",
        "SpecAugment",
        "TokenCollater",
        "WorkerInfo",
        "collate_audio",
        "collate_custom_field",
        "collate_features",
        "collate_images",
        "collate_matrices",
        "collate_multi_channel_audio",
        "collate_multi_channel_features",
        "collate_vectors",
        "collate_video",
        "get_rank",
        "get_worker_info",
        "get_world_size",
        "make_worker_init_fn",
        "resolve_seed",
        "set_worker_info",
        "worker_init_fn",
    ]
    + list(_sampling_all)
    + list(_cut_transforms_all)
)


def __getattr__(name):
    # Lazy: building IterableDatasetWrapper imports torch when present, and
    # `import lhotse_tpu` must stay torch-free.
    if name == "IterableDatasetWrapper":
        from lhotse_tpu.dataset import iterable_dataset

        return iterable_dataset.IterableDatasetWrapper
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
