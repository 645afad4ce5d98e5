"""
lhotse_tpu: a TPU-native audio data-preparation and feature-extraction
framework with the capabilities of Lhotse (see SURVEY.md for the blueprint).
"""
from lhotse_tpu.array import Array, TemporalArray, deserialize_array, pad_array
from lhotse_tpu.audio.backend import (
    get_default_audio_backend, get_ffmpeg_torchaudio_info_enabled,
    set_ffmpeg_torchaudio_info_enabled)
from lhotse_tpu.cut.set import create_cut_set_eager, create_cut_set_lazy
from lhotse_tpu.kaldi import load_kaldi_data_dir
from lhotse_tpu.serialization import (
    get_current_io_backend, get_default_io_backend, io_backend, set_current_io_backend)
from lhotse_tpu.audio import (
    AudioSource, Recording, RecordingSet, audio_backend, available_audio_backends,
    available_resampling_backends, get_audio_duration_mismatch_tolerance, get_current_audio_backend,
    get_current_resampling_backend, resampling_backend, set_current_resampling_backend,
    set_current_audio_backend, set_audio_duration_mismatch_tolerance)
from lhotse_tpu.caching import is_caching_enabled, set_caching_enabled
from lhotse_tpu.utils import Decibels, Seconds, measure_overlap, streaming_shuffle
from lhotse_tpu.tracing import (
    emit_metrics, format_tracing_report, is_tracing_enabled, register_metrics_hook,
    set_tracing_enabled, trace_span, tracing_report, unregister_metrics_hook)
from lhotse_tpu.features import (
    Fbank, FbankConfig, available_storage_backends, create_default_feature_extractor,
    FeatureExtractor, Features, FeatureSet, FeatureSetBuilder, LilcomChunkyWriter,
    LilcomFilesWriter, LilcomHdf5Writer, ChunkedLilcomHdf5Writer, LogSpectrogram,
    LogSpectrogramConfig, KaldifeatFbank, KaldifeatFbankConfig, KaldifeatMfcc, KaldifeatMfccConfig,
    LibrosaFbank, LibrosaFbankConfig, Mfcc, MfccConfig, OpenSmileConfig, OpenSmileExtractor,
    S3PRLSSL, S3PRLSSLConfig, TorchaudioFbank, TorchaudioFbankConfig, TorchaudioMfcc,
    TorchaudioMfccConfig, TorchaudioSpectrogram, TorchaudioSpectrogramConfig, WhisperFbank,
    WhisperFbankConfig, NumpyFilesWriter, NumpyHdf5Writer, Spectrogram, SpectrogramConfig)
from lhotse_tpu.image import Image
from lhotse_tpu.lazy import dill_enabled, is_dill_enabled, set_dill_enabled
from lhotse_tpu.serialization import (
    available_io_backends, load_manifest, load_manifest_lazy, load_manifest_lazy_or_eager,
    store_manifest)
from lhotse_tpu.supervision import AlignmentItem, SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import (
    Seconds, add_durations, compute_num_frames, compute_num_samples, fastcopy, fix_random_seed)

# Cut layer (imported after the base manifests it builds upon).
from lhotse_tpu.cut import CutSet, MonoCut, MultiCut, PaddingCut, MixedCut  # noqa: E402
from lhotse_tpu.manipulation import combine, split_parallelize_combine, to_manifest  # noqa: E402
from lhotse_tpu.qa import (  # noqa: E402
    fix_manifests,
    validate,
    validate_recordings_and_supervisions,
)

from lhotse_tpu.tools.env import default_tools_cachedir  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "AlignmentItem", "Array", "AudioSource", "ChunkedLilcomHdf5Writer", "CutSet", "Fbank",
    "FbankConfig", "FeatureExtractor", "FeatureSet", "FeatureSetBuilder", "Features", "Image",
    "LilcomChunkyWriter", "LilcomFilesWriter", "LilcomHdf5Writer", "LogSpectrogram",
    "LogSpectrogramConfig", "Mfcc", "MfccConfig", "MixedCut", "MonoCut", "MultiCut",
    "NumpyFilesWriter", "NumpyHdf5Writer", "PaddingCut", "Recording", "RecordingSet", "Seconds",
    "Spectrogram", "SpectrogramConfig", "SupervisionSegment", "SupervisionSet", "TemporalArray",
    "add_durations", "audio_backend", "available_audio_backends", "available_io_backends",
    "available_storage_backends", "combine", "create_default_feature_extractor",
    "load_manifest_lazy_or_eager", "validate_recordings_and_supervisions", "compute_num_frames",
    "compute_num_samples", "deserialize_array", "dill_enabled", "fastcopy", "fix_manifests",
    "fix_random_seed", "is_caching_enabled", "is_dill_enabled", "load_manifest",
    "load_manifest_lazy", "pad_array", "set_caching_enabled", "set_dill_enabled",
    "split_parallelize_combine", "store_manifest", "to_manifest", "validate"]

# Subpackage access parity with the reference (`import lhotse; lhotse.recipes...`).
# Imported last: these packages import names from this module.
from lhotse_tpu import ais, dataset, recipes  # noqa: E402,F401
