from lhotse_tpu.features.base import (
    FeatureExtractor, Features, FeatureSet, FeatureSetBuilder, StatsAccumulator,
    compute_global_stats, create_default_feature_extractor, get_extractor_type, register_extractor,
    store_feature_array)
from lhotse_tpu.features.io import (
    ChunkedLilcomHdf5Reader, LilcomHdf5Reader, LilcomURLReader, LilcomURLWriter, StorageBackendInfo,
    storage_backend_statuses, ChunkedLilcomHdf5Writer, FeaturesReader, FeaturesWriter, KaldiReader,
    KaldiWriter, LilcomChunkyReader, LilcomChunkyWriter, LilcomFilesReader, LilcomFilesWriter,
    LilcomHdf5Writer, MemoryLilcomReader, MemoryLilcomWriter, MemoryRawReader, MemoryRawWriter,
    NumpyFilesReader, NumpyFilesWriter, NumpyHdf5Reader, NumpyHdf5Writer,
    available_storage_backends, close_cached_file_handles, get_memory_writer, get_reader,
    get_writer)
from lhotse_tpu.features.compliance import (
    TorchaudioFbank, TorchaudioFbankConfig, TorchaudioMfcc, TorchaudioMfccConfig,
    TorchaudioSpectrogram, TorchaudioSpectrogramConfig)
from lhotse_tpu.features.kaldi.extractors import (
    Fbank, FbankConfig, LogSpectrogram, LogSpectrogramConfig, Mfcc, MfccConfig, Spectrogram,
    SpectrogramConfig)
from lhotse_tpu.features.kaldifeat import (
    KaldifeatFbank, KaldifeatFbankConfig, KaldifeatFrameOptions, KaldifeatMelOptions, KaldifeatMfcc,
    KaldifeatMfccConfig)
from lhotse_tpu.features.librosa_fbank import LibrosaFbank, LibrosaFbankConfig
from lhotse_tpu.features.mixer import FeatureMixer
from lhotse_tpu.features.opensmile import OpenSmileConfig, OpenSmileExtractor
from lhotse_tpu.features.ssl import S3PRLSSL, S3PRLSSLConfig
from lhotse_tpu.features.whisper import WhisperFbank, WhisperFbankConfig
