from lhotse_tpu.augmentation.clipping import Clipping
from lhotse_tpu.augmentation.compress import Compress
from lhotse_tpu.augmentation.loudness import LoudnessNormalization, normalize_loudness
from lhotse_tpu.augmentation.narrowband import Narrowband
from lhotse_tpu.augmentation.utils import AugmentFn
from lhotse_tpu.augmentation.resample import (
    SincResampler, get_or_create_resampler, resample_array)
from lhotse_tpu.augmentation.rir import ReverbWithImpulseResponse
from lhotse_tpu.augmentation.transform import AudioTransform
from lhotse_tpu.augmentation.transforms import (Resample, Speed, Tempo, Volume, wsola_time_stretch)
from lhotse_tpu.augmentation.utils import FastRandomRIRGenerator, convolve1d
from lhotse_tpu.augmentation.wpe import dereverb_wpe_torch, DereverbWPE, dereverb_wpe_numpy

__all__ = [
    "AudioTransform", "Clipping", "Compress", "DereverbWPE", "FastRandomRIRGenerator",
    "LoudnessNormalization", "Narrowband", "Resample", "ReverbWithImpulseResponse", "SincResampler",
    "Speed", "Tempo", "Volume", "convolve1d", "dereverb_wpe_numpy", "get_or_create_resampler",
    "normalize_loudness", "resample_array", "wsola_time_stretch"]
