from lhotse_tpu.shar.writers.array import ArrayTarWriter
from lhotse_tpu.shar.writers.audio import AudioTarWriter
from lhotse_tpu.shar.writers.cut import JsonlShardWriter
from lhotse_tpu.shar.writers.shar import SharWriter
from lhotse_tpu.shar.writers.tar import TarWriter

__all__ = ["ArrayTarWriter", "AudioTarWriter", "JsonlShardWriter", "SharWriter", "TarWriter"]
