from lhotse_tpu.codecs.lilcom_codec import compress, decompress, decompress_concat

__all__ = ["compress", "decompress", "decompress_concat"]
