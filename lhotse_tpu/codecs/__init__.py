from lhotse_tpu.codecs.lilcom_codec import compress, decompress

__all__ = ["compress", "decompress"]
