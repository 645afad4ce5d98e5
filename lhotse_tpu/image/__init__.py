from lhotse_tpu.image.image import Image
from lhotse_tpu.image.io import (
    PillowInMemoryReader, PillowInMemoryWriter, PillowReader, PillowWriter)

__all__ = ["Image", "PillowInMemoryReader", "PillowInMemoryWriter", "PillowReader", "PillowWriter"]
