"""
Array tar writer (numpy / lilcom compression).

Reference behavior: `/root/reference/lhotse/shar/writers/array.py`
(ArrayTarWriter :15-114). Our 'lilcom' uses the internal LTC1 codec
(:mod:`lhotse_tpu.codecs.lilcom_codec`), which preserves the same ≤2^-6
error bound.
"""
import codecs
import json
from io import BytesIO
from typing import Callable, List, Optional, Union

import numpy as np

from lhotse_tpu.array import Array, TemporalArray
from lhotse_tpu.features import Features
from lhotse_tpu.shar.utils import to_shar_placeholder
from lhotse_tpu.shar.writers.tar import TarWriter


class ArrayTarWriter:
    """
    Writes numpy arrays into auto-sharded tar archives; 'lilcom' compression
    suits log-domain features, 'numpy' is lossless.

    Example::

        >>> with ArrayTarWriter("dir/fbank.%06d.tar", shard_size=100, compression="lilcom") as w:
        ...     w.write("fbank1", fbank1_array, manifest)
    """

    def __init__(
        self,
        pattern: str,
        shard_size: Optional[int] = 1000,
        compression: str = "numpy",
        lilcom_tick_power: int = -5,
        shard_offset: int = 0,
        on_shard_complete: Optional[Callable[[str], None]] = None,
    ):
        assert compression in ("numpy", "lilcom"), (
            f"Unknown compression: {compression} (supported: numpy, lilcom)"
        )
        self.compression = compression
        self.tar_writer = TarWriter(
            pattern,
            shard_size,
            shard_offset=shard_offset,
            on_shard_complete=on_shard_complete,
        )
        self.lilcom_tick_power = lilcom_tick_power

    def __enter__(self):
        self.tar_writer.__enter__()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.close()

    def close(self):
        self.tar_writer.close()

    @property
    def output_paths(self) -> List[str]:
        return self.tar_writer.output_paths

    def write_placeholder(self, key: str) -> None:
        self.tar_writer.write(f"{key}.nodata", BytesIO())
        self.tar_writer.write(f"{key}.nometa", BytesIO(), count=False)

    def write(
        self,
        key: str,
        value: np.ndarray,
        manifest: Union[Features, Array, TemporalArray],
    ) -> None:
        if self.compression == "lilcom":
            assert np.issubdtype(value.dtype, np.floating), (
                "Lilcom compression supports only floating-point arrays."
            )
            from lhotse_tpu.codecs.lilcom_codec import compress

            data = compress(value, tick_power=self.lilcom_tick_power)
            stream = BytesIO(data)
            ext = ".llc"
        else:
            stream = BytesIO()
            np.save(stream, value, allow_pickle=False)
            ext = ".npy"

        self.tar_writer.write(key + ext, stream)

        manifest = to_shar_placeholder(manifest)
        json_stream = BytesIO()
        print(
            json.dumps(manifest.to_dict()),
            file=codecs.getwriter("utf-8")(json_stream),
        )
        json_stream.seek(0)
        self.tar_writer.write(f"{key}.json", json_stream, count=False)
