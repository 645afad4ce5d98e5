"""
Workarounds for third-party library quirks.

Reference behavior: `/root/reference/lhotse/workarounds.py`
(Hdf5MemoryIssueFix :6-28, AltGzipFile :31-62, gzip_open_robust :65-117).
"""
import gzip
import io
import os


class Hdf5MemoryIssueFix:
    """
    Bounds memory growth when reading HDF5 features: call ``.update()`` per
    batch; every ``reset_interval`` updates all cached HDF5 handles are
    closed (resetting HDF5's internal caches).
    """

    def __init__(self, reset_interval: int = 100) -> None:
        self.counter = 0
        self.reset_interval = reset_interval

    def update(self) -> None:
        from lhotse_tpu.features.io import close_cached_file_handles

        if self.counter > 0 and self.counter % self.reset_interval == 0:
            close_cached_file_handles()
            self.counter = 0
        self.counter += 1


class AltGzipFile(gzip.GzipFile):
    """
    GzipFile variant that, like command-line gzip, tolerates "trailing
    garbage" after the compressed stream instead of raising.
    """

    def read(self, size=-1):
        chunks = []
        try:
            if size < 0:
                while True:
                    chunk = self.read1()
                    if not chunk:
                        break
                    chunks.append(chunk)
            else:
                while size > 0:
                    chunk = self.read1(size)
                    if not chunk:
                        break
                    size -= len(chunk)
                    chunks.append(chunk)
        except OSError as e:
            if not chunks or not str(e).startswith("Not a gzipped file"):
                raise
            # Decompression succeeded; trailing garbage ignored.

        return b"".join(chunks)


def gzip_open_robust(
    filename,
    mode="rb",
    compresslevel=9,
    encoding=None,
    errors=None,
    newline=None,
):
    """
    ``gzip.open`` equivalent built on :class:`AltGzipFile` (tolerates
    trailing garbage). Accepts a path or an existing binary file object;
    text modes get a TextIOWrapper.
    """
    if "t" in mode:
        if "b" in mode:
            raise ValueError("Invalid mode: %r" % (mode,))
    else:
        if encoding is not None:
            raise ValueError("Argument 'encoding' not supported in binary mode")
        if errors is not None:
            raise ValueError("Argument 'errors' not supported in binary mode")
        if newline is not None:
            raise ValueError("Argument 'newline' not supported in binary mode")

    gz_mode = mode.replace("t", "")
    if isinstance(filename, (str, bytes, os.PathLike)):
        binary_file = AltGzipFile(filename, gz_mode, compresslevel)
    elif hasattr(filename, "read") or hasattr(filename, "write"):
        binary_file = AltGzipFile(None, gz_mode, compresslevel, filename)
    else:
        raise TypeError("filename must be a str or bytes object, or a file")

    if "t" in mode:
        return io.TextIOWrapper(binary_file, encoding, errors, newline)
    else:
        return binary_file
