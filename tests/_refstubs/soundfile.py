"""Functional stand-in for the ``soundfile`` package (absent in this env),
backed by lhotse_tpu's native decoders — lets the REFERENCE implementation's
audio loading path execute in-env for differential tests (reference
audio/backend.py:1252-1275 uses: SoundFile context manager, .samplerate,
.seek(n), .read(frames, dtype, always_2d); plus module-level read/info/write).
Lives as a real module file so worker subprocesses spawned by the reference
(e.g. recipe ProcessPoolExecutors) can import it too."""
import io

__version__ = "0.12.1"


def _decode_any(file):
    """Decode a path or file-like object to ((channels, frames) float32, sr)
    using lhotse_tpu's native codecs, dispatched on magic bytes."""
    from lhotse_tpu.audio.aiffio import read_aiff
    from lhotse_tpu.audio.flacio import read_flac
    from lhotse_tpu.audio.sphio import read_sph
    from lhotse_tpu.audio.wavio import read_wav

    if isinstance(file, (str, bytes)) or hasattr(file, "__fspath__"):
        with open(file, "rb") as f:
            payload = f.read()
    else:
        payload = file.read()
    magic = payload[:4]
    buf = io.BytesIO(payload)
    if magic == b"fLaC":
        return read_flac(buf)
    if magic == b"FORM":
        return read_aiff(buf)
    if magic.startswith(b"NIST"):
        return read_sph(buf)
    # Lossy formats via the system codec libraries (modern libsndfile
    # decodes mp3/vorbis/opus too, so the stub should as well).
    from lhotse_tpu.audio import syscodecs

    if magic == b"OggS":
        codec = syscodecs.sniff_ogg_codec(payload[:320])
        if codec == "opus" and syscodecs.opus_available():
            return syscodecs.opus_decode(payload)
        if codec == "vorbis" and syscodecs.vorbis_available():
            return syscodecs.vorbis_decode(payload)
    if syscodecs.looks_like_mp3(payload[:4]) and syscodecs.mp3_available():
        return syscodecs.mp3_decode(payload)
    return read_wav(buf)


class SoundFile:
    def __init__(self, file, mode="r", **kwargs):
        data, sr = _decode_any(file)
        self._data = data  # (channels, frames)
        self.samplerate = int(sr)
        self.channels = data.shape[0]
        self.frames = data.shape[1]
        self._pos = 0

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def seek(self, frames, whence=0):
        self._pos = int(frames)
        return self._pos

    def tell(self):
        return self._pos

    def read(self, frames=-1, dtype="float64", always_2d=False, **kwargs):
        import numpy as np

        end = (
            self.frames
            if frames is None or int(frames) < 0
            else min(self._pos + int(frames), self.frames)
        )
        out = self._data[:, self._pos : end].T  # soundfile shape: (frames, ch)
        self._pos = end
        out = np.asarray(out, dtype=np.dtype(dtype))
        if not always_2d and out.shape[1] == 1:
            out = out[:, 0]
        return out

    def close(self):
        pass


def read(file, frames=-1, start=0, stop=None, dtype="float64", always_2d=False, **kw):
    with SoundFile(file) as f:
        if start:
            f.seek(start)
        if stop is not None:
            frames = stop - start
        return f.read(frames=frames, dtype=dtype, always_2d=always_2d), f.samplerate


def info(file):
    f = SoundFile(file)
    f.duration = f.frames / f.samplerate
    f.format = "WAV"
    f.subtype = "FLOAT"
    return f


def write(file, data, samplerate, format=None, subtype=None, **kw):
    import numpy as np

    from lhotse_tpu.audio.wavio import write_wav

    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    write_wav(file, data.T.astype(np.float32), int(samplerate))


def available_formats():
    return {"WAV": "WAV", "FLAC": "FLAC", "AIFF": "AIFF"}
