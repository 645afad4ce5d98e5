"""
Loader for the reference implementation at /root/reference, for DIFFERENTIAL
testing (same inputs through both implementations, outputs compared).

The environment lacks three of the reference's import-time dependencies
(soundfile, intervaltree, cytoolz).  None of them matter for manifest-level
semantics, so we install minimal functional stand-ins before importing:

- ``soundfile``: only needed for actual audio decode, which differential
  tests never touch (all comparisons are manifest arithmetic).
- ``intervaltree``: used by ``index_supervisions``/overlap queries; a list
  backed O(n) implementation is functionally identical.
- ``cytoolz``: ``compose_left`` and ``sliding_window`` re-implemented.

Import the reference ONLY through :func:`load_reference` so the stubs are in
place first.  Returns None when /root/reference is not mounted (tests skip).
"""
import os
import sys
import types

_REF_ROOT = "/root/reference"
_loaded = None


def _decode_any(file):
    """Decode a path or file-like object to ((channels, frames) float32, sr)
    using this repo's native codecs, dispatched on magic bytes."""
    import io

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
    return read_wav(buf)


class _StubSoundFile:
    """Functional subset of ``soundfile.SoundFile`` backed by this repo's
    native decoders — lets the REFERENCE's audio loading path execute in-env
    for differential tests (reference audio/backend.py:1252-1275 uses
    exactly: context manager, .samplerate, .seek(n), .read(frames, dtype,
    always_2d))."""

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


def _stub_sf_read(file, frames=-1, start=0, stop=None, dtype="float64", always_2d=False, **kw):
    with _StubSoundFile(file) as f:
        if start:
            f.seek(start)
        if stop is not None:
            frames = stop - start
        return f.read(frames=frames, dtype=dtype, always_2d=always_2d), f.samplerate


def _stub_sf_info(file):
    f = _StubSoundFile(file)
    f.duration = f.frames / f.samplerate
    f.format = "WAV"
    f.subtype = "FLOAT"
    return f


def _stub_sf_write(file, data, samplerate, format=None, subtype=None, **kw):
    import numpy as np

    from lhotse_tpu.audio.wavio import write_wav

    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    write_wav(file, data.T.astype(np.float32), int(samplerate))


def _install_stubs() -> None:
    if "soundfile" not in sys.modules:
        sf = types.ModuleType("soundfile")
        sf.SoundFile = _StubSoundFile
        sf.read = _stub_sf_read
        sf.write = _stub_sf_write
        sf.info = _stub_sf_info
        sf.available_formats = lambda: {"WAV": "WAV", "FLAC": "FLAC", "AIFF": "AIFF"}
        sf.__version__ = "0.12.1"
        sys.modules["soundfile"] = sf

    if "intervaltree" not in sys.modules:
        it = types.ModuleType("intervaltree")

        class Interval:
            __slots__ = ("begin", "end", "data")

            def __init__(self, begin, end, data=None):
                self.begin, self.end, self.data = begin, end, data

            def __repr__(self):
                return f"Interval({self.begin}, {self.end}, {self.data!r})"

        class IntervalTree:
            def __init__(self, intervals=()):
                self.intervals = list(intervals)

            @classmethod
            def from_tuples(cls, tups):
                return cls(Interval(*t) for t in tups)

            def add(self, iv):
                self.intervals.append(iv)

            def addi(self, begin, end, data=None):
                self.intervals.append(Interval(begin, end, data))

            def overlap(self, begin, end):
                return {
                    iv
                    for iv in self.intervals
                    if iv.begin < end and iv.end > begin
                }

            def at(self, point):
                return {
                    iv for iv in self.intervals if iv.begin <= point < iv.end
                }

            def envelop(self, begin, end):
                # intervaltree semantics: intervals completely contained in range
                return {
                    iv
                    for iv in self.intervals
                    if iv.begin >= begin and iv.end <= end
                }

            def __iter__(self):
                return iter(self.intervals)

            def __len__(self):
                return len(self.intervals)

        it.Interval, it.IntervalTree = Interval, IntervalTree
        sys.modules["intervaltree"] = it

    if "cytoolz" not in sys.modules:
        ct = types.ModuleType("cytoolz")

        def compose_left(*fns):
            def run(x):
                for f in fns:
                    x = f(x)
                return x

            return run

        def sliding_window(n, seq):
            seq = list(seq)
            return (tuple(seq[i : i + n]) for i in range(len(seq) - n + 1))

        def groupby(key, seq):
            out = {}
            for item in seq:
                out.setdefault(key(item), []).append(item)
            return out

        ct.compose_left = compose_left
        ct.sliding_window = sliding_window
        ct.groupby = groupby
        sys.modules["cytoolz"] = ct


def load_reference():
    """Import and return the reference ``lhotse`` package, or None if absent."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if not os.path.isdir(os.path.join(_REF_ROOT, "lhotse")):
        return None
    _install_stubs()
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    import lhotse as ref_lhotse  # noqa: deferred so stubs apply

    _loaded = ref_lhotse
    return _loaded
