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


def _install_stubs() -> None:
    if "soundfile" not in sys.modules:
        sf = types.ModuleType("soundfile")
        sf.SoundFile = object
        sf.read = sf.write = sf.info = None
        sf.available_formats = lambda: {}
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
