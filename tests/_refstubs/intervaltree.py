"""Functional stand-in for the ``intervaltree`` package (absent in this env),
used when importing the reference implementation for differential tests.
List-backed O(n) queries — semantics match the real package for the subset
the reference uses.  Lives as a real module file (not an in-memory stub) so
worker subprocesses spawned by the reference can import it too."""


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
        return {iv for iv in self.intervals if iv.begin < end and iv.end > begin}

    def at(self, point):
        return {iv for iv in self.intervals if iv.begin <= point < iv.end}

    def envelop(self, begin, end):
        # intervaltree semantics: intervals completely contained in the range
        return {iv for iv in self.intervals if iv.begin >= begin and iv.end <= end}

    def __iter__(self):
        return iter(self.intervals)

    def __len__(self):
        return len(self.intervals)
