"""Functional stand-in for the ``cytoolz`` package (absent in this env),
used when importing the reference implementation for differential tests.
Implements only what the reference imports."""


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
