"""Regression pins: lazy-manifest combine/split interactions.

Pins `/root/reference/test/known_issues/test_lazy_cuts_issues.py`: combining
a lazily-opened manifest with a transformed view of itself and then lazily
splitting must not raise (historically crashed on double-open iterators).
"""
from tempfile import NamedTemporaryFile, TemporaryDirectory

from lhotse_tpu import CutSet, combine, load_manifest_lazy
from lhotse_tpu.testing.dummies import DummyManifest


def test_lazy_cuts_combine_split_no_crash():
    cuts = DummyManifest(CutSet, begin_id=0, end_id=1000)
    with TemporaryDirectory() as d, NamedTemporaryFile(suffix=".jsonl.gz") as f:
        cuts.to_file(f.name)
        f.flush()

        cuts_lazy = load_manifest_lazy(f.name)
        cuts_lazy = combine(cuts_lazy, cuts_lazy.perturb_speed(0.9))
        chunks = cuts_lazy.split_lazy(d, chunk_size=100)
        # 2000 cuts total -> 20 chunks; every chunk re-opens cleanly.
        assert len(chunks) == 20
        assert sum(len(list(chunk)) for chunk in chunks) == 2000
