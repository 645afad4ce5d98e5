"""
StatelessSampler depth: determinism, bucketing mode, validation, and
in-worker (iterable dataset) usage.

Behavioral model: /root/reference/test/dataset/sampling/test_stateless_sampler.py.
"""
import itertools
import warnings

import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.dataset.sampling.stateless import StatelessSampler
from lhotse_tpu.testing.dummies import DummyManifest
from lhotse_tpu.utils import fastcopy


@pytest.fixture
def cuts_path(tmp_path):
    cuts = DummyManifest(CutSet, begin_id=0, end_id=12)
    cuts = CutSet.from_cuts(
        fastcopy(c, duration=1.0 + (i % 3)) for i, c in enumerate(cuts)
    )
    p = tmp_path / "cuts.jsonl"
    cuts.to_file(p)
    return p


def _take(sampler, n):
    return [[c.id for c in b] for b in itertools.islice(iter(sampler), n)]


def test_infinite_and_deterministic_by_seed(tmp_path, cuts_path):
    mk = lambda seed: StatelessSampler(
        cuts_paths=[cuts_path], index_path=tmp_path / "f.idx",
        base_seed=seed, max_cuts=3)
    a = _take(mk(5), 8)
    assert len(a) == 8  # never exhausts
    assert a == _take(mk(5), 8)  # same seed -> same stream
    assert a != _take(mk(6), 8)  # different seed -> different stream


def test_bucketing_mode_groups_durations(tmp_path, cuts_path):
    sampler = StatelessSampler(
        cuts_paths=[cuts_path], index_path=tmp_path / "f.idx", base_seed=0,
        max_duration=6.0, num_buckets=3, duration_bins=[1.5, 2.5])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        batches = list(itertools.islice(iter(sampler), 12))
    spread = 0
    for b in batches:
        durs = [c.duration for c in b]
        spread = max(spread, max(durs) - min(durs))
    assert spread == 0  # bins at 1.5/2.5 perfectly separate 1s/2s/3s cuts


def test_requires_uncompressed_manifest(tmp_path):
    cuts = DummyManifest(CutSet, begin_id=0, end_id=4)
    gz = tmp_path / "cuts.jsonl.gz"
    cuts.to_file(gz)
    with pytest.raises(Exception):
        next(
            iter(
                StatelessSampler(
                    cuts_paths=[gz], index_path=tmp_path / "f.idx",
                    base_seed=0, max_cuts=2)
            )
        )


def test_map_transform_applies(tmp_path, cuts_path):
    sampler = StatelessSampler(
        cuts_paths=[cuts_path], index_path=tmp_path / "f.idx", base_seed=1,
        max_cuts=2,
    ).map(_mark)
    batch = next(iter(sampler))
    assert all(c.id.endswith("-m") for c in batch)


def _mark(cuts):
    return CutSet.from_cuts(fastcopy(c, id=c.id + "-m") for c in cuts)


def test_in_iterable_dataset_wrapper(tmp_path, cuts_path):
    from lhotse_tpu.dataset.iterable_dataset import IterableDatasetWrapper

    class Ids:
        def __getitem__(self, cuts):
            return [c.id for c in cuts]

    sampler = StatelessSampler(
        cuts_paths=[cuts_path], index_path=tmp_path / "f.idx", base_seed=3,
        max_cuts=4)
    wrapper = IterableDatasetWrapper(dataset=Ids(), sampler=sampler)
    got = list(itertools.islice(iter(wrapper), 5))
    assert len(got) == 5
    assert all(len(ids) == 4 for ids in got)
