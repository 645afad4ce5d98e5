"""
Samplers must survive pickling (the multiprocess DataLoader ships them to
spawned workers): fresh and with filters, with identical batch streams.

Behavioral model: /root/reference/test/dataset/sampling/test_sampler_pickling.py.
"""
import pickle
import warnings

import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.dataset.sampling.bucketing import BucketingSampler
from lhotse_tpu.dataset.sampling.cut_pairs import CutPairsSampler
from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler
from lhotse_tpu.dataset.sampling.round_robin import RoundRobinSampler
from lhotse_tpu.dataset.sampling.simple import SimpleCutSampler
from lhotse_tpu.dataset.sampling.zip import ZipSampler
from lhotse_tpu.testing.dummies import DummyManifest
from lhotse_tpu.utils import is_module_available


def _cuts(n=6):
    return DummyManifest(CutSet, begin_id=0, end_id=n)


def _keep_first(cut):
    return cut.id == "dummy-mono-cut-0000"


def _make_samplers():
    cuts = _cuts()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return [
            SimpleCutSampler(cuts, max_cuts=2),
            DynamicCutSampler(cuts, max_cuts=2),
            DynamicBucketingSampler(
                cuts, max_cuts=2, num_buckets=2, buffer_size=16
            ),
            BucketingSampler(cuts, max_cuts=2, num_buckets=2),
            ZipSampler(
                SimpleCutSampler(cuts, max_cuts=2),
                SimpleCutSampler(cuts, max_cuts=2),
            ),
            RoundRobinSampler(
                SimpleCutSampler(cuts, max_cuts=2),
                SimpleCutSampler(cuts, max_cuts=2),
            ),
            CutPairsSampler(cuts, cuts, max_cuts=2),
        ]


@pytest.mark.parametrize("idx", range(7))
def test_sampler_pickles_with_equal_state(idx):
    sampler = _make_samplers()[idx]
    restored = pickle.loads(pickle.dumps(sampler))
    assert type(restored) is type(sampler)
    assert restored.state_dict() == sampler.state_dict()


def _batch_ids(batch):
    if isinstance(batch, tuple):
        batch = batch[0]
    return [c.id for c in batch]


@pytest.mark.parametrize("idx", range(7))
def test_pickled_sampler_yields_identical_batches(idx):
    a = _make_samplers()[idx]
    b = pickle.loads(pickle.dumps(a))
    assert [_batch_ids(x) for x in a] == [_batch_ids(x) for x in b]


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_sampler_pickling_with_module_level_filter(idx):
    sampler = _make_samplers()[idx]
    sampler.filter(_keep_first)
    restored = pickle.loads(pickle.dumps(sampler))
    batches = [_batch_ids(x) for x in restored]
    assert batches == [["dummy-mono-cut-0000"]]


@pytest.mark.skipif(
    not is_module_available("dill"), reason="closure pickling requires dill"
)
def test_sampler_pickling_with_closure_filter_needs_dill():
    from lhotse_tpu.lazy import dill_enabled

    keep_id = "dummy-mono-cut-0001"
    with dill_enabled(True):
        sampler = SimpleCutSampler(_cuts(), max_cuts=2)
        sampler.filter(lambda c: c.id == keep_id)  # a real closure
        restored = pickle.loads(pickle.dumps(sampler))
        assert [_batch_ids(x) for x in restored] == [[keep_id]]


def test_sampler_closure_filter_without_dill_fails(monkeypatch):
    # Plain pickle cannot serialize a lambda; the Dillable path only rescues
    # it when LHOTSE_DILL_ENABLED is on. Force the flag off so this exercises
    # the no-dill behavior even in environments where dill is installed
    # (matches /root/reference/lhotse/lazy.py Dillable semantics).
    monkeypatch.setenv("LHOTSE_DILL_ENABLED", "0")
    sampler = SimpleCutSampler(_cuts(), max_cuts=2)
    sampler.filter(lambda c: True)
    with pytest.raises(Exception):
        pickle.dumps(sampler)
