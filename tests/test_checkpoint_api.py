"""
The public checkpoint API (lhotse_tpu/checkpoint.py): graph-wide state
collection/restoration and the JSON-serializable DataloaderCheckpoint
container (reference tests: test/test_checkpoint.py,
test_iterator_node_e2e_checkpoint.py).
"""
import json

import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.checkpoint import (
    DataloaderCheckpoint,
    collect_state_dict,
    restore_state_dict,
)
from lhotse_tpu.testing.dummies import DummyManifest


@pytest.fixture
def lazy_cuts_path(tmp_path):
    p = tmp_path / "cuts.jsonl.gz"
    DummyManifest(CutSet, begin_id=0, end_id=30).to_file(p)
    return p


def _pipeline(path):
    # repeat() over a positional jsonl iterator: a checkpointable 2-node graph
    # (shuffle would need an indexed source for graph restore).
    return CutSet.from_jsonl_lazy(path).repeat(2)


def test_collect_restore_midstream_exact_continuation(lazy_cuts_path):
    full = [c.id for c in _pipeline(lazy_cuts_path)]

    pipe = _pipeline(lazy_cuts_path)
    it = iter(pipe)
    head = [next(it).id for _ in range(12)]
    state = collect_state_dict(pipe.data)

    fresh = _pipeline(lazy_cuts_path)
    restore_state_dict(fresh.data, state)
    tail = [c.id for c in fresh]
    assert head + tail == full


def test_collect_rejects_uncheckpointable_composites(lazy_cuts_path):
    # A lambda-filter node is not checkpointable; the graph collector must
    # refuse loudly rather than silently skip it.
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pipe = CutSet.from_jsonl_lazy(lazy_cuts_path).filter(lambda c: True)
    if not pipe.data.is_checkpointable:
        with pytest.raises(NotImplementedError):
            collect_state_dict(pipe.data)


def test_restore_rejects_mismatched_graph_type(lazy_cuts_path):
    pipe = _pipeline(lazy_cuts_path)
    iter(pipe)
    state = collect_state_dict(pipe.data)
    other = CutSet.from_jsonl_lazy(lazy_cuts_path)  # different node type
    with pytest.raises((TypeError, ValueError)):
        restore_state_dict(other.data, state)


def test_dataloader_checkpoint_json_roundtrip(tmp_path, lazy_cuts_path):
    pipe = _pipeline(lazy_cuts_path)
    it = iter(pipe)
    for _ in range(5):
        next(it)
    ckpt = DataloaderCheckpoint(
        num_workers=2, world_size=4, rank=1,
        worker_states=[collect_state_dict(pipe.data)],
        sampler_state={"step": 5})
    path = tmp_path / "ckpt.json"
    ckpt.save(path)
    # The payload must be plain JSON (rng tuples serialized to lists).
    json.loads(path.read_text())

    loaded = DataloaderCheckpoint.load(path)
    assert loaded.num_workers == 2 and loaded.rank == 1
    assert loaded.sampler_state == {"step": 5}
    loaded.validate(num_workers=2, world_size=4, rank=1)
    with pytest.raises(ValueError, match="world_size"):
        loaded.validate(num_workers=2, world_size=8, rank=1)

    # The JSON-round-tripped worker state still restores the graph exactly.
    full = [c.id for c in _pipeline(lazy_cuts_path)]
    head = [c.id for i, c in zip(range(5), _pipeline(lazy_cuts_path))]
    fresh = _pipeline(lazy_cuts_path)
    restore_state_dict(fresh.data, loaded.worker_states[0])
    tail = [c.id for c in fresh]
    assert head + tail == full


def test_cutset_state_dict_surface(tmp_path, lazy_cuts_path):
    """The CutSet-level convenience wrappers around collect/restore."""
    full = [c.id for c in CutSet.from_jsonl_lazy(lazy_cuts_path).repeat(2)]

    pipe = CutSet.from_jsonl_lazy(lazy_cuts_path).repeat(2)
    it = iter(pipe)
    head = [next(it).id for _ in range(7)]
    state = pipe.state_dict()

    fresh = CutSet.from_jsonl_lazy(lazy_cuts_path).repeat(2)
    fresh.load_state_dict(state)
    assert head + [c.id for c in fresh] == full


def test_cutset_state_dict_eager_raises(lazy_cuts_path):
    eager = CutSet.from_jsonl_lazy(lazy_cuts_path).to_eager()
    with pytest.raises(RuntimeError, match="lazy"):
        eager.state_dict()
    with pytest.raises(RuntimeError, match="lazy"):
        eager.load_state_dict({})


def test_collect_does_not_duplicate_checkpointable_children(lazy_cuts_path):
    # A checkpointable composite's state COVERS its children: the collector
    # must not also serialize them as separate graph entries.
    pipe = CutSet.from_jsonl_lazy(lazy_cuts_path).repeat(2)
    iter(pipe)
    state = collect_state_dict(pipe.data)
    assert set(state) == {"_type", "_state"}  # no parallel "source"/"sources" keys
