"""DataLoader (library-owned) + host->device double-buffered prefetch."""
import numpy as np
import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.dataset import (
    DataLoader, K2SpeechRecognitionDataset, SimpleCutSampler, device_prefetch)
from lhotse_tpu.testing.dummies import dummy_cut, dummy_supervision


@pytest.fixture
def cuts():
    return CutSet.from_cuts(
        dummy_cut(
            i,
            with_data=True,
            duration=1.0,
            supervisions=[dummy_supervision(i, duration=1.0, text=f"utt {i}")],
        )
        for i in range(10)
    )


def test_dataloader_prefetch_matches_sequential(cuts):
    dataset = K2SpeechRecognitionDataset()
    sequential = [dataset[batch] for batch in SimpleCutSampler(cuts, max_cuts=3, shuffle=False)]
    loader = DataLoader(
        SimpleCutSampler(cuts, max_cuts=3, shuffle=False), dataset, prefetch_batches=2)
    prefetched = list(loader)
    assert len(prefetched) == len(sequential) == 4
    for a, b in zip(sequential, prefetched):
        np.testing.assert_array_equal(a["inputs"], b["inputs"])
        assert a["supervisions"]["text"] == b["supervisions"]["text"]


def test_dataloader_zero_prefetch_and_apply_fn(cuts):
    loader = DataLoader(
        SimpleCutSampler(cuts, max_cuts=5, shuffle=False), K2SpeechRecognitionDataset(),
        prefetch_batches=0, apply_fn=lambda b: b["inputs"].shape)
    shapes = list(loader)
    assert len(shapes) == 2 and all(s[0] == 5 for s in shapes)


def test_dataloader_propagates_worker_errors(cuts):
    class Boom:
        def __getitem__(self, cuts):
            raise RuntimeError("boom")

    loader = DataLoader(SimpleCutSampler(cuts, max_cuts=3), Boom(), prefetch_batches=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_dataloader_state_dict_roundtrip(cuts):
    sampler = SimpleCutSampler(cuts, max_cuts=3, shuffle=False)
    loader = DataLoader(sampler, K2SpeechRecognitionDataset(), prefetch_batches=1)
    sd = loader.state_dict()
    assert "sampler" in sd
    loader.load_state_dict(sd)


def test_device_prefetch_stages_on_device():
    import jax

    batches = [{"inputs": np.ones((2, 4), dtype=np.float32) * i, "meta": f"b{i}"} for i in range(5)]
    out = list(device_prefetch(batches, size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["inputs"], jax.Array)
        assert float(b["inputs"][0, 0]) == float(i)
        assert b["meta"] == f"b{i}"  # non-array leaves pass through


def test_device_prefetch_with_sharding():
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("data",))
    sharding = NamedSharding(mesh, P("data"))
    batches = [{"x": np.arange(8, dtype=np.float32).reshape(4, 2)}]
    (out,) = list(device_prefetch(batches, size=2, sharding=sharding))
    assert out["x"].sharding == sharding
    np.testing.assert_array_equal(np.asarray(out["x"]), batches[0]["x"])


@pytest.mark.parametrize("n_threads", [1, 2, 3])
def test_threadpool_assembly_matches_sequential_order(cuts, n_threads):
    dataset = K2SpeechRecognitionDataset()
    sequential = [
        dataset[batch] for batch in SimpleCutSampler(cuts, max_cuts=3, shuffle=False)
    ]
    loader = DataLoader(
        SimpleCutSampler(cuts, max_cuts=3, shuffle=False),
        dataset,
        num_thread_workers=n_threads,
    )
    pooled = list(loader)
    assert len(pooled) == len(sequential)
    for a, b in zip(sequential, pooled):
        np.testing.assert_array_equal(a["inputs"], b["inputs"])
        assert a["supervisions"]["text"] == b["supervisions"]["text"]


def test_threadpool_propagates_errors(cuts):
    class Boom:
        def __getitem__(self, cuts):
            raise RuntimeError("boom")

    loader = DataLoader(SimpleCutSampler(cuts, max_cuts=3), Boom(), num_thread_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_threadpool_early_abandon_does_not_hang(cuts):
    loader = DataLoader(
        SimpleCutSampler(cuts, max_cuts=2, shuffle=False),
        K2SpeechRecognitionDataset(),
        num_thread_workers=3,
    )
    it = iter(loader)
    next(it)
    it.close()  # must release blocked workers, not deadlock


def test_threadpool_and_processes_are_exclusive(cuts):
    with pytest.raises(ValueError, match="mutually"):
        DataLoader(
            SimpleCutSampler(cuts, max_cuts=3),
            K2SpeechRecognitionDataset(),
            num_workers=2,
            num_thread_workers=2,
        )


def test_threadpool_apply_fn(cuts):
    loader = DataLoader(
        SimpleCutSampler(cuts, max_cuts=5, shuffle=False),
        K2SpeechRecognitionDataset(),
        num_thread_workers=2,
        apply_fn=lambda b: b["inputs"].shape,
    )
    shapes = list(loader)
    assert len(shapes) == 2 and all(s[0] == 5 for s in shapes)


@pytest.mark.parametrize("kwargs", [
    dict(prefetch_batches=3),
    dict(prefetch_batches=0),
    dict(num_thread_workers=3, prefetch_batches=2),
])
def test_loader_checkpoint_reflects_yielded_batches(cuts, kwargs):
    """With prefetch/thread workers the sampler runs AHEAD of consumption;
    loader.state_dict() must checkpoint the last YIELDED batch, so
    consume-k -> checkpoint -> restore -> rest reproduces the full epoch."""
    dataset = K2SpeechRecognitionDataset()

    def texts(batch):
        return batch["supervisions"]["text"]

    full = [
        texts(b)
        for b in DataLoader(
            SimpleCutSampler(cuts, max_cuts=2, shuffle=False), dataset, **kwargs
        )
    ]
    assert len(full) == 5

    loader = DataLoader(
        SimpleCutSampler(cuts, max_cuts=2, shuffle=False), dataset, **kwargs
    )
    it = iter(loader)
    consumed = [texts(next(it)) for _ in range(2)]
    sd = loader.state_dict()
    it.close()

    restored = DataLoader(
        SimpleCutSampler(cuts, max_cuts=2, shuffle=False), dataset, **kwargs
    )
    restored.load_state_dict(sd)
    rest = [texts(b) for b in restored]
    assert consumed + rest == full
