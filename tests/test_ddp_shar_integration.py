"""
The distributed training data path end-to-end: Shar shards → per-(rank,
worker) partition → sampler → DataLoader → features, asserting shard
dedup/completeness across the full (world_size x num_workers) grid.
"""
import warnings

import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank
from lhotse_tpu.testing.dummies import DummyManifest


N_CUTS = 24
N_SHARDS = 8


@pytest.fixture(scope="module")
def shar_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shar_ddp")
    cuts = DummyManifest(CutSet, begin_id=0, end_id=N_CUTS, with_data=True)
    for c in cuts:
        c.custom = {}
        c.features = None
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cuts.to_shar(
            str(d), fields={"recording": "wav"}, shard_size=N_CUTS // N_SHARDS,
            compress_jsonl=False, create_index=True)
    return d


def _rank_worker_ids(shar_dir, rank, world_size, worker, num_workers, monkeypatch):
    """Iterate the shard subset this (rank, worker) replica would see."""
    monkeypatch.setenv("RANK", str(rank))
    monkeypatch.setenv("WORLD_SIZE", str(world_size))
    from lhotse_tpu.dataset.dataloading import set_worker_info, WorkerInfo

    set_worker_info(WorkerInfo(id=worker, num_workers=num_workers, seed=0))
    try:
        cuts = CutSet.from_shar(in_dir=str(shar_dir), split_for_dataloading=True)
        return [c.id for c in cuts]
    finally:
        set_worker_info(None)


@pytest.mark.parametrize("world_size,num_workers", [(2, 2), (4, 1), (1, 4), (2, 1)])
def test_rank_worker_grid_partitions_shards(shar_dir, world_size, num_workers, monkeypatch):
    all_ids = []
    per_replica = []
    for rank in range(world_size):
        for worker in range(num_workers):
            ids = _rank_worker_ids(
                shar_dir, rank, world_size, worker, num_workers, monkeypatch)
            per_replica.append(set(ids))
            all_ids.extend(ids)
    # Disjoint across every replica...
    for i in range(len(per_replica)):
        for j in range(i + 1, len(per_replica)):
            assert not (per_replica[i] & per_replica[j])
    # ...and jointly complete.
    assert len(all_ids) == N_CUTS
    assert sorted(all_ids) == sorted(
        f"dummy-mono-cut-{i:04d}" for i in range(N_CUTS))


def test_shar_to_features_through_spawned_workers(shar_dir):
    """Full pipeline with real process workers: shar -> sampler -> DataLoader
    (partition dedup) -> on-the-fly fbank batches; every cut featurized once."""
    from lhotse_tpu.dataset.input_strategies import OnTheFlyFeatures
    from lhotse_tpu.dataset.loader import DataLoader
    from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

    cuts = CutSet.from_shar(in_dir=str(shar_dir))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sampler = DynamicCutSampler(cuts, max_cuts=4, shuffle=False, seed=0)
        ds = K2SpeechRecognitionDataset(
            input_strategy=OnTheFlyFeatures(Fbank()), return_cuts=True)
        loader = DataLoader(
            sampler, ds, num_workers=2, worker_dedup="partition",
            prefetch_batches=1)
        seen = []
        for batch in loader:
            feats = batch["inputs"]
            assert feats.ndim == 3 and feats.shape[-1] == 80
            assert np.isfinite(np.asarray(feats)).all()
            seen.extend(c.id for c in batch["supervisions"]["cut"])
    assert sorted(seen) == sorted(f"dummy-mono-cut-{i:04d}" for i in range(N_CUTS))


def test_global_batch_assembly_over_virtual_mesh(shar_dir):
    """shard_batch places per-host arrays onto a multi-device mesh with
    batch-dim sharding — the same call a real multi-host train loop uses."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    from lhotse_tpu.parallel.mesh import shard_batch

    devices = np.array(jax.devices()[:4])
    if devices.size < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(devices.reshape(4, 1), axis_names=("data", "model"))
    feats = np.zeros((8, 100, 80), np.float32)
    lens = np.full((8,), 100, np.int32)
    gf, gl = shard_batch((feats, lens), mesh, axis_name="data")
    assert gf.shape == (8, 100, 80)
    assert gf.sharding.spec == P("data")
    # Each device holds exactly batch/4 rows.
    shard_shapes = {s.data.shape for s in gf.addressable_shards}
    assert shard_shapes == {(2, 100, 80)}
