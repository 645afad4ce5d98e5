"""
Interop with torch.utils.data.DataLoader — the reference's canonical
training-loop pattern. The library is torch-free, but its worker-identity
fallback (dataloading.get_worker_info -> torch worker info) and
IterableDatasetWrapper must work inside real torch DataLoader workers.
"""
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from lhotse_tpu import CutSet
from lhotse_tpu.dataset.dataloading import make_worker_init_fn
from lhotse_tpu.dataset.iterable_dataset import IdentityDataset, IterableDatasetWrapper
from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
from lhotse_tpu.testing.dummies import DummyManifest

N_CUTS = 24
N_SHARDS = 8


@pytest.fixture(scope="module")
def shar_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("torch_shar")
    cuts = DummyManifest(CutSet, begin_id=0, end_id=N_CUTS, with_data=True)
    for c in cuts:
        c.custom = {}
        c.features = None
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cuts.to_shar(d, fields={"recording": "wav"}, shard_size=N_CUTS // N_SHARDS,
                     compress_jsonl=False, create_index=False)
    return d


def test_iterable_wrapper_in_torch_workers(shar_dir):
    """Each torch DataLoader worker holds its own sampler replica over a
    disjoint shard split; the union over workers is the full dataset."""
    cuts = CutSet.from_shar(in_dir=str(shar_dir), split_for_dataloading=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sampler = DynamicCutSampler(cuts, max_cuts=3, shuffle=False)
        wrapper = IterableDatasetWrapper(IdentityDataset(), sampler)
        loader = torch.utils.data.DataLoader(
            wrapper, batch_size=None, num_workers=2,
            worker_init_fn=make_worker_init_fn(rank=0, world_size=1),
        )
        seen = []
        for batch in loader:
            seen.extend(c.id for c in batch)
    assert sorted(seen) == sorted(f"dummy-mono-cut-{i:04d}" for i in range(N_CUTS))


def test_torch_worker_info_fallback(shar_dir):
    """Inside a torch worker (without our WorkerInfo set), worker identity
    must come from torch.utils.data.get_worker_info()."""

    class ProbeDataset(torch.utils.data.IterableDataset):
        def __iter__(self):
            from lhotse_tpu.dataset.dataloading import get_worker_info

            wi = get_worker_info()
            yield (wi.id, wi.num_workers) if wi is not None else (None, None)

    loader = torch.utils.data.DataLoader(ProbeDataset(), batch_size=None, num_workers=2)
    out = sorted(tuple(x) for x in loader)  # default collate listifies tuples
    assert out == [(0, 2), (1, 2)]


def test_map_style_with_torch_sampler_batches(shar_dir):
    """Map-style pattern: sampler in the main process, torch DataLoader with
    our sampler as the (batch) sampler and the dataset doing the IO."""
    from lhotse_tpu.dataset import OnTheFlyFeatures
    from lhotse_tpu import Fbank
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

    cuts = CutSet.from_shar(in_dir=str(shar_dir)).to_eager()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sampler = DynamicCutSampler(cuts, max_cuts=6, shuffle=True, seed=3)
        ds = K2SpeechRecognitionDataset(input_strategy=OnTheFlyFeatures(Fbank()))
        loader = torch.utils.data.DataLoader(
            ds, sampler=sampler, batch_size=None, num_workers=0)
        n_cuts = 0
        for batch in loader:
            feats = batch["inputs"]
            assert feats.shape[-1] == 80
            n_cuts += feats.shape[0]
    assert n_cuts == N_CUTS


def test_map_style_with_torch_spawned_workers(shar_dir):
    """Same pattern but with torch worker SUBPROCESSES: the sampler must
    pickle into the workers and every cut arrive exactly once."""
    from lhotse_tpu.dataset import OnTheFlyFeatures
    from lhotse_tpu import Fbank
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

    cuts = CutSet.from_shar(in_dir=str(shar_dir)).to_eager()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sampler = DynamicCutSampler(cuts, max_cuts=4, shuffle=True, seed=1)
        ds = K2SpeechRecognitionDataset(input_strategy=OnTheFlyFeatures(Fbank()))
        loader = torch.utils.data.DataLoader(
            ds, sampler=sampler, batch_size=None, num_workers=2)
        total = 0
        for batch in loader:
            assert batch["inputs"].shape[-1] == 80
            total += batch["inputs"].shape[0]
    assert total == N_CUTS
