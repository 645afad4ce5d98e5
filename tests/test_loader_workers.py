"""Multiprocess DataLoader: dedup modes, ordering, and error propagation."""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank, SupervisionSegment
from lhotse_tpu.dataset.loader import DataLoader
from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler


class _SumDataset:
    """Picklable toy dataset: batch = ids + total duration."""

    def __getitem__(self, cuts):
        return {"ids": sorted(c.id for c in cuts), "dur": round(sum(c.duration for c in cuts), 3)}


class _BoomDataset:
    def __getitem__(self, cuts):
        raise ValueError("boom")


def _make_cuts(tmp_path, n=20):
    import numpy as np

    from lhotse_tpu import Recording
    from lhotse_tpu.audio.wavio import write_wav

    cuts = []
    for i in range(n):
        dur = 1.0 + 0.25 * (i % 4)
        sr = 16000
        wav = tmp_path / f"r{i}.wav"
        x = (np.sin(2 * np.pi * 300 * np.arange(int(sr * dur)) / sr) * 0.3).astype(np.float32)
        write_wav(str(wav), x, sr)
        cut = Recording.from_file(wav, recording_id=f"rec{i:03d}").to_cut()
        cut.supervisions.append(
            SupervisionSegment(
                id=f"sup{i:03d}", recording_id=cut.recording_id,
                start=0.0, duration=cut.duration, text="hello",
            )
        )
        cuts.append(cut)
    cuts = CutSet.from_cuts(cuts)
    p = tmp_path / "cuts.jsonl"
    cuts.to_file(p)
    return p


def _collect(path, num_workers, **kw):
    sampler = DynamicCutSampler(
        CutSet.from_jsonl_lazy(path), max_cuts=3, world_size=1, rank=0, seed=0)
    loader = DataLoader(sampler, _SumDataset(), num_workers=num_workers, prefetch_batches=2, **kw)
    return list(loader)


def test_batch_dedup_matches_single_process_order(tmp_path):
    path = _make_cuts(tmp_path)
    solo = _collect(path, num_workers=0)
    fleet = _collect(path, num_workers=3)
    assert fleet == solo


def test_single_worker_equivalent(tmp_path):
    path = _make_cuts(tmp_path)
    assert _collect(path, num_workers=1) == _collect(path, num_workers=0)


def test_worker_error_propagates(tmp_path):
    path = _make_cuts(tmp_path, n=6)
    sampler = DynamicCutSampler(
        CutSet.from_jsonl_lazy(path), max_cuts=3, world_size=1, rank=0, seed=0)
    loader = DataLoader(sampler, _BoomDataset(), num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_partition_dedup_covers_all_cuts_once(tmp_path):
    # Indexed source -> each worker owns a disjoint stripe of the data.
    from lhotse_tpu.indexing import create_jsonl_index
    from lhotse_tpu.lazy import LazyIndexedManifestIterator

    path = _make_cuts(tmp_path, n=24)
    create_jsonl_index(path)
    cuts = CutSet(LazyIndexedManifestIterator(path))
    sampler = DynamicCutSampler(cuts, max_cuts=4, world_size=1, rank=0, seed=0)
    loader = DataLoader(sampler, _SumDataset(), num_workers=3, worker_dedup="partition")
    seen = [i for b in loader for i in b["ids"]]
    assert len(seen) == 24
    assert len(set(seen)) == 24


def test_real_feature_extraction_in_workers(tmp_path):
    """End-to-end: decode + fbank inside worker processes."""
    from lhotse_tpu.dataset.input_strategies import OnTheFlyFeatures
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

    path = _make_cuts(tmp_path, n=8)
    sampler = DynamicCutSampler(
        CutSet.from_jsonl_lazy(path), max_cuts=4, world_size=1, rank=0, seed=0)
    dataset = K2SpeechRecognitionDataset(input_strategy=OnTheFlyFeatures(Fbank()))
    batches = list(DataLoader(sampler, dataset, num_workers=2))
    assert len(batches) == 2
    for b in batches:
        assert b["inputs"].ndim == 3 and b["inputs"].shape[-1] == 80
        assert np.isfinite(np.asarray(b["inputs"])).all()


def test_mp_batch_dedup_checkpoint_reflects_yielded(tmp_path):
    """Multiprocess batch-dedup workers ship per-batch sampler snapshots:
    consume-k -> checkpoint -> restore (serial) -> rest == full epoch."""
    path = _make_cuts(tmp_path, n=12)

    def make_sampler():
        return DynamicCutSampler(
            CutSet.from_jsonl_lazy(path), max_cuts=3, world_size=1, rank=0, seed=0)

    full = [b["ids"] for b in DataLoader(make_sampler(), _SumDataset(), num_workers=2)]
    assert len(full) == 4

    loader = DataLoader(make_sampler(), _SumDataset(), num_workers=2)
    it = iter(loader)
    consumed = [next(it)["ids"] for _ in range(2)]
    sd = loader.state_dict()
    it.close()

    restored = DataLoader(make_sampler(), _SumDataset())
    restored.load_state_dict(sd)
    rest = [b["ids"] for b in restored]
    assert consumed + rest == full
