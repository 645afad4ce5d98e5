"""
End-to-end dataloading checkpoint sweeps: full pipelines (indexed manifests
-> sampler -> dataset -> DataLoader) checkpointed at EVERY batch position
and resumed into a fresh pipeline, requiring the remaining batch stream to
match the uninterrupted run exactly.

Behavioral model: /root/reference/test/dataset/test_e2e_checkpoint_restore.py.
"""
import json

import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank
from lhotse_tpu.dataset import DataLoader
from lhotse_tpu.dataset.input_strategies import OnTheFlyFeatures
from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler
from lhotse_tpu import Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.indexing import create_jsonl_index
from lhotse_tpu.utils import fastcopy

SR = 16000


class FeatureDataset:
    """ids + on-the-fly fbank, enough to verify exact batch equality."""

    def __init__(self):
        self.extract = OnTheFlyFeatures(Fbank())

    def __getitem__(self, cuts):
        feats, lens = self.extract(cuts)[:2]
        return {
            "ids": [c.id for c in cuts],
            "feats": np.asarray(feats),
            "lens": np.asarray(lens),
        }


def _indexed_cuts(tmp_path, name, n, start=0):
    out = []
    for i in range(start, start + n):
        dur = 1.0 + 0.05 * (i % 3)
        ns = int(dur * SR)
        p = tmp_path / f"{name}{i}.wav"
        write_wav(
            str(p),
            (0.1 * np.sin(2 * np.pi * (100 + i) * np.arange(ns) / SR)).astype(
                np.float32
            ),
            SR,
        )
        rec = Recording.from_file(p, recording_id=f"{name}{i}")
        c = rec.to_cut()
        c.supervisions = [
            SupervisionSegment(
                id=f"{name}{i}-sup", recording_id=rec.id, start=0, duration=dur)
        ]
        out.append(c)
    path = tmp_path / f"{name}.jsonl"
    CutSet.from_cuts(out).to_file(path)
    create_jsonl_index(path)
    return CutSet.from_file(path)


def _mark(cut):
    return fastcopy(cut, id=cut.id + "-m")


def sweep(make_loader):
    """Checkpoint/restore at every batch boundary must continue exactly."""
    baseline = [b["ids"] for b in make_loader()]
    assert len(baseline) >= 3
    for k in range(len(baseline) + 1):
        loader = make_loader()
        it = iter(loader)
        head = [next(it)["ids"] for _ in range(k)]
        state = loader.state_dict()
        # Close the abandoned iterator: its prefetch thread would otherwise
        # keep consuming the lazy graph, racing the resumed pipeline below
        # when loaders share source nodes (single-iterator contract).
        it.close()

        resumed = make_loader()
        resumed.load_state_dict(state)
        rest = list(resumed)
        assert head + [b["ids"] for b in rest] == baseline, f"diverged at k={k}"
        if rest:
            # Feature payloads also reproduce, not just the cut ids.
            again = make_loader()
            again.load_state_dict(state)
            first = next(iter(again))
            np.testing.assert_array_equal(first["feats"], rest[0]["feats"])


def test_basic_pipeline_sweep(tmp_path):
    cuts = _indexed_cuts(tmp_path, "a", 12)

    def make():
        sampler = DynamicCutSampler(cuts, max_cuts=3, shuffle=True, seed=7)
        return DataLoader(sampler, FeatureDataset(), prefetch_batches=2)

    sweep(make)


def test_mux_pipeline_sweep(tmp_path):
    a = _indexed_cuts(tmp_path, "a", 8)
    b = _indexed_cuts(tmp_path, "b", 6, start=100)

    def make():
        muxed = CutSet.mux(a, b, seed=3)
        sampler = DynamicCutSampler(muxed, max_cuts=3)
        return DataLoader(sampler, FeatureDataset(), prefetch_batches=1)

    sweep(make)


def test_mapped_pipeline_sweep(tmp_path):
    cuts = _indexed_cuts(tmp_path, "a", 10)

    def make():
        sampler = DynamicCutSampler(cuts.map(_mark), max_cuts=4, shuffle=True, seed=1)
        return DataLoader(sampler, FeatureDataset(), prefetch_batches=2)

    sweep(make)
    # The transform is visibly applied in the yielded batches.
    some = next(iter(make()))
    assert all(i.endswith("-m") for i in some["ids"])


def test_bucketing_pipeline_sweep(tmp_path):
    cuts = _indexed_cuts(tmp_path, "a", 14)

    def make():
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sampler = DynamicBucketingSampler(
                cuts, max_cuts=3, num_buckets=2, buffer_size=16, shuffle=True, seed=5
            )
        return DataLoader(sampler, FeatureDataset(), prefetch_batches=2)

    sweep(make)


def test_checkpoint_survives_json_serialization(tmp_path):
    cuts = _indexed_cuts(tmp_path, "a", 9)

    def make():
        sampler = DynamicCutSampler(cuts, max_cuts=3, shuffle=True, seed=2)
        return DataLoader(sampler, FeatureDataset(), prefetch_batches=1)

    baseline = [b["ids"] for b in make()]
    loader = make()
    it = iter(loader)
    head = [next(it)["ids"] for _ in range(2)]
    blob = json.dumps(loader.state_dict())  # must be plain JSON

    resumed = make()
    resumed.load_state_dict(json.loads(blob))
    assert head + [b["ids"] for b in resumed] == baseline


def test_epoch_boundary_resume(tmp_path):
    # Finish an epoch, checkpoint, re-iterate: the next epoch reshuffles
    # rather than replaying, and a restored sampler agrees with it.
    # Contract (matches base.set_epoch): right after load_state_dict,
    # set_epoch is a deliberate no-op so it cannot clobber restored
    # progress — the resumed iteration first drains the saved epoch
    # (here: nothing, we checkpointed at its end), and only then does
    # set_epoch take effect for the next pass.
    cuts = _indexed_cuts(tmp_path, "a", 9)
    sampler = DynamicCutSampler(cuts, max_cuts=3, shuffle=True, seed=4)
    epoch0 = [[c.id for c in b] for b in sampler]
    state = sampler.state_dict()
    sampler.set_epoch(1)
    epoch1 = [[c.id for c in b] for b in sampler]
    assert sorted(sum(epoch0, [])) == sorted(sum(epoch1, []))
    assert epoch0 != epoch1

    fresh = DynamicCutSampler(cuts, max_cuts=3, shuffle=True, seed=4)
    fresh.load_state_dict(state)
    fresh.set_epoch(1)  # no-op: restored state governs until it is drained
    assert [[c.id for c in b] for b in fresh] == []  # saved epoch was finished
    fresh.set_epoch(1)  # now it takes effect
    assert [[c.id for c in b] for b in fresh] == epoch1
