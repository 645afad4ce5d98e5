"""
The documentation's code snippets must actually run: stale docs are the
first thing a migrating user hits. These tests mirror the getting-started
and migration-guide examples with tiny local data.
"""
import warnings

import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank, Recording, RecordingSet, SupervisionSegment, SupervisionSet
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


@pytest.fixture
def manifests(tmp_path):
    recs, sups = [], []
    for i in range(4):
        t = np.arange(int(SR * 1.5)) / SR
        write_wav(tmp_path / f"u{i}.wav", (0.2 * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(np.float32), SR)
        r = Recording.from_file(tmp_path / f"u{i}.wav")
        recs.append(r)
        sups.append(SupervisionSegment(
            id=f"s{i}", recording_id=r.id, start=0.0, duration=r.duration,
            channel=0, text=f"utt {i}"))
    return {"recordings": RecordingSet.from_recordings(recs),
            "supervisions": SupervisionSet.from_segments(sups)}


def test_getting_started_feature_compute(tmp_path, manifests):
    cuts = CutSet.from_manifests(**manifests)
    cuts = cuts.compute_and_store_features_batch(
        extractor=Fbank(),
        storage_path=str(tmp_path / "feats"),
        manifest_path=str(tmp_path / "cuts.jsonl.gz"),
        batch_duration=20.0,
    )
    loaded = CutSet.from_file(tmp_path / "cuts.jsonl.gz")
    for c in loaded:
        assert c.load_features().shape[1] == 80


def test_getting_started_training_pipeline(manifests):
    from lhotse_tpu.dataset import (
        DataLoader,
        DynamicBucketingSampler,
        K2SpeechRecognitionDataset,
        OnTheFlyFeatures,
        device_prefetch,
    )

    cuts = CutSet.from_manifests(**manifests)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sampler = DynamicBucketingSampler(
            cuts, max_duration=4.0, num_buckets=2, shuffle=True, drop_last=False)
        dataset = K2SpeechRecognitionDataset(input_strategy=OnTheFlyFeatures(Fbank()))
        loader = DataLoader(sampler, dataset, prefetch_batches=2)
        n = 0
        for epoch in range(2):
            sampler.set_epoch(epoch)
            for batch in device_prefetch(loader, size=2):
                assert batch["inputs"].shape[-1] == 80
                n += 1
        state = {"sampler": sampler.state_dict()}
    assert n > 0 and "sampler" in state


def test_migration_guide_import_swap(manifests):
    # The migration guide's claim: change the import root and the reference
    # training-pipeline idioms work unchanged.
    from lhotse_tpu import CutSet, Fbank
    from lhotse_tpu.dataset import DynamicBucketingSampler, K2SpeechRecognitionDataset

    cuts = CutSet.from_manifests(**manifests).trim_to_supervisions()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sampler = DynamicBucketingSampler(cuts, max_duration=4.0, num_buckets=2, seed=0)
        ds = K2SpeechRecognitionDataset(
            input_strategy=__import__("lhotse_tpu.dataset", fromlist=["OnTheFlyFeatures"]).OnTheFlyFeatures(Fbank()))
        batches = [ds[b] for b in sampler]
    assert batches and all("supervisions" in b for b in batches)


def test_augmentation_doc_on_device_augmenter(tmp_path, manifests):
    """Mirrors docs/augmentation.md's OnDeviceAugmenter example."""
    from lhotse_tpu.dataset import OnDeviceAugmenter
    from lhotse_tpu.dataset.input_strategies import AudioSamples
    from lhotse_tpu.dataset.loader import DataLoader
    from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

    rng = np.random.RandomState(0)
    musan_samples = (0.05 * rng.randn(2, SR)).astype(np.float32)
    rir_taps = np.exp(-np.arange(400) / 80.0).astype(np.float32)

    aug = OnDeviceAugmenter(
        buckets=[(2.0, 8)],
        speed_factor=1.1,
        noise_pool=musan_samples,
        rir=rir_taps,
        snr=(10, 20),
        mix_prob=0.5,
    )
    aug.precompile()

    cuts = CutSet.from_manifests(**manifests)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sampler = DynamicCutSampler(cuts, max_cuts=4, world_size=1, rank=0)
    loader = DataLoader(
        sampler,
        K2SpeechRecognitionDataset(input_strategy=AudioSamples()),
        prefetch_batches=0,
    )
    for batch in loader:
        feats, feat_lens = aug(
            batch["inputs"], batch["supervisions"]["num_samples"]
        )
        assert np.asarray(feats).shape[-1] == 80
        assert np.isfinite(np.asarray(feats)).all()
