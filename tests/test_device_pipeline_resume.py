"""
Mid-epoch checkpoint/resume across the FULL device input pipeline:
DynamicBucketingSampler -> K2SpeechRecognitionDataset(AudioSamples) ->
DataLoader -> OnDeviceAugmenter (stage + compute, with SpecAugment).

Production contract: save (sampler.state_dict, augmenter.state_dict) between
batches, kill the job, rebuild everything from scratch, restore, and the
remaining batches AND their augmented features must be bit-identical to an
uninterrupted run — otherwise a preemption silently changes the training
data stream. (Reference sampler resume semantics:
/root/reference/lhotse/dataset/sampling/base.py:137-176; the augmentation
RNG state has no reference equivalent — its on-device chain is this
framework's design.)
"""
from pathlib import Path

import numpy as np
import pytest

from lhotse_tpu import CutSet, Recording, SupervisionSegment
from lhotse_tpu.audio.flacio import write_flac
from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter
from lhotse_tpu.dataset.input_strategies import AudioSamples
from lhotse_tpu.dataset.loader import DataLoader
from lhotse_tpu.dataset.sampling.dynamic_bucketing import (
    DynamicBucketingSampler,
    FixedBucketBatchSizeConstraint,
)
from lhotse_tpu.dataset.signal_transforms import SpecAugment
from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

SR = 16000
BUCKETS = [(1.0, 3), (2.0, 2)]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume_corpus")
    rng = np.random.RandomState(7)
    cuts = []
    for i in range(14):
        dur = float(rng.uniform(0.4, 1.9))
        n = int(SR * dur)
        wave = (np.sin(2 * np.pi * rng.uniform(100, 400) * np.arange(n) / SR) * 0.3
                ).astype(np.float32)
        p = root / f"u{i:02d}.flac"
        write_flac(str(p), wave, SR)
        cut = Recording.from_file(p).to_cut()
        cut.supervisions.append(
            SupervisionSegment(
                id=f"s{i}", recording_id=cut.recording_id, start=0.0,
                duration=cut.duration, text="x",
            )
        )
        cuts.append(cut)
    path = root / "cuts.jsonl"
    CutSet.from_cuts(cuts).to_file(path)
    return path


def build(corpus_path, seed=0):
    aug = OnDeviceAugmenter(
        BUCKETS,
        sampling_rate=SR,
        speed_factor=1.1,
        gain_range=(0.8, 1.2),
        noise_pool=(np.random.RandomState(1).randn(2, SR) * 0.05).astype(np.float32),
        snr=(10, 20),
        mix_prob=0.5,
        wire_format="int16",
        seed=seed,
        specaugment=SpecAugment(seed=seed),
    )
    sampler = DynamicBucketingSampler(
        CutSet.from_jsonl_lazy(corpus_path),
        constraint=FixedBucketBatchSizeConstraint(
            max_seq_len_buckets=[ub for ub, _ in BUCKETS],
            batch_sizes=[b for _, b in BUCKETS],
        ),
        num_buckets=None,
        duration_bins=[BUCKETS[0][0]],
        buffer_size=16,
        shuffle=True,
        seed=seed,
        world_size=1,
        rank=0,
    )
    return aug, sampler


def run_batches(aug, sampler, skip=0, take=100):
    """Iterate sampler->dataset->stage->compute, returning per-batch feature
    arrays (fetched to host) for batches [skip, skip+take)."""
    dataset = K2SpeechRecognitionDataset(input_strategy=AudioSamples())

    def stage_fn(batch):
        ns = np.asarray(batch["supervisions"]["num_samples"])
        return aug.stage(np.asarray(batch["inputs"]), ns)

    out = []
    for i, staged in enumerate(DataLoader(sampler, dataset, apply_fn=stage_fn)):
        if i < skip:
            continue
        if i >= skip + take:
            break
        feats, flens = aug.compute(staged)
        out.append((np.asarray(feats), np.asarray(flens)))
    return out


def test_mid_epoch_resume_reproduces_batches_and_features(corpus):
    # Uninterrupted run: consume all batches, remember those after the 2nd.
    aug, sampler = build(corpus)
    full = run_batches(aug, sampler)
    assert len(full) >= 4, "corpus must yield enough batches for the test"

    # Interrupted run: consume 2 batches, checkpoint, rebuild from scratch,
    # restore, consume the rest.
    aug1, sampler1 = build(corpus)
    it = iter(sampler1)
    dataset = K2SpeechRecognitionDataset(input_strategy=AudioSamples())
    for _ in range(2):
        batch_cuts = next(it)
        batch = dataset[batch_cuts]
        ns = np.asarray(batch["supervisions"]["num_samples"])
        aug1.compute(aug1.stage(np.asarray(batch["inputs"]), ns))
    ckpt = {"sampler": sampler1.state_dict(), "augmenter": aug1.state_dict()}

    aug2, sampler2 = build(corpus, seed=0)
    sampler2.load_state_dict(ckpt["sampler"])
    aug2.load_state_dict(ckpt["augmenter"])
    resumed = run_batches(aug2, sampler2)

    tail = full[2:]
    assert len(resumed) == len(tail)
    for (f_a, l_a), (f_b, l_b) in zip(tail, resumed):
        np.testing.assert_array_equal(l_a, l_b)
        np.testing.assert_array_equal(f_a, f_b)


def test_augmenter_state_dict_roundtrip_determinism():
    """Restoring the augmenter state mid-stream reproduces the exact draw
    sequence (gains, SNR, mix mask, SpecAugment warp/masks)."""
    mk = lambda: OnDeviceAugmenter(
        BUCKETS, sampling_rate=SR, speed_factor=1.1, gain_range=(0.5, 2.0),
        noise_pool=(np.random.RandomState(3).randn(2, SR) * 0.05).astype(np.float32),
        snr=(0, 30), mix_prob=0.5, seed=123, specaugment=SpecAugment(seed=5),
    )
    a = mk()
    a._draw_kwargs(3, SR)  # advance
    sd = a.state_dict()
    want = [a._draw_kwargs(3, SR) for _ in range(3)]

    b = mk()
    b._draw_kwargs(2, SR)  # desynchronize deliberately
    b.load_state_dict(sd)
    got = [b._draw_kwargs(3, SR) for _ in range(3)]
    for w, g in zip(want, got):
        assert sorted(w) == sorted(g)
        for k in w:
            np.testing.assert_array_equal(np.asarray(w[k]), np.asarray(g[k]), err_msg=k)


def test_loader_checkpoint_objects_pin_augmenter_under_prefetch(corpus):
    """DataLoader(checkpoint_objects=[augmenter]): loader.state_dict() taken
    between yielded batches must pin the augmenter to the batches actually
    CONSUMED, even though the prefetch thread has staged (and drawn
    randomness for) several batches ahead. Resume must reproduce the
    remaining features bit-exactly."""

    def make_loader(aug, sampler, prefetch):
        dataset = K2SpeechRecognitionDataset(input_strategy=AudioSamples())

        def stage_fn(batch):
            ns = np.asarray(batch["supervisions"]["num_samples"])
            return aug.stage(np.asarray(batch["inputs"]), ns)

        return DataLoader(
            sampler, dataset, apply_fn=stage_fn,
            prefetch_batches=prefetch, checkpoint_objects=[aug],
        )

    # Uninterrupted run.
    aug, sampler = build(corpus)
    full = []
    for staged in make_loader(aug, sampler, prefetch=0):
        feats, flens = aug.compute(staged)
        full.append((np.asarray(feats), np.asarray(flens)))
    assert len(full) >= 4

    # Interrupted: deep prefetch so the augmenter stages well ahead of the
    # 2 consumed batches; checkpoint through the loader, then abandon it.
    aug1, sampler1 = build(corpus)
    loader1 = make_loader(aug1, sampler1, prefetch=4)
    it = iter(loader1)
    import time
    for _ in range(2):
        aug1.compute(next(it))
    time.sleep(0.3)  # let the prefetch thread stage ahead before snapshotting
    ckpt = loader1.state_dict()
    it.close()
    # The prefetch thread really did run ahead of consumption.
    assert aug1._stage_counter > ckpt["objects"][0]["next_counter"]

    # Rebuild from scratch, restore THROUGH the loader, drain the rest.
    aug2, sampler2 = build(corpus)
    loader2 = make_loader(aug2, sampler2, prefetch=4)
    loader2.load_state_dict(ckpt)
    resumed = []
    for staged in loader2:
        feats, flens = aug2.compute(staged)
        resumed.append((np.asarray(feats), np.asarray(flens)))

    tail = full[2:]
    assert len(resumed) == len(tail)
    for (f_a, l_a), (f_b, l_b) in zip(tail, resumed):
        np.testing.assert_array_equal(l_a, l_b)
        np.testing.assert_array_equal(f_a, f_b)
