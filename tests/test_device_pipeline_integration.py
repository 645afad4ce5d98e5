"""
End-to-end TPU-first training input pipeline on the virtual CPU mesh:
synthesized FLAC corpus -> lazy CutSet (+noise mix metadata) ->
DynamicBucketingSampler with explicit bins -> AudioSamples batches ->
OnDeviceAugmenter (speed perturb + gain + SNR mix + RIR + fbank on
"device") — the exact architecture bench.py's e2e section measures.
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Recording, SupervisionSegment
from lhotse_tpu.audio.flacio import write_flac
from lhotse_tpu.dataset.device_augment import OnDeviceAugmenter
from lhotse_tpu.dataset.input_strategies import AudioSamples
from lhotse_tpu.dataset.loader import DataLoader
from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler
from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset

SR = 16000


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.RandomState(7)
    cuts = []
    for i in range(10):
        dur = float(rng.uniform(1.0, 3.5))
        n = int(SR * dur)
        sig = (0.2 * np.sin(2 * np.pi * (100 + 30 * i) * np.arange(n) / SR)
               + 0.01 * rng.randn(n)).astype(np.float32)
        path = tmp_path / f"utt{i}.flac"
        write_flac(str(path), sig, SR)
        cut = Recording.from_file(path).to_cut()
        cut.supervisions.append(
            SupervisionSegment(
                id=f"sup{i}", recording_id=cut.recording_id, start=0.0,
                duration=cut.duration, text="synthetic",
            )
        )
        cuts.append(cut)
    path = tmp_path / "cuts.jsonl"
    CutSet.from_cuts(cuts).to_file(path)
    return path


def test_full_pipeline_through_device_augmenter(corpus):
    rng = np.random.RandomState(1)
    noise = (0.05 * rng.randn(3, 2 * SR)).astype(np.float32)
    rir = (0.1 * np.exp(-np.arange(800) / 100.0)).astype(np.float32)
    rir[3] = 1.0

    buckets = [(2.0, 8), (4.0, 6)]
    aug = OnDeviceAugmenter(
        buckets,
        speed_factor=1.1,
        noise_pool=noise,
        rir=rir,
        snr=(10, 20),
        mix_prob=0.5,
        seed=5,
    )

    cuts = CutSet.from_jsonl_lazy(corpus)
    sampler = DynamicBucketingSampler(
        cuts, max_duration=10.0, duration_bins=[2.0], buffer_size=16,
        shuffle=True, seed=0, world_size=1, rank=0,
    )
    dataset = K2SpeechRecognitionDataset(input_strategy=AudioSamples())
    loader = DataLoader(sampler, dataset, prefetch_batches=0)

    seen_frames = 0
    n_batches = 0
    for batch in loader:
        audio = np.asarray(batch["inputs"])
        lens = np.asarray(batch["supervisions"]["num_samples"])
        feats, feat_lens = aug(audio, lens)
        feats = np.asarray(feats)
        feat_lens = np.asarray(feat_lens)
        assert feats.shape[-1] == 80
        assert np.isfinite(feats).all()
        # Per-item frame counts follow the post-perturb sample counts.
        from lhotse_tpu.ops.resample import resampled_num_samples

        expect = (resampled_num_samples(lens, round(SR * 1.1), SR) + 80) // 160
        np.testing.assert_array_equal(feat_lens[: len(lens)], expect)
        assert (feat_lens[len(lens):] == 0).all()
        seen_frames += int(feat_lens.sum())
        n_batches += 1
    assert n_batches >= 2
    assert seen_frames > 0


def test_oversized_batch_is_rejected_not_truncated():
    """A batch larger than the covering bucket's batch size must raise —
    silent truncation would drop training data."""
    aug = OnDeviceAugmenter([(1.0, 2)], gain_range=None)
    audio = np.zeros((3, SR), np.float32)
    with pytest.raises(ValueError, match="exceeds the covering bucket"):
        aug(audio, [SR, SR, SR])


def test_feature_extractor_accepted_as_fbank():
    """Passing the user-facing ``Fbank()`` extractor (not the raw layer) must
    work — it is the natural drop-in from the rest of the library."""
    from lhotse_tpu.features import Fbank, Mfcc
    from lhotse_tpu.features.kaldi.layers import Wav2LogFilterBank

    audio = (np.random.RandomState(0).randn(2, SR) * 0.1).astype(np.float32)
    lens = np.array([SR, SR])
    aug = OnDeviceAugmenter([(1.0, 2)], gain_range=None, fbank=Fbank())
    feats, feat_lens = aug(audio, lens)
    ref = Wav2LogFilterBank(sampling_rate=SR)(audio)
    # float32 log-domain noise floor between the fused-in-jit and eager
    # kernel paths is ~1e-4 (see docs/performance.md)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref), atol=2e-4)
    # MFCC extractor routes the same way (13-dim output proves dispatch)
    aug2 = OnDeviceAugmenter([(1.0, 2)], gain_range=None, fbank=Mfcc())
    feats2, _ = aug2(audio, lens)
    assert np.asarray(feats2).shape[-1] == 13


def test_adpcm4_staging_uses_native_encoder(monkeypatch):
    """The adpcm4 wire encode runs per batch on the loader's staging hot
    path; the C kernel (host_dsp.adpcm4_encode) must be the path actually
    taken in this environment, not the ~20x slower numpy reference."""
    from lhotse_tpu.ops import host_dsp

    assert host_dsp._get_lib() is not None, "native dsp lib must build here"
    calls = {"n": 0}
    real = host_dsp.adpcm4_encode

    def spy(*args, **kwargs):
        out = real(*args, **kwargs)
        assert out is not None, "native adpcm4 encoder unexpectedly fell back"
        calls["n"] += 1
        return out

    monkeypatch.setattr(host_dsp, "adpcm4_encode", spy)
    aug = OnDeviceAugmenter([(1.0, 2)], gain_range=None, wire_format="adpcm4")
    audio = (np.random.RandomState(0).randn(2, SR) * 0.1).astype(np.float32)
    staged = aug.stage(audio, np.array([SR, SR]))
    feats, feat_lens = aug.compute(staged)
    assert calls["n"] == 1
    assert np.isfinite(np.asarray(feats)).all()


def test_transfer_stream_moves_staged_audio_and_passes_cached_through():
    """transfer_stream: numpy StagedBatch.audio gets device_put ahead of the
    consumer; items without numpy audio (CachedBatch-like) pass through."""
    from lhotse_tpu.dataset.loader import transfer_stream

    aug = OnDeviceAugmenter([(1.0, 2)], gain_range=None, wire_format="int16")
    audio = (np.random.RandomState(0).randn(2, SR) * 0.1).astype(np.float32)

    puts = {"n": 0}

    def fake_put(x):
        puts["n"] += 1
        import jax

        return jax.device_put(x)

    items = []
    for _ in range(3):
        staged = aug.stage(audio, np.array([SR, SR]), transfer=False)
        assert isinstance(staged.audio, np.ndarray)  # still host-side
        items.append((staged, 2.0))

    class NoAudio:  # CachedBatch stand-in
        pass

    items.append((NoAudio(), 1.0))
    out = list(transfer_stream(iter(items), lookahead=2, put=fake_put))
    assert len(out) == 4 and puts["n"] == 3
    for staged, asec in out[:3]:
        assert not isinstance(staged.audio, np.ndarray)
        feats, flens = aug.compute(staged)
        assert np.isfinite(np.asarray(feats)).all()


def test_unpicklable_apply_fn_with_process_workers_raises_clear_error(corpus_6cuts=None):
    """A local-closure apply_fn cannot cross the spawn boundary; the loader
    must fail at construction with guidance, not with pickle's raw
    "Can't get local object" at worker start."""
    from lhotse_tpu.dataset.loader import DataLoader

    aug = OnDeviceAugmenter([(1.0, 2)], gain_range=None)

    def stage_fn(batch):  # local closure: unpicklable
        return aug.stage(batch["inputs"], batch["supervisions"]["num_samples"])

    with pytest.raises(ValueError, match="main_apply_fn"):
        DataLoader(object(), object(), num_workers=2, apply_fn=stage_fn)


def test_main_apply_fn_stages_in_parent_over_process_workers(tmp_path):
    """Full staged pipeline over SPAWNED workers: assembly in workers,
    staging (unpicklable augmenter closure) in the parent via main_apply_fn,
    transfer via transfer_stream — every cut accounted for."""
    from lhotse_tpu import CutSet, Recording, SupervisionSegment
    from lhotse_tpu.audio.wavio import write_wav
    from lhotse_tpu.dataset.loader import DataLoader, transfer_stream
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import (
        DynamicBucketingSampler,
        FixedBucketBatchSizeConstraint,
    )
    from lhotse_tpu.dataset.speech_recognition import K2SpeechRecognitionDataset
    from lhotse_tpu.dataset.input_strategies import AudioSamples

    rng = np.random.RandomState(0)
    cuts = []
    for i in range(6):
        n = int(SR * float(rng.uniform(0.3, 0.9)))
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), (rng.randn(n) * 0.1).astype(np.float32), SR)
        c = Recording.from_file(p).to_cut()
        c.supervisions.append(
            SupervisionSegment(id=f"s{i}", recording_id=c.recording_id,
                               start=0.0, duration=c.duration, text="x")
        )
        cuts.append(c)
    cuts_path = tmp_path / "cuts.jsonl"
    CutSet.from_cuts(cuts).to_file(cuts_path)

    aug = OnDeviceAugmenter([(1.0, 3)], gain_range=(0.9, 1.1), wire_format="int16")

    def stage_fn(batch):
        ns = np.asarray(batch["supervisions"]["num_samples"])
        return aug.stage(np.asarray(batch["inputs"]), ns, transfer=False)

    sampler = DynamicBucketingSampler(
        CutSet.from_jsonl_lazy(cuts_path),
        constraint=FixedBucketBatchSizeConstraint([1.0], [3]),
        num_buckets=None, duration_bins=[], buffer_size=8,
        shuffle=False, seed=0, world_size=1, rank=0,
    )
    loader = DataLoader(
        sampler, K2SpeechRecognitionDataset(input_strategy=AudioSamples()),
        num_workers=1, main_apply_fn=stage_fn, prefetch_batches=2,
    )
    total = 0
    for staged in transfer_stream(loader):
        feats, flens = aug.compute(staged)
        assert np.isfinite(np.asarray(feats)).all()
        total += int((np.asarray(flens) > 0).sum())
    assert total == 6


def test_compute_grouped_matches_per_batch_compute():
    """k same-bucket cache-resident batches through ONE device program must
    produce bit-identical features to k separate compute() calls (all chain
    ops are row-independent; masks fill with per-example means)."""
    from lhotse_tpu.dataset.device_cache import DeviceSampleCache

    rng = np.random.RandomState(0)
    cache = DeviceSampleCache(capacity_seconds=600)
    aug = OnDeviceAugmenter(
        [(1.0, 2)], gain_range=(0.8, 1.2),
        noise_pool=(rng.randn(2, SR) * 0.05).astype(np.float32),
        snr=(10, 20), mix_prob=1.0, wire_format="int16",
        seed=0, sample_cache=cache,
        specaugment=__import__("lhotse_tpu.dataset.signal_transforms",
                               fromlist=["SpecAugment"]).SpecAugment(seed=0),
    )
    # group=3 warms the mega-batch program up front (the production pattern:
    # grouped shapes must compile OUTSIDE the hot loop) and must not disturb
    # the math below.
    aug.precompile(group=3)
    audios = [(rng.randn(2, SR) * 0.1).astype(np.float32) for _ in range(3)]
    ids = [[f"c{g}_{i}" for i in range(2)] for g in range(3)]
    lens = np.array([SR, SR - 160])
    # first pass: transfer + pool insert
    for a, idg in zip(audios, ids):
        aug.compute(aug.stage(a, lens, ids=idg))
    # second pass: all cache-resident -> CachedBatch
    staged = []
    for a, idg in zip(audios, ids):
        s = aug.stage(a, lens, ids=idg)
        from lhotse_tpu.dataset.device_augment import CachedBatch
        assert isinstance(s, CachedBatch), "expected cache hit on second pass"
        staged.append(s)

    grouped = aug.compute_grouped(staged)
    for s, (gf, gl) in zip(staged, grouped):
        # same RNG draws (kwargs captured at stage time) -> identical math
        f, l = aug.compute(s)
        np.testing.assert_array_equal(np.asarray(l), np.asarray(gl))
        np.testing.assert_array_equal(np.asarray(f), np.asarray(gf))


def test_compute_grouped_wire_path_matches_per_batch_compute():
    """k same-bucket TRANSFER-path batches (no sample cache) through one
    grouped device program must produce bit-identical features to k separate
    compute() calls — the fresh-decode e2e loop's dispatch-grouping path."""
    rng = np.random.RandomState(3)
    aug = OnDeviceAugmenter(
        [(1.0, 2)], gain_range=(0.8, 1.2),
        noise_pool=(rng.randn(2, SR) * 0.05).astype(np.float32),
        snr=(10, 20), mix_prob=1.0, wire_format="int16", seed=0,
        specaugment=__import__("lhotse_tpu.dataset.signal_transforms",
                               fromlist=["SpecAugment"]).SpecAugment(seed=0),
    )
    aug.precompile(group=3)
    lens = np.array([SR, SR - 160])
    audios = [(rng.randn(2, SR) * 0.1).astype(np.float32) for _ in range(3)]
    staged = [aug.stage(a, lens) for a in audios]
    grouped = aug.compute_grouped(staged)
    assert len(grouped) == 3
    for s, (gf, gl) in zip(staged, grouped):
        f, l = aug.compute(s)
        np.testing.assert_array_equal(np.asarray(l), np.asarray(gl))
        np.testing.assert_array_equal(np.asarray(f), np.asarray(gf))


def test_compute_grouped_wire_path_adpcm4():
    """Grouping also composes with the sub-byte adpcm4 wire format (wire
    width != sample count — bucket recovered via bucket_t)."""
    rng = np.random.RandomState(4)
    aug = OnDeviceAugmenter(
        [(1.0, 2)], gain_range=None, noise_pool=None,
        wire_format="adpcm4", seed=0,
    )
    lens = np.array([SR, SR - 512])
    audios = [(rng.randn(2, SR) * 0.1).astype(np.float32) for _ in range(2)]
    staged = [aug.stage(a, lens) for a in audios]
    grouped = aug.compute_grouped(staged)
    for s, (gf, gl) in zip(staged, grouped):
        f, l = aug.compute(s)
        np.testing.assert_array_equal(np.asarray(l), np.asarray(gl))
        np.testing.assert_array_equal(np.asarray(f), np.asarray(gf))


def test_compute_grouped_rejects_mixed_and_miss_batches():
    from lhotse_tpu.dataset.device_cache import DeviceSampleCache

    rng = np.random.RandomState(5)
    cache = DeviceSampleCache(capacity_seconds=600)
    aug = OnDeviceAugmenter(
        [(1.0, 2)], gain_range=None, noise_pool=None,
        wire_format="int16", seed=0, sample_cache=cache,
    )
    lens = np.array([SR, SR])
    a = (rng.randn(2, SR) * 0.1).astype(np.float32)
    miss = aug.stage(a, lens, ids=["m0", "m1"])  # carries insert_slots
    with pytest.raises(AssertionError):
        aug.compute_grouped([miss, miss])
