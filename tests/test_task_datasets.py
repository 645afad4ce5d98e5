"""Task dataset tests: the full sampler → dataset pipeline for ASR, VAD,
TTS, diarization, SURT; iterable wrapper with checkpointing."""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank, LilcomChunkyWriter, Recording
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.dataset import (
    AudioSamples, DiarizationDataset, DynamicCutSampler, IdentityDataset, IterableDatasetWrapper,
    K2SpeechRecognitionDataset, K2SurtDataset, SimpleCutSampler, SpecAugment,
    SpeechSynthesisDataset, UnsupervisedDataset, VadDataset)
from lhotse_tpu.supervision import SupervisionSegment

SR = 16000


@pytest.fixture(scope="module")
def cuts(tmp_path_factory):
    d = tmp_path_factory.mktemp("task_ds")
    rng = np.random.RandomState(7)
    cut_list = []
    for i in range(6):
        n = SR + i * 4000
        p = d / f"r{i}.wav"
        write_wav(str(p), (rng.randn(n) * 0.1).astype(np.float32), SR)
        cut = Recording.from_file(p).to_cut()
        cut.supervisions = [
            SupervisionSegment(
                id=f"s{i}", recording_id=cut.recording_id, start=0.05,
                duration=round(cut.duration - 0.1, 2), text=f"utt {i}",
                speaker=f"spk{i % 2}",
            )
        ]
        cut_list.append(cut)
    return CutSet.from_cuts(cut_list)


@pytest.fixture(scope="module")
def cuts_feats(cuts, tmp_path_factory):
    d = tmp_path_factory.mktemp("task_feats")
    with LilcomChunkyWriter(d) as storage:
        return CutSet.from_cuts(c.compute_and_store_features(Fbank(), storage) for c in cuts)


class TestASRPipeline:
    def test_precomputed_pipeline(self, cuts_feats):
        dataset = K2SpeechRecognitionDataset(return_cuts=True)
        sampler = SimpleCutSampler(cuts_feats, max_cuts=3, world_size=1, rank=0)
        n_sups = 0
        for batch_cuts in sampler:
            batch = dataset[batch_cuts]
            B, T, F = batch["inputs"].shape
            assert F == 80
            assert len(batch["supervisions"]["text"]) >= B
            assert len(batch["supervisions"]["cut"]) == len(batch["supervisions"]["text"])
            n_sups += len(batch["supervisions"]["text"])
        assert n_sups == 6

    def test_audio_pipeline_with_specaugment_on_features(self, cuts):
        from lhotse_tpu.dataset import OnTheFlyFeatures

        dataset = K2SpeechRecognitionDataset(
            input_strategy=OnTheFlyFeatures(Fbank()), input_transforms=[SpecAugment(p=1.0, seed=0)])
        sampler = SimpleCutSampler(cuts, max_cuts=6, world_size=1, rank=0)
        batch = dataset[next(iter(sampler))]
        assert batch["inputs"].ndim == 3
        assert batch["inputs"].shape[2] == 80

    def test_audio_samples_strategy(self, cuts):
        dataset = K2SpeechRecognitionDataset(input_strategy=AudioSamples())
        sampler = SimpleCutSampler(cuts, max_cuts=2, world_size=1, rank=0)
        batch = dataset[next(iter(sampler))]
        assert batch["inputs"].ndim == 2
        assert "start_sample" in batch["supervisions"]


class TestOtherTasks:
    def test_vad(self, cuts_feats):
        dataset = VadDataset()
        sampler = SimpleCutSampler(cuts_feats, max_cuts=3, world_size=1, rank=0)
        batch = dataset[next(iter(sampler))]
        assert batch["inputs"].shape[0] == 3
        assert batch["is_voice"].shape[:2] == batch["inputs"].shape[:2]
        # Voice mask covers most frames (supervisions span nearly all audio).
        assert batch["is_voice"].mean() > 0.5

    def test_tts(self, cuts_feats):
        dataset = SpeechSynthesisDataset(return_spk_ids=True)
        sampler = SimpleCutSampler(cuts_feats, max_cuts=2, world_size=1, rank=0)
        batch = dataset[next(iter(sampler))]
        assert batch["audio"].ndim == 2
        assert batch["features"].ndim == 3
        assert len(batch["text"]) == 2
        assert len(batch["speakers"]) == 2

    def test_unsupervised(self, cuts_feats):
        dataset = UnsupervisedDataset()
        sampler = SimpleCutSampler(cuts_feats, max_cuts=4, world_size=1, rank=0)
        batch = dataset[next(iter(sampler))]
        assert batch["features"].shape[0] == 4

    def test_diarization(self, cuts_feats):
        dataset = DiarizationDataset(cuts_feats, global_speaker_ids=True)
        # Same-duration batches (diarization needs equal T).
        one = cuts_feats.subset(first=1)
        batch = dataset[one]
        assert batch["speaker_activity"].ndim == 3
        assert batch["features"].shape[1] == batch["speaker_activity"].shape[2]

    def test_surt(self, cuts_feats):
        dataset = K2SurtDataset(num_channels=2, return_cuts=True)
        sampler = SimpleCutSampler(cuts_feats, max_cuts=3, world_size=1, rank=0)
        batch = dataset[next(iter(sampler))]
        assert len(batch["text"]) == 3
        assert all(len(t) == 2 for t in batch["text"])
        # Single supervision per cut: channel 0 holds it, channel 1 empty.
        assert all(t[1] == "" for t in batch["text"])


class TestIterableWrapper:
    def test_identity_loop(self, cuts_feats, tmp_path):
        p = tmp_path / "cuts.jsonl"
        cuts_feats.to_file(p)
        sampler = DynamicCutSampler(CutSet.from_jsonl_lazy(p), max_cuts=2, world_size=1, rank=0)
        wrapper = IterableDatasetWrapper(IdentityDataset(), sampler)
        wrapper.set_epoch(0)
        batches = list(wrapper)
        assert sum(len(b) for b in batches) == 6

    def test_wrapper_state_roundtrip(self, cuts_feats, tmp_path):
        p = tmp_path / "cuts.jsonl"
        cuts_feats.to_file(p)

        def make():
            sampler = DynamicCutSampler(
                CutSet.from_jsonl_lazy(p), max_cuts=2, shuffle=True, seed=0, world_size=1, rank=0)
            w = IterableDatasetWrapper(IdentityDataset(), sampler)
            w.set_epoch(1)
            return w

        all_ids = [[c.id for c in b] for b in make()]

        w = make()
        it = iter(w)
        first = [[c.id for c in next(it)]]
        sd = w.state_dict()
        w2 = make()
        w2.load_state_dict(sd)
        rest = [[c.id for c in b] for b in w2]
        assert first + rest == all_ids
