"""
Task datasets and samplers without prior direct coverage: StatelessSampler,
AudioTaggingDataset, SourceSeparation datasets, speech translation, the
Lowpass/Reverb cut transforms, and the audio/feature mixers.
"""
import warnings

import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank
from lhotse_tpu.testing.dummies import DummyManifest, dummy_cut, dummy_supervision


def _cuts_with_feats(n, tmp_path, **sup_kwargs):
    from lhotse_tpu.features.io import LilcomChunkyWriter

    cuts = []
    with LilcomChunkyWriter(str(tmp_path / "feats")) as w:
        for i in range(n):
            c = dummy_cut(i, with_data=True,
                          supervisions=[dummy_supervision(i, duration=1.0, **sup_kwargs)])
            feats = Fbank().extract(c.load_audio()[0], 16000)
            from lhotse_tpu.features.base import Features

            key = w.write(c.id, feats)
            c.features = Features(
                type="kaldi-fbank", num_frames=feats.shape[0], num_features=80,
                frame_shift=0.01, sampling_rate=16000, start=0.0, duration=c.duration,
                storage_type=w.name, storage_path=w.storage_path, storage_key=key,
                channels=0)
            c.custom = {}
            cuts.append(c)
        w.flush()
    return CutSet.from_cuts(cuts)


def test_stateless_sampler_infinite_and_seed_dependent(tmp_path):
    from lhotse_tpu.dataset.sampling.stateless import StatelessSampler

    cuts = DummyManifest(CutSet, begin_id=0, end_id=10)
    path = tmp_path / "cuts.jsonl"
    cuts.to_file(path)

    def draw(seed, n):
        sampler = StatelessSampler(
            cuts_paths=[path], index_path=tmp_path / "files.idx",
            base_seed=seed, max_cuts=4)
        it = iter(sampler)
        return [tuple(c.id for c in next(it)) for _ in range(n)]

    a = draw(0, 6)
    assert len(a) == 6  # never exhausts (infinite sampler)
    assert draw(0, 6) == a  # same base_seed -> same stream
    assert draw(1, 6) != a  # different seed -> different stream


def test_stateless_sampler_multiple_manifests_with_scales(tmp_path):
    from lhotse_tpu.dataset.sampling.stateless import StatelessSampler

    a = DummyManifest(CutSet, begin_id=0, end_id=5)
    b = DummyManifest(CutSet, begin_id=100, end_id=105)
    pa, pb = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
    a.to_file(pa)
    b.to_file(pb)
    sampler = StatelessSampler(
        cuts_paths=[(pa, 5.0), (pb, 1.0)], index_path=tmp_path / "files.idx",
        base_seed=3, max_cuts=8)
    it = iter(sampler)
    drawn = [c.id for _ in range(12) for c in next(it)]
    n_a = sum(1 for i in drawn if not i.startswith("dummy-mono-cut-01"))
    assert n_a > len(drawn) * 0.6  # the 5x-scaled manifest dominates


def test_audio_tagging_dataset(tmp_path):
    from lhotse_tpu.dataset.audio_tagging import AudioTaggingDataset

    cuts = _cuts_with_feats(4, tmp_path)
    for c in cuts:
        c.supervisions[0].audio_event = "Speech;Music"
    ds = AudioTaggingDataset()
    batch = ds[cuts]
    assert batch["inputs"].shape[0] == 4 and batch["inputs"].shape[2] == 80
    assert batch["supervisions"]["audio_event"] == ["Speech;Music"] * 4


def test_speech_translation_dataset(tmp_path):
    from lhotse_tpu.dataset.speech_translation import K2Speech2TextTranslationDataset

    cuts = _cuts_with_feats(3, tmp_path)
    for c in cuts:
        c.supervisions[0].custom = {"translated_text": f"übersetzt {c.id}"}
    ds = K2Speech2TextTranslationDataset(return_cuts=True)
    batch = ds[cuts]
    assert len(batch["supervisions"]["text"]) == 3
    assert all(t.startswith("übersetzt") for t in batch["supervisions"]["tgt_text"])
    assert len(batch["supervisions"]["cut"]) == 3


def test_dynamically_mixed_source_separation(tmp_path):
    from lhotse_tpu.dataset.source_separation import (
        DynamicallyMixedSourceSeparationDataset,
    )

    sources = _cuts_with_feats(4, tmp_path)
    ids = list(sources.ids)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mixtures = CutSet.from_cuts([
            sources[ids[0]].mix(sources[ids[1]], snr=5.0),
            sources[ids[2]].mix(sources[ids[3]], snr=0.0),
        ])
        ds = DynamicallyMixedSourceSeparationDataset(
            sources_set=sources, mixtures_set=mixtures)
    assert len(ds) == 2
    ex = ds[0]
    assert ex["sources"].shape[0] == 2
    assert ex["mixture"].shape == ex["sources"].shape[1:]
    np.testing.assert_allclose(ex["real_mask"].sum(0), 1.0, atol=1e-3)
    assert set(np.unique(ex["binary_mask"])) <= {0, 1}


def test_premixed_source_separation(tmp_path):
    from lhotse_tpu.dataset.source_separation import PreMixedSourceSeparationDataset

    sources = _cuts_with_feats(2, tmp_path)
    # Pre-mixed variant matches by recording_id: reuse the same recordings.
    mixtures = CutSet.from_cuts([c.with_id(f"mix-{c.id}") for c in sources])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ds = PreMixedSourceSeparationDataset(sources_set=sources, mixtures_set=mixtures)
    ex = ds[0]
    assert ex["sources"].shape[0] == 1
    assert ex["mixture"].shape == ex["sources"].shape[1:]


def test_lowpass_and_reverb_cut_transforms(tmp_path):
    from lhotse_tpu import Recording
    from lhotse_tpu.audio.wavio import write_wav
    from lhotse_tpu.dataset.cut_transforms.lowpass import LowpassUsingResampling
    from lhotse_tpu.dataset.cut_transforms.reverberate import ReverbWithImpulseResponse

    # Broadband fixture: a pure-tone dummy has no high band to attenuate.
    rng = np.random.default_rng(0)
    write_wav(tmp_path / "noise.wav", (0.2 * rng.normal(size=16000)).astype(np.float32), 16000)
    cuts = CutSet.from_cuts([Recording.from_file(tmp_path / "noise.wav").to_cut()])
    lp = LowpassUsingResampling(p=1.0, frequencies_interval=(2000, 2000), seed=0)
    lp_cuts = lp(cuts)
    orig = next(iter(cuts)).load_audio()[0]
    filtered = next(iter(lp_cuts)).load_audio()[0]
    spec_o = np.abs(np.fft.rfft(orig))
    spec_f = np.abs(np.fft.rfft(filtered))
    hi = slice(int(len(spec_o) * 0.5), None)  # > 4 kHz, well above the 2 kHz cutoff
    assert spec_f[hi].sum() < 0.05 * spec_o[hi].sum()
    lo = slice(0, int(len(spec_o) * 0.2))  # < 1.6 kHz passband preserved
    assert spec_f[lo].sum() > 0.8 * spec_o[lo].sum()

    rvb = ReverbWithImpulseResponse(p=1.0)
    rvb_cuts = rvb(cuts)
    out = next(iter(rvb_cuts)).load_audio()
    assert out.shape == (1, next(iter(cuts)).num_samples)
    assert np.isfinite(out).all()


def test_audio_mixer_snr_semantics():
    from lhotse_tpu.audio.mixer import AudioMixer

    rng = np.random.default_rng(0)
    a = rng.normal(size=(1, 16000)).astype(np.float32) * 0.1
    b = rng.normal(size=(1, 16000)).astype(np.float32) * 0.1
    mixer = AudioMixer(a, sampling_rate=16000)
    mixer.add_to_mix(b, snr=10.0)
    mixed = mixer.mixed_audio
    assert mixed.shape == a.shape
    # With +10 dB SNR the added source contributes ~10x less energy.
    residual = mixed - a
    e_a = float((a**2).sum())
    e_res = float((residual**2).sum())
    assert 5.0 < e_a / e_res < 20.0
    # unmixed tracks are available individually
    assert mixer.unmixed_audio[0].shape == a.shape


def test_feature_mixer_log_domain():
    from lhotse_tpu.features.mixer import FeatureMixer
    from lhotse_tpu.features.kaldi.extractors import Fbank

    rng = np.random.default_rng(1)
    f1 = rng.normal(size=(100, 80)).astype(np.float32)
    f2 = rng.normal(size=(100, 80)).astype(np.float32)
    mixer = FeatureMixer(
        feature_extractor=Fbank(), base_feats=f1, frame_shift=0.01)
    mixer.add_to_mix(f2, sampling_rate=16000, snr=None)
    mixed = mixer.mixed_feats
    assert mixed.shape == f1.shape
    # Log-domain energy sum: exp(mixed) == exp(f1) + exp(f2)
    np.testing.assert_allclose(
        np.exp(mixed), np.exp(f1) + np.exp(f2), rtol=1e-4)
