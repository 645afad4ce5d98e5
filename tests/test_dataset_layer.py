"""Dataset-layer tests: collation, input strategies, signal transforms,
cut transforms."""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank, LilcomChunkyWriter, Recording
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.dataset import (
    AudioSamples, CutConcatenate, CutMix, ExtraPadding, GlobalMVN, OnTheFlyFeatures, PerturbSpeed,
    PerturbVolume, PrecomputedFeatures, RandomizedSmoothing, SpecAugment, TokenCollater,
    collate_audio, collate_custom_field, collate_features, collate_matrices, collate_vectors)
from lhotse_tpu.supervision import SupervisionSegment
from lhotse_tpu.utils import LOG_EPSILON

SR = 16000


@pytest.fixture(scope="module")
def cuts(tmp_path_factory):
    d = tmp_path_factory.mktemp("collation")
    rng = np.random.RandomState(0)
    cut_list = []
    for i, n in enumerate([SR, SR * 3 // 2, SR * 2]):
        p = d / f"r{i}.wav"
        write_wav(str(p), (rng.randn(n) * 0.1).astype(np.float32), SR)
        cut = Recording.from_file(p).to_cut()
        cut.supervisions = [
            SupervisionSegment(
                id=f"s{i}", recording_id=cut.recording_id, start=0.1,
                duration=cut.duration - 0.2, text=f"hello world {i}",
            )
        ]
        cut_list.append(cut)
    return CutSet.from_cuts(cut_list)


@pytest.fixture(scope="module")
def cuts_with_feats(cuts, tmp_path_factory):
    d = tmp_path_factory.mktemp("feats")
    with LilcomChunkyWriter(d) as storage:
        return CutSet.from_cuts(c.compute_and_store_features(Fbank(), storage) for c in cuts)


class TestCollation:
    def test_collate_audio(self, cuts):
        audio, lens = collate_audio(cuts)
        assert audio.shape == (3, SR * 2)
        assert list(lens) == [SR, SR * 3 // 2, SR * 2]
        assert audio.dtype == np.float32
        # Padding region is zeros.
        np.testing.assert_allclose(audio[0, SR:], 0.0)

    def test_collate_audio_pad_to_multiple(self, cuts):
        audio, lens = collate_audio(cuts, pad_to_multiple=SR)
        assert audio.shape[1] % SR == 0

    def test_collate_features(self, cuts_with_feats):
        feats, lens = collate_features(cuts_with_feats)
        assert feats.shape == (3, 200, 80)
        assert list(lens) == [100, 150, 200]
        # Padding frames are feature-domain silence.
        np.testing.assert_allclose(feats[0, 150:], LOG_EPSILON, atol=1e-3)

    def test_collate_vectors_matrices(self):
        v = collate_vectors([np.arange(3), np.arange(5)], padding_value=-1)
        assert v.shape == (2, 5)
        assert v[0, 3] == -1
        m = collate_matrices([np.ones((2, 4)), np.zeros((5, 4))])
        assert m.shape == (2, 5, 4)

    def test_collate_custom_field_scalar(self, cuts):
        for i, c in enumerate(cuts):
            c.my_score = float(i) * 0.5
        out = collate_custom_field(cuts, "my_score")
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0])

    def test_token_collater_roundtrip(self, cuts):
        tc = TokenCollater(cuts)
        tokens, lens = tc(cuts)
        assert tokens.shape[0] == 3
        texts = tc.inverse(tokens, lens)
        assert texts == ["hello world 0", "hello world 1", "hello world 2"]


class TestInputStrategies:
    def test_precomputed(self, cuts_with_feats):
        strategy = PrecomputedFeatures()
        feats, lens = strategy(cuts_with_feats)
        assert feats.shape == (3, 200, 80)
        sup = strategy.supervision_intervals(cuts_with_feats)
        assert len(sup["sequence_idx"]) == 3
        masks = strategy.supervision_masks(cuts_with_feats)
        assert masks.shape == (3, 200)

    def test_audio_samples(self, cuts):
        strategy = AudioSamples()
        audio, lens = strategy(cuts)
        assert audio.shape == (3, SR * 2)
        sup = strategy.supervision_intervals(cuts)
        assert sup["start_sample"][0] == int(0.1 * SR)
        masks = strategy.supervision_masks(cuts)
        assert masks.shape == (3, SR * 2)

    def test_on_the_fly(self, cuts, cuts_with_feats):
        strategy = OnTheFlyFeatures(Fbank())
        feats, lens = strategy(cuts)
        assert feats.shape == (3, 200, 80)
        # On-the-fly matches precomputed within codec tolerance.
        stored, _ = PrecomputedFeatures()(cuts_with_feats)
        assert np.abs(feats[0, :100] - stored[0, :100]).max() < 2**-6 + 1e-4

    def test_on_the_fly_sequential(self, cuts):
        strategy = OnTheFlyFeatures(Fbank(), use_batch_extract=False)
        feats, lens = strategy(cuts)
        assert feats.shape == (3, 200, 80)


class TestSignalTransforms:
    def test_specaugment_masks_present(self):
        x = np.random.RandomState(0).randn(4, 300, 80).astype(np.float32) + 5.0
        sa = SpecAugment(p=1.0, time_warp_factor=None, seed=0)
        y = sa(x)
        # Some cells equal per-example mean (masked), most unchanged.
        changed = (y != x).mean()
        assert 0.0 < changed < 0.9

    def test_specaugment_warp_preserves_mean(self):
        x = np.random.RandomState(0).randn(2, 300, 80).astype(np.float32)
        sa = SpecAugment(p=1.0, num_feature_masks=0, num_frame_masks=0, time_warp_factor=80, seed=2)
        y = sa(x)
        assert y.shape == x.shape
        # Warp is a resample: global stats nearly unchanged.
        assert abs(y.mean() - x.mean()) < 0.05

    def test_specaugment_rng_checkpoint(self):
        x = np.random.RandomState(1).randn(2, 100, 80).astype(np.float32)
        sa = SpecAugment(seed=3)
        sd = sa.state_dict()
        y1 = sa(x)
        sa2 = SpecAugment(seed=99)
        sa2.load_state_dict(sd)
        y2 = sa2(x)
        np.testing.assert_allclose(y1, y2)

    def test_global_mvn(self, cuts_with_feats):
        mvn = GlobalMVN.from_cuts(cuts_with_feats)
        feats, _ = collate_features(cuts_with_feats)
        normed = mvn(feats)
        # Normalized features of the training cuts: ~zero mean, ~unit var.
        assert abs(np.mean(normed[0][:100])) < 0.7
        restored = mvn.inverse(normed)
        np.testing.assert_allclose(restored, feats, rtol=1e-4, atol=1e-4)

    def test_global_mvn_file_roundtrip(self, cuts_with_feats, tmp_path):
        mvn = GlobalMVN.from_cuts(cuts_with_feats)
        mvn.to_file(tmp_path / "mvn.npz")
        mvn2 = GlobalMVN.from_file(tmp_path / "mvn.npz")
        np.testing.assert_allclose(mvn.norm_means, mvn2.norm_means)

    def test_randomized_smoothing(self):
        x = np.zeros((4, 1600), dtype=np.float32)
        rs = RandomizedSmoothing(sigma=0.1, p=1.0, seed=0)
        y = rs(x)
        assert y.shape == x.shape
        assert np.abs(y).max() <= 1.0
        assert np.abs(y).max() > 0  # noise was added


class TestCutTransforms:
    def test_cut_concatenate(self, cuts):
        cat = CutConcatenate(gap=0.5)
        out = cat(cuts)
        # 2.0s + 0.5 gap + 1.0s does not fit into 2.0s cap -> unchanged count;
        # with a larger factor they merge.
        cat2 = CutConcatenate(gap=0.1, duration_factor=2.0)
        out2 = cat2(cuts)
        assert len(out2) < len(cuts)
        total_before = sum(c.duration for c in cuts)
        total_after = sum(c.duration for c in out2)
        assert total_after >= total_before  # gaps add duration

    def test_extra_padding(self, cuts):
        out = ExtraPadding(extra_seconds=0.4)(cuts)
        for before, after in zip(cuts, out):
            assert after.duration == pytest.approx(before.duration + 0.4, abs=1e-6)

    def test_cut_mix(self, cuts):
        noise = CutSet.from_cuts([cuts[0].with_id("noise")])
        cm = CutMix(noise, snr=10, p=1.0, seed=0)
        out = cm(cuts)
        assert len(out) == len(cuts)
        # Mixing at finite SNR increases energy.
        a_before = cuts[1].load_audio()
        a_after = out[1].load_audio()
        assert a_after.shape[1] >= a_before.shape[1]

    def test_perturb_speed_deterministic(self, cuts):
        import random as _random

        t1 = PerturbSpeed(factors=[0.9, 1.1], p=1.0, randgen=_random.Random(0))
        t2 = PerturbSpeed(factors=[0.9, 1.1], p=1.0, randgen=_random.Random(0))
        out1 = t1(cuts)
        out2 = t2(cuts)
        assert [c.id for c in out1] == [c.id for c in out2]
        assert all("_sp" in c.id for c in out1)

    def test_perturb_volume_rng_checkpoint(self, cuts):
        import random as _random

        t = PerturbVolume(p=1.0, randgen=_random.Random(5))
        sd = t.state_dict()
        out1 = [c.id for c in t(cuts)]
        t2 = PerturbVolume(p=1.0, randgen=_random.Random(99))
        t2.load_state_dict(sd)
        out2 = [c.id for c in t2(cuts)]
        assert out1 == out2
