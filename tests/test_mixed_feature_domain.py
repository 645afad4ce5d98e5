"""
Feature-domain mixing edge matrix: MixedCut x PaddingCut x (Mono/Multi)
loading FEATURES (not audio) — the thinnest zone of the reference's
test/cut surface (reference math: lhotse/cut/mixed.py:1199 feature-domain
mix via extractor-defined mix/compute_energy; Fbank log-add at
features/kaldi/extractors.py:130-147).

Uses real stored fbank features (RandomCutTestCase).
"""
import numpy as np
import pytest

from lhotse_tpu.testing.fixtures import RandomCutTestCase
from lhotse_tpu.utils import LOG_EPSILON

SR = 16000


class TestFeaturePaddingMatrix(RandomCutTestCase):
    def test_pad_right_fills_log_epsilon_rows(self):
        cut = self.with_cut(sampling_rate=SR, num_samples=SR)
        padded = cut.pad(duration=2.0)
        feats = padded.load_features()
        t_orig = cut.num_frames
        assert feats.shape == (padded.num_frames, cut.num_features)
        np.testing.assert_allclose(
            feats[:t_orig], cut.load_features(), atol=2e-2
        )  # lilcom-quantized storage
        # The padding region is the feature-domain silence floor.
        assert np.allclose(feats[t_orig + 1 :], LOG_EPSILON, atol=1e-4)

    def test_pad_left_shifts_content(self):
        cut = self.with_cut(sampling_rate=SR, num_samples=SR)
        padded = cut.pad(duration=2.0, direction="left")
        feats = padded.load_features()
        t_pad = padded.num_frames - cut.num_frames
        assert np.allclose(feats[: t_pad - 1], LOG_EPSILON, atol=1e-4)
        np.testing.assert_allclose(feats[t_pad:], cut.load_features(), atol=2e-2)

    def test_pad_both_directions(self):
        cut = self.with_cut(sampling_rate=SR, num_samples=SR)
        padded = cut.pad(duration=2.0, direction="both")
        feats = padded.load_features()
        assert feats.shape[0] == padded.num_frames
        assert np.isfinite(feats).all()

    def test_pad_custom_feat_value(self):
        cut = self.with_cut(sampling_rate=SR, num_samples=SR)
        padded = cut.pad(duration=2.0, pad_feat_value=-42.0)
        feats = padded.load_features()
        assert np.allclose(feats[cut.num_frames + 1 :], -42.0, atol=1e-4)

    def test_unmixed_feature_stack(self):
        cut = self.with_cut(sampling_rate=SR, num_samples=SR)
        padded = cut.pad(duration=2.0)
        stack = padded.load_features(mixed=False)
        assert stack.shape == (2, padded.num_frames, cut.num_features)


class TestFeatureDomainMixing(RandomCutTestCase):
    def _two_cuts(self):
        a = self.with_cut(sampling_rate=SR, num_samples=2 * SR)
        b = self.with_cut(sampling_rate=SR, num_samples=SR)
        return a, b

    def test_mix_shape_and_finiteness(self):
        a, b = self._two_cuts()
        mixed = a.mix(b, offset_other_by=0.5, snr=10)
        feats = mixed.load_features()
        assert feats.shape == (mixed.num_frames, a.num_features)
        assert np.isfinite(feats).all()

    def test_region_before_offset_is_first_track(self):
        a, b = self._two_cuts()
        mixed = a.mix(b, offset_other_by=1.0, snr=10)
        feats = mixed.load_features()
        a_feats = a.load_features()
        # First ~1 s of frames come from track a alone.
        n = int(0.9 * 100)
        np.testing.assert_allclose(feats[:n], a_feats[:n], atol=1e-4)

    def test_log_add_increases_energy(self):
        a, b = self._two_cuts()
        mixed = a.mix(b, snr=0)
        feats = mixed.load_features()
        a_feats = a.load_features()
        b_feats = b.load_features()
        t = min(b.num_frames, a.num_frames) - 1
        # Fbank mix is log(e^a + k e^b) with k > 0: strictly above each part.
        assert (feats[:t] >= a_feats[:t] - 1e-4).all()
        assert (feats[:t] >= np.minimum(a_feats[:t], b_feats[:t])).all()

    def test_mix_matches_manual_log_add(self):
        a, b = self._two_cuts()
        snr = 10.0
        mixed = a.mix(b, snr=snr)
        feats = mixed.load_features()
        a_feats = a.load_features().astype(np.float64)
        b_feats = b.load_features().astype(np.float64)
        from lhotse_tpu.features import Fbank

        gain = Fbank.compute_energy(a_feats) / Fbank.compute_energy(b_feats)
        k = gain * 10.0 ** (-snr / 10.0)
        t = b.num_frames - 1
        manual = np.log(np.maximum(1e-10, np.exp(a_feats[:t]) + k * np.exp(b_feats[:t])))
        np.testing.assert_allclose(feats[:t], manual, atol=2e-2)

    def test_mix_unmixed_stack_has_gain_applied(self):
        a, b = self._two_cuts()
        mixed = a.mix(b, snr=None)
        stack = mixed.load_features(mixed=False)
        assert stack.shape[0] == 2
        assert stack.shape[1] == mixed.num_frames

    def test_mix_then_pad_then_load(self):
        a, b = self._two_cuts()
        mixed = a.mix(b, snr=5).pad(duration=3.0)
        feats = mixed.load_features()
        assert feats.shape[0] == mixed.num_frames
        # In the all-padding region each track contributes a LOG_EPSILON row
        # and the log-add accumulates them: floor + log(k) for k tracks
        # (reference FeatureMixer semantics) — still "silence floor" class.
        tail = feats[int(2.1 * 100) :]
        assert (tail >= LOG_EPSILON - 1e-4).all()
        assert (tail <= LOG_EPSILON + np.log(3) + 1e-4).all()

    def test_pad_then_mix_preserves_frame_count(self):
        a, b = self._two_cuts()
        padded = a.pad(duration=3.0)
        mixed = padded.mix(b, snr=5)
        assert mixed.num_frames == padded.num_frames
        feats = mixed.load_features()
        assert feats.shape[0] == padded.num_frames

    def test_append_concatenates_features(self):
        a, b = self._two_cuts()
        appended = a.append(b)
        feats = appended.load_features()
        assert feats.shape[0] == appended.num_frames
        np.testing.assert_allclose(
            feats[: a.num_frames - 1], a.load_features()[:-1], atol=1e-4
        )

    def test_mix_frame_shift_follows_first_nonpadding_track(self):
        """Mixing cuts with different frame_shifts is geometrically governed
        by the first non-padding track (reference: mixed.py:210-211) — the
        load succeeds and emits that track's frame grid."""
        a = self.with_cut(sampling_rate=SR, num_samples=SR)
        b = self.with_cut(sampling_rate=SR, num_samples=SR, frame_shift=0.02)
        mixed = a.mix(b, snr=5)
        assert mixed.frame_shift == a.frame_shift
        feats = mixed.load_features()
        assert feats.shape[0] == mixed.num_frames

    def test_audio_and_feature_mix_consistent_frames(self):
        """Feature-domain and audio-domain loads of one MixedCut agree on
        geometry: num_frames x frame_shift covers num_samples."""
        a, b = self._two_cuts()
        mixed = a.mix(b, offset_other_by=0.25, snr=10)
        feats = mixed.load_features()
        audio = mixed.load_audio()
        assert feats.shape[0] == mixed.num_frames
        assert audio.shape[1] == mixed.num_samples
        assert abs(feats.shape[0] - audio.shape[1] / 160) <= 1
