"""Regression pins: num_frames/num_samples consistency at frame boundaries.

These pin historical off-by-one failures from the reference's regression
corpus (`/root/reference/test/known_issues/test_cut_consistency.py`): cuts
whose sample counts sit within a few samples of a whole frame must report
the same frame/sample counts from metadata and from actually loaded data,
before and after padding, and through on-the-fly extraction after resampling.
"""
import pytest

from lhotse_tpu import CutSet, Fbank
from lhotse_tpu.dataset import OnTheFlyFeatures
from lhotse_tpu.testing.dummies import dummy_cut, dummy_recording
from lhotse_tpu.testing.fixtures import RandomCutTestCase

BOUNDARY_SAMPLE_COUNTS = [15995 + i for i in range(11)]  # straddles 16000


class TestConsistentNumFramesAndSamples(RandomCutTestCase):
    @pytest.mark.parametrize("num_samples", BOUNDARY_SAMPLE_COUNTS)
    def test_simple_cut_counts_are_consistent(self, num_samples):
        cut = self.with_cut(16000, num_samples)
        feats = cut.load_features()
        samples = cut.load_audio()

        assert cut.has_features
        assert feats.shape == (cut.num_frames, cut.num_features)
        assert feats.shape == (cut.features.num_frames, cut.features.num_features)
        assert cut.has_recording
        assert samples.shape == (1, cut.num_samples)
        assert cut.num_samples == cut.recording.num_samples
        self.cleanup()

    @pytest.mark.parametrize("num_samples", BOUNDARY_SAMPLE_COUNTS)
    def test_padded_cut_counts_are_consistent(self, num_samples):
        cut = self.with_cut(16000, num_samples).pad(1.5)
        feats = cut.load_features()
        samples = cut.load_audio()

        assert feats.shape == (cut.num_frames, cut.num_features)
        assert samples.shape == (1, cut.num_samples)
        self.cleanup()


def test_num_frames_on_the_fly_extractor_after_resample():
    # Reference regression: 48 kHz recording of duration 4.694979166666666 s
    # resampled to 24 kHz must yield exactly 470 frames at 10 ms shift with a
    # 50 ms window (known_issues/test_cut_consistency.py:77-105).
    fbank = Fbank.from_dict(
        {
            "feature_type": "kaldi-fbank",
            "sampling_rate": 24000,
            "frame_shift": 0.01,
            "frame_length": 0.05,
        }
    )
    extractor = OnTheFlyFeatures(fbank)
    cut = dummy_cut(
        0,
        duration=4.694979166666666,
        recording=dummy_recording(
            0, duration=4.694979166666666, sampling_rate=48000, with_data=True
        ),
    ).resample(24000)
    feats, feats_lens = extractor(CutSet.from_cuts([cut]))
    assert int(feats_lens[0]) == 470
    assert feats.shape[1] == 470
