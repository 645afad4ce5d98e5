"""Property-based resampling invariants.

Behavioral envelope mirrored from
`/root/reference/test/audio/test_resample_randomized.py`: for any
(source_rate, target_rate) pair and any length around one second, resampling
a Recording preserves its id and duration (to one target-domain sample) and
loads exactly ``(num_channels, num_samples)`` samples.
"""
from math import isclose

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lhotse_tpu.testing.fixtures import RandomCutTestCase

RATES = [8000, 16000, 22050, 44100, 48000]
MAX_EXAMPLES = 40


class TestResampleRandomized(RandomCutTestCase):
    @settings(deadline=None, max_examples=MAX_EXAMPLES, print_blob=True)
    @given(st.sampled_from(RATES), st.sampled_from(RATES), st.data())
    def test_resample_invariants(self, source_rate, target_rate, data):
        num_samples = data.draw(
            st.integers(round(source_rate * 0.9), round(source_rate * 1.1)),
            label="Number of samples in the source recording")
        rec = self.with_recording(sampling_rate=source_rate, num_samples=num_samples)

        resampled = rec.resample(target_rate)
        assert resampled.id == rec.id
        assert resampled.sampling_rate == target_rate
        assert isclose(resampled.duration, rec.duration, abs_tol=1 / target_rate)
        samples = resampled.load_audio()
        assert samples.shape == (resampled.num_channels, resampled.num_samples)
        assert samples.dtype == np.float32
        assert np.isfinite(samples).all()
        self.cleanup()

    @settings(deadline=None, max_examples=MAX_EXAMPLES, print_blob=True)
    @given(st.sampled_from(RATES), st.data())
    def test_resample_identity_is_noop(self, rate, data):
        num_samples = data.draw(
            st.integers(round(rate * 0.5), round(rate * 1.5)),
            label="Number of samples")
        rec = self.with_recording(sampling_rate=rate, num_samples=num_samples)
        same = rec.resample(rate)
        assert same.num_samples == rec.num_samples
        np.testing.assert_allclose(same.load_audio(), rec.load_audio(), atol=1e-6)
        self.cleanup()

    @settings(deadline=None, max_examples=MAX_EXAMPLES, print_blob=True)
    @given(st.sampled_from(RATES), st.sampled_from(RATES), st.data())
    def test_resample_cut_tracks_recording(self, source_rate, target_rate, data):
        """Resampling a cut keeps num_samples == round(duration * rate)."""
        num_samples = data.draw(
            st.integers(round(source_rate * 0.46), round(source_rate * 1.9)),
            label="Number of samples")
        cut = self.with_cut(
            sampling_rate=source_rate, num_samples=num_samples, features=False)
        rs = cut.resample(target_rate)
        assert rs.sampling_rate == target_rate
        audio = rs.load_audio()
        assert audio.shape[1] == rs.num_samples
        assert abs(rs.num_samples - rs.duration * target_rate) <= 1
        self.cleanup()
