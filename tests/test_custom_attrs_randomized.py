"""Property-based invariants for custom temporal arrays under padding.

Behavioral envelope mirrored from
`/root/reference/test/cut/test_custom_attrs_randomized.py`: padding a cut
that carries a custom temporal array (``codebook_indices``) in any direction
must produce an array whose frame count matches the padded duration, using
the requested pad value for the padded region.
"""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lhotse_tpu.array import seconds_to_frames
from lhotse_tpu.testing.fixtures import RandomCutTestCase

MAX_EXAMPLES = 60
RATES = [8000, 16000, 22050, 44100, 48000]


class TestCustomAttrPaddingRandomized(RandomCutTestCase):
    @settings(deadline=None, max_examples=MAX_EXAMPLES, print_blob=True)
    @given(
        st.sampled_from(RATES),
        st.sampled_from([160, 200, 256]),
        st.sampled_from(["left", "right", "both"]),
        st.data(),
    )
    def test_pad_preserves_custom_array_frame_count(
        self, sampling_rate, window_hop, pad_direction, data
    ):
        num_samples = data.draw(
            st.integers(round(sampling_rate * 0.46), round(sampling_rate * 1.9)),
            label="Number of audio samples in the cut")
        frame_shift = window_hop / sampling_rate
        cut = self.with_cut(
            sampling_rate=sampling_rate, num_samples=num_samples,
            frame_shift=frame_shift, features=False, custom_field=True)

        duration = data.draw(
            st.floats(min_value=cut.duration * 1.03, max_value=cut.duration * 2),
            label="Padded cut duration")
        padded = cut.pad(
            duration=duration, direction=pad_direction,
            pad_value_dict={"codebook_indices": -1})

        array = padded.load_codebook_indices()
        assert array.ndim == padded.codebook_indices.ndim
        expected_num_frames = seconds_to_frames(
            padded.duration, padded.codebook_indices.frame_shift)
        assert array.shape[0] == expected_num_frames
        # The padded region must be filled with the requested value. The
        # pad/data boundary frame is ambiguous when durations are not
        # frame-aligned, so allow one frame of slack at the seam.
        n_orig = seconds_to_frames(cut.duration, frame_shift)
        pad_frames = expected_num_frames - n_orig
        if pad_frames > 1:
            if pad_direction == "right":
                assert (array[n_orig + 1:] == -1).all()
            elif pad_direction == "left":
                assert (array[: pad_frames - 1] == -1).all()
        self.cleanup()

    @settings(deadline=None, max_examples=MAX_EXAMPLES, print_blob=True)
    @given(st.sampled_from(RATES), st.data())
    def test_truncate_preserves_custom_array_alignment(self, sampling_rate, data):
        """Truncation trims the temporal array consistently with duration."""
        num_samples = data.draw(
            st.integers(round(sampling_rate * 1.0), round(sampling_rate * 1.9)),
            label="Number of audio samples in the cut")
        frame_shift = 0.01
        cut = self.with_cut(
            sampling_rate=sampling_rate, num_samples=num_samples,
            frame_shift=frame_shift, features=False, custom_field=True)
        keep = data.draw(
            st.floats(min_value=0.3, max_value=0.9), label="Kept fraction")
        t = cut.truncate(duration=keep * cut.duration)
        array = t.load_codebook_indices()
        expected = seconds_to_frames(t.duration, frame_shift)
        assert abs(array.shape[0] - expected) <= 1
        self.cleanup()
