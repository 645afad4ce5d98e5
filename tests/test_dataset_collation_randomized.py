"""Property-based batch-collation invariants for the ASR dataset.

Behavioral envelope mirrored from
`/root/reference/test/dataset/test_speech_recognition_dataset_randomized.py`:
for randomly mixed cuts run through CutConcatenate + K2SpeechRecognitionDataset,
every supervision's ``start_frame + num_frames`` must stay within its cut's
frame count (no off-by-one at batch boundaries).
"""
from hypothesis import given, settings
from hypothesis import strategies as st

from lhotse_tpu import CutSet
from lhotse_tpu.dataset import (
    CutConcatenate,
    K2SpeechRecognitionDataset,
    SimpleCutSampler,
)
from lhotse_tpu.testing.fixtures import RandomCutTestCase

MAX_EXAMPLES = 10  # each example builds real wav files + fbank


class TestCollationRandomized(RandomCutTestCase):
    @settings(deadline=None, max_examples=MAX_EXAMPLES, print_blob=True)
    @given(st.sampled_from([8000, 16000, 44100]), st.data())
    def test_no_off_by_one_in_batch_collation(self, sampling_rate, data):
        nums_samples = data.draw(
            st.lists(
                st.integers(round(sampling_rate * 0.1), round(sampling_rate * 3.0)),
                min_size=6, max_size=10),
            label="Cut lengths in samples")
        cuts = [
            self.with_cut(
                sampling_rate=sampling_rate, num_samples=n, supervision=True)
            for n in nums_samples
        ]
        # Mix consecutive pairs at sample-aligned offsets.
        mixed = CutSet.from_cuts(
            lhs.mix(
                rhs,
                offset_other_by=data.draw(
                    st.integers(
                        min_value=int(0.1 * sampling_rate),
                        max_value=int(lhs.duration * sampling_rate)),
                    label=f"Offset for pair {idx}") / sampling_rate,
            )
            for idx, (lhs, rhs) in enumerate(zip(cuts, cuts[1:]))
        )
        dataset = K2SpeechRecognitionDataset(
            return_cuts=True, cut_transforms=[CutConcatenate(duration_factor=3.0)])
        sampler = SimpleCutSampler(mixed, shuffle=False, max_cuts=10000)
        for batch_cuts in sampler:
            batch = dataset[batch_cuts]
            sups = batch["supervisions"]
            for idx, cut in enumerate(sups["cut"]):
                assert (
                    sups["start_frame"][idx] + sups["num_frames"][idx]
                    <= cut.num_frames
                ), f"Supervision overruns its cut's frames at index {idx}"
        self.cleanup()
