"""Regression pins: frame counts of long concatenated+padded MixedCuts.

Pins the exact cases from
`/root/reference/test/known_issues/test_mixed_cut_num_frames.py`: appended
cuts with silence gaps, padded to a duration ending in .445/.145, must round
the final half-frame up consistently between metadata and loaded features.
"""
from lhotse_tpu.cut import MixedCut
from lhotse_tpu.testing.fixtures import RandomCutTestCase


class TestKnownProblematicCuts(RandomCutTestCase):
    def test_two_track_pad_rounds_last_half_frame_up(self):
        cut1 = self.with_cut(sampling_rate=16000, num_samples=237920)
        cut2 = self.with_cut(sampling_rate=16000, num_samples=219600)
        mixed: MixedCut = (
            cut1.pad(duration=cut1.duration + 1.0).append(cut2).pad(duration=31.445)
        )
        assert mixed.duration == 31.445
        assert mixed.num_frames == 3145
        # Non-overlapping tracks: per-track frame counts tile the total.
        assert sum(t.cut.num_frames for t in mixed.tracks) == 3145
        feats = mixed.load_features()
        assert feats.shape[0] == 3145
        self.cleanup()

    def test_three_track_pad_rounds_last_half_frame_up(self):
        cut1 = self.with_cut(sampling_rate=16000, num_samples=252879)
        cut2 = self.with_cut(sampling_rate=16000, num_samples=185280)
        cut3 = self.with_cut(sampling_rate=16000, num_samples=204161)
        mixed = cut1.pad(duration=cut1.duration + 1.0).append(cut2)
        mixed = mixed.pad(duration=mixed.duration + 1.0).append(cut3)
        assert mixed.duration == 42.145
        assert mixed.num_frames == 4215
        feats = mixed.load_features()
        assert feats.shape[0] == 4215
        self.cleanup()
