"""Regression pins: SNR-mixing with digital-silence cuts must not crash.

Pins `/root/reference/test/known_issues/test_mixing_zero_energy_cuts.py`:
when the SNR reference track has zero energy, the mix degrades gracefully to
the non-silent signal instead of dividing by zero.
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.dataset.collation import collate_audio
from lhotse_tpu.testing.fixtures import RandomCutTestCase


class TestMixZeroEnergyCuts(RandomCutTestCase):
    @pytest.mark.parametrize("snr", [None, 10])
    def test_mix_zero_energy_cut_degrades_gracefully(self, snr):
        sr = 16000
        zero_cut = self.with_cut(
            sampling_rate=sr, num_samples=sr, features=False, use_zeroes=True)
        rand_cut = self.with_cut(sampling_rate=sr, num_samples=sr, features=False)

        mixed = zero_cut.mix(rand_cut, snr=snr)
        samples = mixed.load_audio()
        np.testing.assert_equal(samples, rand_cut.load_audio())
        self.cleanup()

    @pytest.mark.parametrize("snr", [None, 10])
    def test_collate_audio_with_zero_energy_mixes(self, snr):
        sr = 16000
        zero_cut = self.with_cut(
            sampling_rate=sr, num_samples=sr, features=False, use_zeroes=True)
        rand_cut = self.with_cut(sampling_rate=sr, num_samples=sr, features=False)
        cuts = CutSet.from_cuts([zero_cut.mix(rand_cut, snr=snr)])
        audio, audio_lens = collate_audio(cuts)
        assert audio.shape[0] == 1
        assert int(audio_lens[0]) == sr
        assert np.isfinite(np.asarray(audio)).all()
        self.cleanup()
