"""Edge cases of cut mixing: SNR scaling, offsets, id preservation, unmix,
padding interaction, and transform propagation through MixedCut.

Behavioral envelope mirrored from `/root/reference/test/cut/test_cut_mixing.py`
and `test_cut_ops_preserve_id.py`, written against this framework's fixtures.
"""
import numpy as np
import pytest

from lhotse_tpu import MonoCut, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut, PaddingCut, mix

SR = 16000


def _make_cut(tmp_path, name: str, seconds: float, amplitude: float, freq: float) -> MonoCut:
    t = np.arange(int(seconds * SR)) / SR
    x = (amplitude * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    p = tmp_path / f"{name}.wav"
    write_wav(str(p), x, SR)
    rec = Recording.from_file(p)
    return MonoCut(
        id=name, start=0.0, duration=seconds, channel=0, recording=rec,
        supervisions=[
            SupervisionSegment(
                id=f"{name}-sup", recording_id=rec.id, start=0.0, duration=seconds,
                text=name)])


@pytest.fixture
def speech(tmp_path):
    return _make_cut(tmp_path, "speech", 4.0, 0.3, 220.0)


@pytest.fixture
def noise(tmp_path):
    return _make_cut(tmp_path, "noise", 2.0, 0.1, 3000.0)


class TestMixDurations:
    def test_mix_duration_is_max_of_spans(self, speech, noise):
        m = mix(speech, noise, offset=3.0)
        assert m.duration == pytest.approx(5.0)  # 3.0 + 2.0 > 4.0

    def test_mix_within_duration(self, speech, noise):
        m = mix(speech, noise, offset=1.0)
        assert m.duration == pytest.approx(4.0)

    def test_mix_audio_shape(self, speech, noise):
        m = mix(speech, noise, offset=1.0)
        assert m.load_audio().shape == (1, 4 * SR)

    def test_zero_offset_sums_signals(self, speech, noise):
        m = mix(speech, noise)
        expected = speech.load_audio().copy()
        expected[:, : 2 * SR] += noise.load_audio()
        np.testing.assert_allclose(m.load_audio(), expected, atol=1e-6)

    def test_offset_region_is_pure_speech(self, speech, noise):
        m = mix(speech, noise, offset=3.0)
        audio = m.load_audio()
        np.testing.assert_allclose(
            audio[:, : 3 * SR], speech.load_audio()[:, : 3 * SR], atol=1e-6)


class TestSnr:
    def test_snr_scales_second_track(self, speech, noise):
        loud = mix(speech, noise, snr=0).load_audio()
        quiet = mix(speech, noise, snr=20).load_audio()
        # the noise region [0, 2) differs; the speech-only tail is identical
        residual_loud = loud[:, :SR] - speech.load_audio()[:, :SR]
        residual_quiet = quiet[:, :SR] - speech.load_audio()[:, :SR]
        assert np.abs(residual_loud).mean() > np.abs(residual_quiet).mean() * 5
        np.testing.assert_allclose(loud[:, 3 * SR:], quiet[:, 3 * SR:], atol=1e-6)

    def test_snr_is_relative_to_reference_energy(self, speech, noise):
        m = mix(speech, noise, snr=10)
        (ref_audio,) = speech.load_audio()
        mixed = m.load_audio()[0]
        noise_in_mix = mixed[: 2 * SR] - ref_audio[: 2 * SR]
        snr_measured = 10 * np.log10(
            (ref_audio**2).mean() / (noise_in_mix**2).mean())
        assert snr_measured == pytest.approx(10, abs=1.0)

    def test_none_snr_no_scaling(self, speech, noise):
        m = mix(speech, noise, snr=None)
        mixed = m.load_audio()[0]
        raw_noise = noise.load_audio()[0]
        np.testing.assert_allclose(
            mixed[: 2 * SR] - speech.load_audio()[0][: 2 * SR], raw_noise, atol=1e-6)


class TestPreserveId:
    def test_preserve_left(self, speech, noise):
        assert mix(speech, noise, preserve_id="left").id == speech.id

    def test_preserve_right(self, speech, noise):
        assert mix(speech, noise, preserve_id="right").id == noise.id

    def test_default_generates_new_id(self, speech, noise):
        m = mix(speech, noise)
        assert m.id not in (speech.id, noise.id)


class TestUnmix:
    def test_unmix_parts_sum_back_to_the_mix(self, speech, noise):
        m = mix(speech, noise, offset=1.0)
        parts = m.unmix()
        assert len(parts) == 2
        # each part is time-aligned to the full mix span
        assert all(p.duration == pytest.approx(m.duration) for p in parts)
        total = sum(p.load_audio() for p in parts)
        np.testing.assert_allclose(total, m.load_audio(), atol=1e-6)

    def test_mix_of_mix_flattens_supervisions(self, speech, noise, tmp_path):
        third = _make_cut(tmp_path, "third", 1.0, 0.2, 500.0)
        m = mix(mix(speech, noise), third, offset=2.0)
        assert len(m.supervisions) == 3
        assert m.load_audio().shape == (1, 4 * SR)


class TestMixWithPadding:
    def test_mix_with_padding_cut(self, speech):
        pad_cut = PaddingCut(
            id="pad", duration=4.0, sampling_rate=SR, feat_value=-23.0,
            num_samples=4 * SR)
        m = mix(speech, pad_cut)
        np.testing.assert_allclose(m.load_audio(), speech.load_audio(), atol=1e-6)

    def test_padded_then_mixed_keeps_duration(self, speech, noise):
        padded = speech.pad(duration=6.0)
        m = mix(padded, noise, offset=4.5)
        assert m.duration == pytest.approx(6.5)
        audio = m.load_audio()
        assert audio.shape == (1, int(6.5 * SR))

    def test_mix_snr_ignores_padding_reference(self, speech):
        # mixing noise into a padded cut must use speech energy, not padding
        padded = speech.pad(duration=6.0)
        assert isinstance(padded, MixedCut)
        m = padded.mix(speech, snr=0)
        assert m.duration == pytest.approx(6.0)


class TestMixedCutTransforms:
    def test_perturb_volume_scales_everything(self, speech, noise):
        m = mix(speech, noise)
        doubled = m.perturb_volume(2.0)
        np.testing.assert_allclose(
            doubled.load_audio(), 2.0 * m.load_audio(), atol=1e-5)

    def test_resample_mixed(self, speech, noise):
        m = mix(speech, noise)
        r = m.resample(8000)
        assert r.sampling_rate == 8000
        assert r.num_samples == pytest.approx(m.num_samples // 2, abs=2)
        assert r.load_audio().shape[1] == r.num_samples

    def test_perturb_speed_rescales_offsets(self, speech, noise):
        m = mix(speech, noise, offset=2.0)
        fast = m.perturb_speed(2.0)
        assert fast.duration == pytest.approx(m.duration / 2, abs=0.01)
        offsets = sorted(t.offset for t in fast.tracks)
        assert offsets[1] == pytest.approx(1.0, abs=0.01)

    def test_truncate_mixed_drops_empty_tracks(self, speech, noise):
        m = mix(speech, noise, offset=3.0)  # noise spans [3, 5)
        head = m.truncate(duration=2.5)
        # only the speech remains in [0, 2.5)
        assert head.load_audio().shape == (1, int(2.5 * SR))
        np.testing.assert_allclose(
            head.load_audio(), speech.load_audio()[:, : int(2.5 * SR)], atol=1e-6)

    def test_serialization_roundtrip_preserves_audio(self, speech, noise):
        from lhotse_tpu.cut import deserialize_cut

        m = mix(speech, noise, offset=1.0, snr=7.5)
        restored = deserialize_cut(m.to_dict())
        np.testing.assert_allclose(restored.load_audio(), m.load_audio(), atol=1e-7)

    def test_drop_features_keeps_audio(self, speech, noise):
        m = mix(speech, noise)
        assert m.drop_features().load_audio() is not None
