"""PaddingCut edge cases: silence synthesis, transforms, serialization, and
interaction with feature extraction.

Behavioral envelope mirrored from `/root/reference/test/cut/test_padding_cut.py`.
"""
import numpy as np
import pytest

from lhotse_tpu import Fbank
from lhotse_tpu.cut import PaddingCut, deserialize_cut
from lhotse_tpu.utils import LOG_EPSILON

SR = 16000


@pytest.fixture
def pad_cut():
    return PaddingCut(
        id="pad-1", duration=2.0, sampling_rate=SR, feat_value=LOG_EPSILON,
        num_samples=2 * SR)


class TestPaddingAudio:
    def test_load_audio_is_zeros(self, pad_cut):
        audio = pad_cut.load_audio()
        assert audio.shape == (1, 2 * SR)
        assert audio.dtype == np.float32
        np.testing.assert_equal(audio, 0.0)

    def test_num_samples_consistency(self, pad_cut):
        assert pad_cut.num_samples == int(pad_cut.duration * pad_cut.sampling_rate)

    def test_no_supervisions(self, pad_cut):
        assert pad_cut.supervisions == []

    def test_has_no_fields(self, pad_cut):
        assert not pad_cut.has("my_custom_field")


class TestPaddingTransforms:
    def test_truncate(self, pad_cut):
        t = pad_cut.truncate(offset=0.5, duration=1.0)
        assert t.duration == pytest.approx(1.0)
        assert t.num_samples == SR
        np.testing.assert_equal(t.load_audio(), 0.0)

    def test_truncate_preserve_id(self, pad_cut):
        assert pad_cut.truncate(offset=0.5, preserve_id=True).id == pad_cut.id
        assert pad_cut.truncate(offset=0.5, preserve_id=False).id != pad_cut.id

    def test_extend_by(self, pad_cut):
        e = pad_cut.extend_by(duration=1.0, direction="both")
        assert e.duration == pytest.approx(4.0)

    def test_pad_a_padding_cut(self, pad_cut):
        p = pad_cut.pad(duration=5.0)
        assert p.duration == pytest.approx(5.0)
        np.testing.assert_equal(p.load_audio(), 0.0)

    def test_resample(self, pad_cut):
        r = pad_cut.resample(8000)
        assert r.sampling_rate == 8000
        assert r.num_samples == SR
        assert r.duration == pytest.approx(2.0)

    def test_perturb_speed_changes_duration(self, pad_cut):
        fast = pad_cut.perturb_speed(2.0)
        assert fast.duration == pytest.approx(1.0)
        assert fast.num_samples == SR
        assert "sp2.0" in fast.id

    def test_perturb_tempo(self, pad_cut):
        slow = pad_cut.perturb_tempo(0.5)
        assert slow.duration == pytest.approx(4.0)

    def test_perturb_volume_is_identity_on_silence(self, pad_cut):
        louder = pad_cut.perturb_volume(10.0)
        np.testing.assert_equal(louder.load_audio(), 0.0)
        assert "vp10.0" in louder.id

    def test_transform_passthroughs_keep_type(self, pad_cut):
        assert isinstance(pad_cut.normalize_loudness(-20), PaddingCut)
        # dropping the only representation a PaddingCut has is refused
        with pytest.raises(AssertionError):
            pad_cut.drop_recording()
        # drop_features likewise refuses when features are the only representation
        # (matches reference padding.py:421-426 semantics)
        featureful = PaddingCut(
            id="pf", duration=1.0, sampling_rate=SR, feat_value=0.0,
            num_frames=100, num_features=80, frame_shift=0.01)
        with pytest.raises(AssertionError):
            featureful.drop_features()
        both = PaddingCut(
            id="pb", duration=1.0, sampling_rate=SR, feat_value=0.0,
            num_frames=100, num_features=80, frame_shift=0.01, num_samples=SR)
        dropped = both.drop_features()
        assert isinstance(dropped, PaddingCut)
        assert not dropped.has_features and dropped.has_recording


class TestPaddingSerialization:
    def test_dict_roundtrip(self, pad_cut):
        restored = deserialize_cut(pad_cut.to_dict())
        assert isinstance(restored, PaddingCut)
        assert restored.duration == pad_cut.duration
        assert restored.num_samples == pad_cut.num_samples
        assert restored.feat_value == pad_cut.feat_value

    def test_from_dict_direct(self, pad_cut):
        restored = PaddingCut.from_dict(pad_cut.to_dict())
        assert restored.id == pad_cut.id


class TestPaddingFeatures:
    def test_compute_features_extracts_on_silence(self, pad_cut):
        # compute_features() goes through the real extractor on zero samples
        # (not feat_value fill) -- every frame sits at the mel floor, so the
        # output must be a constant matrix.
        feats = pad_cut.compute_features(extractor=Fbank())
        assert feats.ndim == 2
        np.testing.assert_allclose(feats, feats.flat[0], rtol=1e-6)

    def test_frame_counts_follow_extractor(self, pad_cut):
        feats = pad_cut.compute_features(extractor=Fbank())
        # 2s at 10ms shift -> ~200 frames
        assert abs(feats.shape[0] - 200) <= 2
