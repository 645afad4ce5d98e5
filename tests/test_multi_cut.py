"""
MultiCut operations on real stereo audio (reference surface:
/root/reference/test/cut/ multi-cut coverage; lhotse/cut/multi.py).
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut, MonoCut, MultiCut

SR = 16000
DUR = 2.0
N = int(SR * DUR)


@pytest.fixture
def stereo(tmp_path):
    rng = np.random.RandomState(0)
    t = np.arange(N) / SR
    left = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    right = (0.1 * rng.randn(N)).astype(np.float32)
    path = tmp_path / "stereo.wav"
    write_wav(str(path), np.stack([left, right]), SR)
    return Recording.from_file(path), left, right


@pytest.fixture
def cut(stereo):
    rec, _, _ = stereo
    c = rec.to_cut()
    c.supervisions = [
        SupervisionSegment(
            id="s0", recording_id=rec.id, start=0.25, duration=1.0,
            channel=[0, 1], text="hi",
        )
    ]
    return c


class TestMultiCutBasics:
    def test_recording_to_cut_is_multi(self, cut):
        assert isinstance(cut, MultiCut)
        assert cut.num_channels == 2
        assert cut.channel == [0, 1]

    def test_load_audio_all_channels(self, cut, stereo):
        _, left, right = stereo
        audio = cut.load_audio()
        assert audio.shape == (2, N)
        np.testing.assert_allclose(audio[0], left, atol=1e-4)
        np.testing.assert_allclose(audio[1], right, atol=1e-4)

    def test_load_audio_single_channel(self, cut, stereo):
        _, left, _ = stereo
        audio = cut.load_audio(channel=0)
        assert audio.shape == (1, N)
        np.testing.assert_allclose(audio[0], left, atol=1e-4)

    def test_with_channels_returns_mono(self, cut):
        mono = cut.with_channels(1)
        assert isinstance(mono, MonoCut)
        assert mono.channel == 1
        assert mono.load_audio().shape == (1, N)

    def test_with_channels_subset_multi(self, cut):
        sub = cut.with_channels([0, 1])
        assert isinstance(sub, MultiCut)

    def test_truncate_keeps_channels(self, cut):
        tr = cut.truncate(offset=0.5, duration=1.0)
        assert isinstance(tr, MultiCut)
        audio = tr.load_audio()
        assert audio.shape == (2, SR)
        full = cut.load_audio()
        np.testing.assert_allclose(audio, full[:, SR // 2 : SR // 2 + SR], atol=1e-6)


class TestToFromMono:
    def test_to_mono_splits_channels(self, cut, stereo):
        _, left, right = stereo
        monos = cut.to_mono()
        assert len(monos) == 2
        assert all(isinstance(m, MonoCut) for m in monos)
        np.testing.assert_allclose(monos[0].load_audio()[0], left, atol=1e-4)
        np.testing.assert_allclose(monos[1].load_audio()[0], right, atol=1e-4)

    def test_to_mono_downmix_sums_channels(self, cut, stereo):
        _, left, right = stereo
        downmixed = cut.to_mono(mono_downmix=True)
        audio = downmixed.load_audio()
        assert audio.shape == (1, N)
        np.testing.assert_allclose(audio[0], left + right, atol=1e-3)

    def test_from_mono_roundtrip(self, cut):
        monos = cut.to_mono()
        back = MultiCut.from_mono(*monos)
        assert isinstance(back, MultiCut)
        assert back.channel == [0, 1]
        np.testing.assert_allclose(back.load_audio(), cut.load_audio(), atol=1e-6)

    def test_from_mono_rejects_mismatched_spans(self, cut):
        monos = cut.to_mono()
        shifted = monos[1].truncate(offset=0.5)
        with pytest.raises(AssertionError):
            MultiCut.from_mono(monos[0], shifted)

    def test_from_mono_rejects_duplicate_channels(self, cut):
        monos = cut.to_mono()
        with pytest.raises(AssertionError):
            MultiCut.from_mono(monos[0], monos[0])


class TestMultiCutOps:
    def test_pad_produces_mixed_with_multi_track(self, cut):
        padded = cut.pad(duration=3.0)
        assert isinstance(padded, MixedCut)
        audio = padded.load_audio()
        assert audio.shape == (2, int(3.0 * SR))
        np.testing.assert_allclose(audio[:, N:], 0.0, atol=1e-7)

    def test_resample(self, cut):
        res = cut.resample(8000)
        audio = res.load_audio()
        assert audio.shape[0] == 2
        assert abs(audio.shape[1] - SR) <= 1  # 2 s at 8 kHz

    def test_supervision_masks_cover_channels(self, cut):
        # 1-D over samples regardless of channel count (reference
        # base.py:1141-1146 contract).
        mask = cut.supervisions_audio_mask()
        assert mask.shape == (N,)
        lo, hi = int(0.25 * SR), int(1.25 * SR)
        assert mask[lo:hi].all()
        assert not mask[: lo - 1].any()

    def test_serialization_roundtrip(self, cut):
        restored = CutSet.from_cuts([cut]).from_dicts(
            [c.to_dict() for c in [cut]]
        ) if False else MultiCut.from_dict(cut.to_dict())
        assert isinstance(restored, MultiCut)
        assert restored.channel == cut.channel
        np.testing.assert_allclose(restored.load_audio(), cut.load_audio(), atol=1e-7)
        assert restored.supervisions[0].channel == [0, 1]

    def test_cutset_roundtrip_via_jsonl(self, cut, tmp_path):
        path = tmp_path / "cuts.jsonl.gz"
        CutSet.from_cuts([cut]).to_file(path)
        restored = CutSet.from_file(path)[0]
        assert isinstance(restored, MultiCut)
        np.testing.assert_allclose(restored.load_audio(), cut.load_audio(), atol=1e-7)

    def test_perturb_volume(self, cut):
        loud = cut.perturb_volume(2.0)
        np.testing.assert_allclose(
            loud.load_audio(), 2.0 * cut.load_audio(), atol=1e-4
        )

    def test_reverb_rir_with_explicit_rir(self, cut, tmp_path):
        rng = np.random.RandomState(2)
        taps = np.exp(-np.arange(1600) / 200.0).astype(np.float32) * 0.2
        taps[10] = 1.0
        write_wav(str(tmp_path / "rir.wav"), taps, SR)
        rir = Recording.from_file(tmp_path / "rir.wav")
        rev = cut.reverb_rir(rir_recording=rir)
        assert isinstance(rev, MultiCut)
        assert rev.id.endswith("_rvb")
        audio = rev.load_audio()
        assert audio.shape == (2, N)
        assert np.isfinite(audio).all()
        assert not np.allclose(audio, cut.load_audio())

    def test_reverb_rir_synthetic_requires_mono(self, cut):
        with pytest.raises(AssertionError):
            cut.reverb_rir()  # 2-channel MultiCut, no RIR provided

    def test_merge_supervisions(self, cut):
        cut.supervisions.append(
            SupervisionSegment(
                id="s1", recording_id=cut.recording_id, start=1.3,
                duration=0.5, channel=[0, 1], text="there",
            )
        )
        merged = cut.merge_supervisions()
        assert len(merged.supervisions) == 1
        assert merged.supervisions[0].text == "hi there"
