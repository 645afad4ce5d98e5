"""Cut algebra tests: truncate/pad/mix/append/windows/trims, serialization,
and the full CutSet feature-precompute pipeline."""
import numpy as np
import pytest

from lhotse_tpu import (
    CutSet, Fbank, LilcomChunkyWriter, MonoCut, Recording, RecordingSet, SupervisionSegment,
    SupervisionSet)
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut, PaddingCut, deserialize_cut, mix, pad


@pytest.fixture
def recording(tmp_path):
    rng = np.random.RandomState(0)
    x = (rng.randn(32000) * 0.1).astype(np.float32)
    p = tmp_path / "rec.wav"
    write_wav(str(p), x, 16000)
    return Recording.from_file(p)


@pytest.fixture
def cut(recording):
    return MonoCut(
        id="cut-1", start=0.0, duration=2.0, channel=0, recording=recording,
        supervisions=[ SupervisionSegment( id="sup-1", recording_id=recording.id, start=0.2, duration=0.5, text="a" ), SupervisionSegment( id="sup-2", recording_id=recording.id, start=1.0, duration=0.8, text="b" ), ],
    )


class TestCutBasics:
    def test_load_audio(self, cut):
        audio = cut.load_audio()
        assert audio.shape == (1, 32000)

    def test_truncate(self, cut):
        t = cut.truncate(offset=0.5, duration=1.0)
        assert t.start == 0.5
        assert t.duration == 1.0
        assert t.load_audio().shape == (1, 16000)
        # sup-1 (0.2-0.7) overlaps [0.5, 1.5); sup-2 (1.0-1.8) overlaps too.
        assert len(t.supervisions) == 2
        t2 = cut.truncate(offset=0.5, duration=1.0, keep_excessive_supervisions=False)
        assert len(t2.supervisions) == 0

    def test_split(self, cut):
        left, right = cut.split(0.8)
        assert abs(left.duration - 0.8) < 1e-9
        assert abs(right.duration - 1.2) < 1e-9

    def test_pad_audio(self, cut):
        padded = cut.pad(duration=3.0)
        assert isinstance(padded, MixedCut)
        assert padded.duration == 3.0
        audio = padded.load_audio()
        assert audio.shape == (1, 48000)
        np.testing.assert_allclose(audio[:, 32000:], 0.0)

    def test_pad_left(self, cut):
        padded = cut.pad(duration=3.0, direction="left")
        audio = padded.load_audio()
        assert audio.shape == (1, 48000)
        np.testing.assert_allclose(audio[:, :16000], 0.0)
        # Supervisions shift right by 1.0s.
        assert abs(padded.supervisions[0].start - 1.2) < 1e-6

    def test_append(self, cut):
        appended = cut.append(cut)
        assert appended.duration == 4.0
        assert appended.load_audio().shape == (1, 64000)

    def test_mix_with_snr(self, cut):
        mixed = mix(cut, cut, offset=0.5, snr=10)
        assert isinstance(mixed, MixedCut)
        assert abs(mixed.duration - 2.5) < 1e-8
        audio = mixed.load_audio()
        assert audio.shape == (1, 40000)

    def test_mix_unmix_roundtrip(self, cut):
        mixed = mix(cut, cut.with_id("other"), offset=0.25, snr=5)
        tracks = mixed.unmix()
        assert len(tracks) == 2
        recon = sum(t.load_audio() for t in tracks)
        np.testing.assert_allclose(recon, mixed.load_audio(), atol=1e-5)

    def test_cut_into_windows(self, cut):
        windows = cut.cut_into_windows(duration=0.5)
        assert len(windows) == 4
        assert all(abs(w.duration - 0.5) < 1e-9 for w in windows)

    def test_trim_to_supervisions(self, cut):
        trimmed = cut.trim_to_supervisions(keep_overlapping=False)
        assert len(trimmed) == 2
        for t, sup in zip(trimmed, cut.supervisions):
            assert abs(t.duration - sup.duration) < 1e-9
            assert t.id == sup.id

    def test_trim_to_supervision_groups(self, cut):
        groups = cut.trim_to_supervision_groups(max_pause=0.5)
        assert len(groups) == 1  # gap 0.3s <= 0.5 merges both
        groups2 = cut.trim_to_supervision_groups(max_pause=0.1)
        assert len(groups2) == 2

    def test_supervision_masks(self, cut):
        mask = cut.supervisions_audio_mask()
        assert mask.shape == (32000,)
        expected_ratio = (0.5 + 0.8) / 2.0
        assert abs(mask.mean() - expected_ratio) < 0.01

    def test_serialization_roundtrip(self, cut):
        restored = deserialize_cut(cut.to_dict())
        assert restored.id == cut.id
        assert restored.duration == cut.duration
        np.testing.assert_allclose(restored.load_audio(), cut.load_audio())

    def test_mixed_serialization_roundtrip(self, cut):
        mixed = cut.pad(duration=3.0).mix(cut.with_id("x"), snr=10)
        restored = deserialize_cut(mixed.to_dict())
        np.testing.assert_allclose(restored.load_audio(), mixed.load_audio(), atol=1e-6)

    def test_resample(self, cut):
        r = cut.resample(8000)
        audio = r.load_audio()
        assert audio.shape == (1, 16000)

    def test_perturb_speed(self, cut):
        sp = cut.perturb_speed(1.1)
        assert sp.supervisions[0].start < cut.supervisions[0].start
        audio = sp.load_audio()
        assert audio.shape[1] == sp.num_samples

    def test_padding_cut(self):
        pc = PaddingCut(
            id="pad", duration=1.0, sampling_rate=16000, feat_value=-23.0, num_samples=16000)
        assert pc.load_audio().shape == (1, 16000)
        np.testing.assert_allclose(pc.load_audio(), 0.0)


class TestCutFeatures:
    def test_compute_features(self, cut):
        feats = cut.compute_features(Fbank())
        assert feats.shape == (200, 80)

    def test_compute_and_store_features(self, cut, tmp_path):
        with LilcomChunkyWriter(tmp_path / "feats") as storage:
            cut_f = cut.compute_and_store_features(Fbank(), storage)
        assert cut_f.has_features
        assert cut_f.num_frames == 200
        feats = cut_f.load_features()
        assert feats.shape == (200, 80)
        direct = cut.compute_features(Fbank())
        assert np.abs(feats - direct).max() <= 2**-6 + 1e-5

    def test_padded_feature_load(self, cut, tmp_path):
        with LilcomChunkyWriter(tmp_path / "feats") as storage:
            cut_f = cut.compute_and_store_features(Fbank(), storage)
        padded = cut_f.pad(duration=3.0)
        feats = padded.load_features()
        assert feats.shape == (300, 80)
        # Padding frames hold LOG_EPSILON.
        np.testing.assert_allclose(feats[200:], np.log(1e-10), atol=1e-4)

    def test_feature_domain_mix(self, cut, tmp_path):
        with LilcomChunkyWriter(tmp_path / "feats") as storage:
            a = cut.compute_and_store_features(Fbank(), storage)
            b = cut.with_id("b").compute_and_store_features(Fbank(), storage)
        mixed = mix(a.drop_recording(), b.drop_recording(), snr=10)
        feats = mixed.load_features()
        assert feats.shape == (200, 80)
        # With positive SNR, the mix energy is close to (slightly above) a's.
        ea = Fbank.compute_energy(a.load_features())
        em = Fbank.compute_energy(feats)
        assert em > ea
        assert em < 1.2 * ea


class TestCutSet:
    @pytest.fixture
    def cuts(self, recording):
        sups = SupervisionSet.from_segments(
            [
                SupervisionSegment(
                    id=f"sup{i}", recording_id=recording.id, start=0.0,
                    duration=2.0, text=f"t{i}", speaker=f"spk{i % 2}",
                )
                for i in range(1)
            ]
        )
        recs = RecordingSet.from_recordings([recording.copy_with(id=recording.id)])
        sups = SupervisionSet.from_segments(
            [
                SupervisionSegment(
                    id="sup0", recording_id=recording.id, start=0.0, duration=2.0,
                    text="hello", speaker="spk0",
                )
            ]
        )
        return CutSet.from_manifests(recordings=recs, supervisions=sups)

    def test_from_manifests(self, cuts, recording):
        assert len(cuts) == 1
        c = cuts[0]
        assert c.duration == recording.duration
        assert len(c.supervisions) == 1

    def test_jsonl_roundtrip(self, cuts, tmp_path):
        p = tmp_path / "cuts.jsonl.gz"
        cuts.to_file(p)
        cuts2 = CutSet.from_file(p).to_eager()
        assert cuts2[0].id == cuts[0].id
        np.testing.assert_allclose(cuts2[0].load_audio(), cuts[0].load_audio())

    def test_compute_and_store_features_pipeline(self, cuts, tmp_path):
        cuts_f = cuts.compute_and_store_features(
            extractor=Fbank(), storage_path=tmp_path / "feats", progress_bar=False)
        assert all(c.has_features for c in cuts_f)
        assert cuts_f[0].load_features().shape == (200, 80)

    def test_cut_set_mix(self, cuts):
        noise = CutSet.from_cuts([cuts[0].with_id("noise")])
        mixed = CutSet(cuts).mix(noise, snr=10, seed=0)
        out = list(mixed)
        assert len(out) == 1
        assert isinstance(out[0], MixedCut)
        assert out[0].load_audio().shape == (1, 32000)

    def test_windows_and_pad(self, cuts):
        windows = cuts.cut_into_windows(duration=0.6).to_eager()
        assert len(windows) == 4
        padded = windows.pad(duration=0.6)
        for c in padded:
            assert c.duration == 0.6

    def test_describe_smoke(self, cuts, capsys):
        cuts.describe()
        out = capsys.readouterr().out
        assert "Cuts count:" in out

    def test_decompose(self, cuts, tmp_path):
        recs, sups, feats = cuts.decompose(output_dir=tmp_path)
        assert len(list(recs)) == 1
        assert len(list(sups)) == 1

    def test_sort_and_subset(self, cuts):
        many = CutSet.from_cuts(
            [cuts[0].truncate(duration=0.5 + 0.1 * i).with_id(f"c{i}") for i in range(5)]
        )
        srt = many.sort_by_duration()
        durs = [c.duration for c in srt]
        assert durs == sorted(durs, reverse=True)
        assert len(many.subset(first=2)) == 2
        sub = many.subset(cut_ids=["c3", "c1"])
        assert [c.id for c in sub] == ["c3", "c1"]
