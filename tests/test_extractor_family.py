"""The torchaudio-/kaldifeat-/librosa-named extractors (all native here)."""
import numpy as np
import pytest

from lhotse_tpu import (
    Fbank, FbankConfig, KaldifeatFbank, KaldifeatFbankConfig, KaldifeatMfcc, LibrosaFbank,
    TorchaudioFbank, TorchaudioFbankConfig, TorchaudioMfcc, TorchaudioSpectrogram)
from lhotse_tpu.features.base import create_default_feature_extractor
from lhotse_tpu.features.kaldifeat import KaldifeatFrameOptions, KaldifeatMelOptions
from lhotse_tpu.features.librosa_fbank import pad_or_truncate_features


@pytest.fixture
def audio():
    return (np.random.RandomState(0).randn(16000) * 0.1).astype(np.float32)


def test_torchaudio_fbank_matches_kaldi_fbank(audio):
    out = TorchaudioFbank().extract(audio, 16000)
    ref = Fbank(FbankConfig()).extract(audio, 16000)
    np.testing.assert_array_equal(out, ref)
    assert out.shape == (100, 80)


def test_torchaudio_mfcc_and_spectrogram(audio):
    mf = TorchaudioMfcc()
    assert mf.extract(audio, 16000).shape == (100, 13)
    sp = TorchaudioSpectrogram()
    o = sp.extract(audio, 16000)
    assert o.shape == (100, sp.feature_dim(16000)) == (100, 257)
    # bin 0 carries the raw frame log-energy, not a spectrum bin.
    assert o[:, 0].mean() > o[:, 1].mean() + 1.0


def test_torchaudio_fbank_unsupported_options():
    with pytest.raises(AssertionError):
        TorchaudioFbank(TorchaudioFbankConfig(vtln_warp=1.1))
    with pytest.raises(AssertionError):
        TorchaudioFbank(TorchaudioFbankConfig(min_duration=1.0))


def test_torchaudio_fbank_mix_roundtrip(audio):
    a = TorchaudioFbank().extract(audio, 16000)
    mixed = TorchaudioFbank.mix(a, a, 1.0)
    np.testing.assert_allclose(mixed, a + np.log(2.0), atol=1e-5)
    assert TorchaudioFbank.compute_energy(a) > 0


def test_kaldifeat_fbank_list_api(audio):
    kf = KaldifeatFbank()
    outs = kf.extract([audio, audio[:8000]], 16000)
    assert [o.shape for o in outs] == [(100, 80), (50, 80)]
    ref = Fbank(FbankConfig()).extract(audio, 16000)
    np.testing.assert_array_equal(outs[0], ref)


def test_kaldifeat_config_serialized_key_renames():
    cfg = KaldifeatFbankConfig(
        frame_opts=KaldifeatFrameOptions(sampling_rate=8000, frame_shift=0.02),
        mel_opts=KaldifeatMelOptions(num_bins=40))
    d = cfg.to_dict()
    assert d["frame_opts"]["samp_freq"] == 8000.0
    assert d["frame_opts"]["frame_shift_ms"] == 20.0
    rt = KaldifeatFbankConfig.from_dict(d)
    assert rt == cfg
    ext = KaldifeatFbank(rt)
    assert ext.feature_dim(8000) == 40 and ext.frame_shift == 0.02


def test_kaldifeat_mfcc(audio):
    assert KaldifeatMfcc().extract(audio, 16000).shape == (100, 13)


def test_librosa_fbank(audio22=None):
    audio22 = (np.random.RandomState(1).randn(22050) * 0.1).astype(np.float32)
    lb = LibrosaFbank()
    out = lb.extract(audio22, 22050)
    assert out.shape == ((22050 + 128) // 256, 80)
    assert np.isfinite(out).all()
    assert lb.frame_shift == pytest.approx(256 / 22050)
    with pytest.raises(AssertionError):
        lb.extract(audio22, 16000)


def test_pad_or_truncate_features():
    x = np.zeros((10, 4), dtype=np.float32)
    assert pad_or_truncate_features(x, 9).shape == (9, 4)
    assert pad_or_truncate_features(x, 11).shape == (11, 4)
    with pytest.raises(ValueError):
        pad_or_truncate_features(x, 20)


def test_registry_names_match_reference():
    expected = {
        "fbank": TorchaudioFbank, "mfcc": TorchaudioMfcc, "spectrogram": TorchaudioSpectrogram,
        "kaldifeat-fbank": KaldifeatFbank, "kaldifeat-mfcc": KaldifeatMfcc,
        "librosa-fbank": LibrosaFbank}
    for name, cls in expected.items():
        assert isinstance(create_default_feature_extractor(name), cls)


def test_feature_config_yaml_roundtrip(tmp_path, audio):
    from lhotse_tpu.features.base import FeatureExtractor

    fb = TorchaudioFbank(TorchaudioFbankConfig(num_mel_bins=40))
    p = tmp_path / "feat.yml"
    fb.to_yaml(p)
    rt = FeatureExtractor.from_yaml(p)
    assert isinstance(rt, TorchaudioFbank)
    assert rt.extract(audio, 16000).shape == (100, 40)
