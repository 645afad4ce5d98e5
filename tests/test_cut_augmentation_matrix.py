"""
Cut-level augmentation matrix: speed/tempo/volume perturbation, RIR
reverberation (real, synthetic, multi-channel, mix_first), loudness
normalization, WPE dereverberation, resampling, and codec compression —
across MonoCut / MixedCut / PaddingCut, with nonzero cut starts and
serialization round trips.

Behavioral model: /root/reference/test/cut/test_cut_augmentation.py.
"""
import os
import stat

import numpy as np
import pytest

from lhotse_tpu import CutSet, MonoCut, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut, MultiCut, PaddingCut

SR = 16000


def _tone_cut(tmp_path, name, seconds=1.2, start=0.0, freq=220.0, amp=0.3):
    n = int(seconds * SR)
    t = np.arange(n) / SR
    x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    p = tmp_path / f"{name}.wav"
    write_wav(str(p), x, SR)
    rec = Recording.from_file(p, recording_id=name)
    dur = seconds - start
    return MonoCut(
        id=name, start=start, duration=dur, channel=0, recording=rec,
        supervisions=[
            SupervisionSegment(
                id=f"{name}-sup", recording_id=name, start=0.1,
                duration=round(dur - 0.2, 3), channel=0, text=name)])


def _rir_recording(tmp_path, name="rir", channels=1, seconds=0.25):
    n = int(seconds * SR)
    rng = np.random.RandomState(7)
    decay = np.exp(-np.arange(n) / (0.02 * SR))
    data = np.stack(
        [decay * (rng.randn(n) * 0.05 + (np.arange(n) == 0)) for _ in range(channels)]
    ).astype(np.float32)
    p = tmp_path / f"{name}.wav"
    write_wav(str(p), data, SR)
    return Recording.from_file(p, recording_id=name)


@pytest.fixture
def cut(tmp_path):
    return _tone_cut(tmp_path, "c0", seconds=1.2, start=0.1)


@pytest.fixture
def rir(tmp_path):
    return _rir_recording(tmp_path)


# ---------------------------------------------------------------------------
# Speed / tempo on cuts with nonzero start
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("factor", [1.1, 0.9])
def test_cut_start01_perturb_speed(cut, factor):
    sp = cut.perturb_speed(factor)
    assert sp.start == pytest.approx(cut.start / factor, abs=1e-3)
    assert sp.duration == pytest.approx(cut.duration / factor, abs=1e-3)
    assert sp.sampling_rate == SR
    for old, new in zip(cut.supervisions, sp.supervisions):
        assert new.start == pytest.approx(old.start / factor, abs=1e-3)
        assert new.duration == pytest.approx(old.duration / factor, abs=1e-3)
    audio = sp.load_audio()
    assert audio.shape == (1, sp.num_samples)
    assert sp.id.endswith(f"_sp{factor}")


@pytest.mark.parametrize("factor", [1.1, 0.9])
def test_cut_start01_perturb_tempo(cut, factor):
    tp = cut.perturb_tempo(factor)
    # Tempo changes duration WITHOUT changing pitch or sampling rate.
    assert tp.duration == pytest.approx(cut.duration / factor, abs=1e-2)
    assert tp.sampling_rate == SR
    for old, new in zip(cut.supervisions, tp.supervisions):
        assert new.duration == pytest.approx(old.duration / factor, abs=1e-2)
    audio = tp.load_audio()
    assert audio.shape == (1, tp.num_samples)


def test_cut_perturb_volume(cut):
    vp = cut.perturb_volume(0.125)
    assert vp.duration == cut.duration and vp.start == cut.start
    assert vp.num_samples == cut.num_samples
    # Supervisions keep their times, only ids are affixed.
    for old, new in zip(cut.supervisions, vp.supervisions):
        assert (new.start, new.duration) == (old.start, old.duration)
    np.testing.assert_allclose(
        vp.load_audio(), cut.load_audio() * 0.125, atol=2 / 32768
    )


# ---------------------------------------------------------------------------
# CutSet-level ops must not stack duplicate transforms
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "op,kwargs",
    [
        ("perturb_speed", {"factor": 1.1}),
        ("perturb_volume", {"factor": 2.0}),
        ("resample", {"sampling_rate": 8000}),
        ("reverb_rir", {}),
    ],
)
def test_cut_set_ops_dont_duplicate_transforms(tmp_path, op, kwargs):
    cuts = CutSet.from_cuts(
        [_tone_cut(tmp_path, f"t{i}", seconds=0.6) for i in range(3)]
    )
    out = getattr(cuts, op)(**kwargs)
    for c in out:
        assert len(c.recording.transforms or []) == 1, (
            f"{op} stacked {len(c.recording.transforms)} transforms"
        )


# ---------------------------------------------------------------------------
# MixedCut augmentation
# ---------------------------------------------------------------------------
@pytest.fixture
def mixed(tmp_path):
    a = _tone_cut(tmp_path, "ma", seconds=1.0, freq=220)
    b = _tone_cut(tmp_path, "mb", seconds=0.8, freq=950)
    return a.mix(b, offset_other_by=0.4, snr=10.0)


def test_mixed_cut_perturb_speed(mixed):
    sp = mixed.perturb_speed(1.1)
    assert isinstance(sp, MixedCut)
    assert sp.duration == pytest.approx(mixed.duration / 1.1, abs=1e-2)
    audio = sp.load_audio()
    assert audio.shape == (1, sp.num_samples)
    # Track offsets rescale with the same factor.
    assert sp.tracks[1].offset == pytest.approx(
        mixed.tracks[1].offset / 1.1, abs=1e-3
    )


def test_mixed_cut_perturb_volume(mixed):
    vp = mixed.perturb_volume(0.5)
    assert isinstance(vp, MixedCut)
    assert vp.num_samples == mixed.num_samples
    np.testing.assert_allclose(
        vp.load_audio(), mixed.load_audio() * 0.5, atol=3 / 32768
    )


@pytest.mark.parametrize("mix_first", [True, False])
def test_mixed_cut_reverb_rir(mixed, rir, mix_first):
    rv = mixed.reverb_rir(rir_recording=rir, mix_first=mix_first)
    audio = rv.load_audio()
    assert audio.shape == (1, rv.num_samples)
    assert np.isfinite(audio).all()
    assert rv.num_samples == mixed.num_samples
    # The reverberated signal must differ from the dry mix.
    assert not np.allclose(audio, mixed.load_audio(), atol=1e-4)


def test_mixed_cut_reverb_rir_survives_serialization(mixed, rir):
    rv = mixed.reverb_rir(rir_recording=rir, mix_first=True)
    restored = MixedCut.from_dict(rv.to_dict())
    np.testing.assert_allclose(restored.load_audio(), rv.load_audio(), atol=1e-6)


def test_mixed_cut_resample(mixed):
    rs = mixed.resample(8000)
    assert rs.sampling_rate == 8000
    audio = rs.load_audio()
    assert audio.shape == (1, rs.num_samples)
    assert rs.num_samples == pytest.approx(mixed.num_samples / 2, abs=2)


def test_mixed_cut_normalize_loudness(mixed):
    ln = mixed.normalize_loudness(target=-15.0)
    audio = ln.load_audio()
    assert audio.shape == (1, ln.num_samples)
    assert np.isfinite(audio).all()
    # Round trip through dict serialization preserves the lazy transform.
    restored = MixedCut.from_dict(ln.to_dict())
    np.testing.assert_allclose(restored.load_audio(), audio, atol=1e-6)


# ---------------------------------------------------------------------------
# MonoCut reverberation: real RIR, cut-input, early-only, multi-channel,
# synthetic (fast random) determinism, sampling-rate mismatch
# ---------------------------------------------------------------------------
def test_cut_reverb_rir(cut, rir):
    rv = cut.reverb_rir(rir_recording=rir)
    assert rv.num_samples == cut.num_samples
    audio = rv.load_audio()
    assert audio.shape == (1, rv.num_samples)
    assert not np.allclose(audio, cut.load_audio(), atol=1e-4)
    assert rv.id.startswith(cut.id)


def test_cut_reverb_rir_input_is_cut(cut, rir):
    rir_cut = MonoCut(
        id="rir-cut", start=0.0, duration=rir.duration, channel=0, recording=rir
    )
    rv = cut.reverb_rir(rir_recording=rir_cut)
    audio = rv.load_audio()
    assert audio.shape == (1, rv.num_samples)
    assert np.isfinite(audio).all()


def test_cut_reverb_rir_early_only(cut, rir):
    full = cut.reverb_rir(rir_recording=rir, early_only=False)
    early = cut.reverb_rir(rir_recording=rir, early_only=True)
    assert early.num_samples == full.num_samples
    assert not np.allclose(early.load_audio(), full.load_audio(), atol=1e-6)


def test_cut_reverb_rir_sampling_rate_mismatch(tmp_path, cut):
    n = 2000
    data = np.zeros(n, np.float32)
    data[0] = 1.0
    p = tmp_path / "rir8k.wav"
    write_wav(str(p), data, 8000)
    bad_rir = Recording.from_file(p)
    with pytest.raises(AssertionError):
        cut.reverb_rir(rir_recording=bad_rir).load_audio()


def test_cut_reverb_multi_channel_rir(tmp_path, cut):
    rir2 = _rir_recording(tmp_path, name="rir2", channels=2)
    rv = cut.reverb_rir(rir_recording=rir2, rir_channels=[0, 1])
    assert isinstance(rv, MultiCut)
    audio = rv.load_audio()
    assert audio.shape == (2, rv.num_samples)
    # The two channels come from different RIR channels.
    assert not np.allclose(audio[0], audio[1], atol=1e-6)


def test_cut_reverb_fast_random_rir_is_seeded(cut):
    a = cut.reverb_rir(room_rng_seed=11, source_rng_seed=13)
    b = cut.reverb_rir(room_rng_seed=11, source_rng_seed=13)
    c = cut.reverb_rir(room_rng_seed=12, source_rng_seed=13)
    np.testing.assert_allclose(a.load_audio(), b.load_audio(), atol=1e-7)
    assert not np.allclose(a.load_audio(), c.load_audio(), atol=1e-5)


def test_cut_reverb_rir_invalid_channel_raises(cut, rir):
    with pytest.raises(AssertionError):
        cut.reverb_rir(rir_recording=rir, rir_channels=[1])  # mono RIR


# ---------------------------------------------------------------------------
# Loudness / WPE on mono and multi cuts
# ---------------------------------------------------------------------------
def test_cut_normalize_loudness(cut):
    quiet = cut.perturb_volume(0.05)
    ln = quiet.normalize_loudness(target=-15.0)
    before = np.sqrt(np.mean(quiet.load_audio() ** 2))
    after = np.sqrt(np.mean(ln.load_audio() ** 2))
    assert after > before  # boosted toward the louder target
    assert ln.num_samples == cut.num_samples


def test_mono_cut_dereverb_wpe(cut, rir):
    rv = cut.reverb_rir(rir_recording=rir)
    dw = rv.dereverb_wpe()
    audio = dw.load_audio()
    assert audio.shape == (1, dw.num_samples)
    assert np.isfinite(audio).all()


def test_multi_cut_dereverb_wpe(tmp_path):
    n = int(0.8 * SR)
    rng = np.random.RandomState(3)
    data = (0.1 * rng.randn(2, n)).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(str(p), data, SR)
    rec = Recording.from_file(p)
    mc = MultiCut(
        id="mc", start=0.0, duration=rec.duration, channel=[0, 1], recording=rec
    )
    dw = mc.dereverb_wpe()
    audio = dw.load_audio()
    assert audio.shape == (2, dw.num_samples)
    assert np.isfinite(audio).all()


# ---------------------------------------------------------------------------
# PaddingCut augmentation semantics
# ---------------------------------------------------------------------------
@pytest.fixture
def padding():
    return PaddingCut(
        id="pad", duration=1.0, sampling_rate=SR, feat_value=-23.0,
        num_samples=SR)


@pytest.mark.parametrize("factor", [1.1, 0.9])
def test_padding_cut_perturb_speed(padding, factor):
    sp = padding.perturb_speed(factor)
    assert sp.duration == pytest.approx(1.0 / factor, abs=1e-3)
    assert sp.num_samples == int(round(SR / factor)) or abs(
        sp.num_samples - SR / factor
    ) <= 1
    assert (sp.load_audio() == 0).all()


def test_padding_cut_perturb_volume(padding):
    vp = padding.perturb_volume(8.0)
    assert (vp.load_audio() == 0).all()  # silence stays silence
    assert vp.duration == padding.duration


def test_padding_cut_resample(padding):
    rs = padding.resample(8000)
    assert rs.sampling_rate == 8000
    assert rs.num_samples == 8000
    assert (rs.load_audio() == 0).all()


def test_padding_cut_reverb_rir(padding, rir):
    rv = padding.reverb_rir(rir_recording=rir)
    assert rv.duration == padding.duration
    assert (rv.load_audio() == 0).all()  # reverberated silence is silence


# ---------------------------------------------------------------------------
# Compression
# ---------------------------------------------------------------------------
def test_compress_invalid_params(cut):
    with pytest.raises(ValueError):
        cut.compress(codec="flac")  # lossless codec: not a compress target
    with pytest.raises(ValueError):
        cut.compress(codec="opus", compression_level=1.5)


@pytest.fixture
def stub_ffmpeg(tmp_path, monkeypatch):
    """A passthrough ffmpeg: copies stdin to stdout, so 'encode' emits the
    original wav and 'decode' returns it — exercising the full transform
    plumbing without a real codec."""
    path = tmp_path / "bin"
    path.mkdir()
    script = path / "ffmpeg"
    script.write_text("#!/bin/sh\ncat /dev/stdin\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{path}{os.pathsep}{os.environ['PATH']}")
    return script


def test_cut_compress_roundtrip_via_stub_codec(cut, stub_ffmpeg, monkeypatch):
    # Compress now prefers the in-process system codecs; disable them so
    # this still exercises the ffmpeg-subprocess plumbing via the stub
    # binary (real lossy behavior is covered in tests/test_syscodecs.py).
    from lhotse_tpu.augmentation.compress import Compress

    monkeypatch.setattr(
        Compress, "_roundtrip_syscodec", lambda self, s, sr: None
    )
    cp = cut.compress(codec="opus", compression_level=0.5)
    assert len(cp.recording.transforms) == 1
    audio = cp.load_audio()
    assert audio.shape == (1, cp.num_samples)
    # Passthrough codec: the round trip is numerically transparent.
    np.testing.assert_allclose(audio, cut.load_audio(), atol=1e-6)


def test_cut_compress_gsm_brackets_with_resamples(cut, stub_ffmpeg):
    cp = cut.compress(codec="gsm")
    # GSM is defined at 8 kHz: the chain is resample -> codec -> resample.
    assert len(cp.recording.transforms) == 3
    audio = cp.load_audio()
    assert audio.shape[0] == 1
    assert np.isfinite(audio).all()
