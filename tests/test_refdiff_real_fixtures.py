"""
Differentials on the reference's REAL media fixtures (not synthesized
audio): the same files under /root/reference/test/fixtures/ run through both
implementations end-to-end. Decode is shared (the reference imports a
soundfile stand-in backed by this repo's native decoders), so differences
isolate manifest/windowing/transform/feature logic — and real speech hits
value ranges, DC offsets, and durations synthetic tones do not.

Fixtures exercised: mono_c0/mono_c1/stereo.wav, stereo.sph (SPHERE
container), libri/libri-1088-134315-0000.wav (real 16 kHz speech),
ami/ES2011a.Headset-0-40s-46s.wav, ljspeech storage WAVs (22.05 kHz).
"""
from pathlib import Path

import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
FIXTURES = Path("/root/reference/test/fixtures")
pytestmark = pytest.mark.skipif(
    ref is None or not FIXTURES.is_dir(), reason="/root/reference not mounted"
)

if ref is not None:
    from lhotse import CutSet as RefCutSet, Fbank as RefFbank, Recording as RefRecording
    from lhotse.audio.backend import (
        LibsndfileBackend,
        set_current_audio_backend as ref_set_backend,
    )

    ref_set_backend(LibsndfileBackend())

from lhotse_tpu import CutSet as MyCutSet, Fbank as MyFbank, Recording as MyRecording

WAV_FIXTURES = [
    "mono_c0.wav",
    "mono_c1.wav",
    "stereo.wav",
    "libri/libri-1088-134315-0000.wav",
    "ami/ES2011a.Headset-0-40s-46s.wav",
    "ljspeech/storage/LJ002-0020.wav",
]


@pytest.mark.parametrize("rel", WAV_FIXTURES)
def test_real_fixture_manifest_and_samples_match(rel):
    path = FIXTURES / rel
    theirs = RefRecording.from_file(path)
    mine = MyRecording.from_file(path)
    assert mine.sampling_rate == theirs.sampling_rate
    assert mine.num_samples == theirs.num_samples
    assert mine.duration == pytest.approx(theirs.duration, abs=1e-9)
    assert mine.channel_ids == theirs.channel_ids
    np.testing.assert_array_equal(mine.load_audio(), theirs.load_audio())


@pytest.mark.parametrize("rel", ["stereo.wav", "libri/libri-1088-134315-0000.wav"])
def test_real_fixture_windowed_reads_match(rel):
    path = FIXTURES / rel
    theirs = RefRecording.from_file(path)
    mine = MyRecording.from_file(path)
    for offset, duration in [(0.0, 0.5), (0.25, 1.0), (1.0, None)]:
        if duration is not None and offset + duration > mine.duration:
            continue
        np.testing.assert_array_equal(
            mine.load_audio(offset=offset, duration=duration),
            theirs.load_audio(offset=offset, duration=duration),
            err_msg=f"{rel} offset={offset} duration={duration}",
        )


def test_real_sphere_fixture_matches():
    """stereo.sph: the SPHERE container decodes through both stacks with
    identical channel layout and samples."""
    path = FIXTURES / "stereo.sph"
    theirs = RefRecording.from_file(path)
    mine = MyRecording.from_file(path)
    assert mine.num_channels == theirs.num_channels == 2
    assert mine.num_samples == theirs.num_samples
    np.testing.assert_array_equal(mine.load_audio(), theirs.load_audio())
    np.testing.assert_array_equal(
        mine.load_audio(channels=1), theirs.load_audio(channels=1)
    )


def test_real_speech_fbank_matches_reference():
    """80-dim fbank on REAL 16 kHz speech (the fixture the reference's own
    golden tests use) — parity at the float32 noise floor in log domain."""
    path = FIXTURES / "libri" / "libri-1088-134315-0000.wav"
    theirs_audio = RefRecording.from_file(path).load_audio()[0]
    import torch

    ref_feats = RefFbank().extract(torch.from_numpy(theirs_audio), 16000).numpy()
    my_feats = MyFbank().extract(
        MyRecording.from_file(path).load_audio()[0], 16000
    )
    assert my_feats.shape == ref_feats.shape
    np.testing.assert_allclose(my_feats, ref_feats, atol=5e-4)


def test_real_fixture_cut_chain_matches():
    """truncate -> volume perturb -> speed perturb on real AMI speech: the
    lazy transform chains of both implementations produce the same samples.
    (Plain ``.resample()`` is excluded: without torchaudio the reference's
    Resample transform falls back to scipy's resample_poly — a different
    filter from its primary sinc resampler; that parity is pinned against
    the primary path in test_refdiff_audio.py. ``Speed`` always uses the
    primary resampler, so it belongs in this chain.)"""
    path = FIXTURES / "ami" / "ES2011a.Headset-0-40s-46s.wav"
    theirs = (
        RefRecording.from_file(path)
        .to_cut()
        .truncate(offset=1.0, duration=4.0)
        .perturb_volume(1.25)
        .perturb_speed(1.1)
    )
    mine = (
        MyRecording.from_file(path)
        .to_cut()
        .truncate(offset=1.0, duration=4.0)
        .perturb_volume(1.25)
        .perturb_speed(1.1)
    )
    assert mine.num_samples == theirs.num_samples
    np.testing.assert_allclose(
        mine.load_audio(), theirs.load_audio(), atol=1e-6
    )


def test_real_fixture_cutset_describe_and_windows():
    """CutSet built on the real LJSpeech storage WAVs: window slicing and
    duration accounting agree cut-for-cut."""
    paths = sorted((FIXTURES / "ljspeech" / "storage").glob("*.wav"))
    assert paths
    theirs = RefCutSet.from_cuts(
        RefRecording.from_file(p).to_cut() for p in paths
    ).cut_into_windows(duration=1.0)
    mine = MyCutSet.from_cuts(
        MyRecording.from_file(p).to_cut() for p in paths
    ).cut_into_windows(duration=1.0)
    t_list, m_list = list(theirs), list(mine)
    assert len(t_list) == len(m_list)
    for t, m in zip(t_list, m_list):
        assert m.start == pytest.approx(t.start)
        assert m.duration == pytest.approx(t.duration)
        np.testing.assert_array_equal(m.load_audio(), t.load_audio())


# ---------------------------------------------------------------------------
# Lossy-codec fixtures (mp3/opus): the reference decodes through its
# LibsndfileBackend (stub backed by the same system codec libraries), so the
# differential isolates Recording/manifest/offset semantics around the codec.
# ---------------------------------------------------------------------------

def _syscodec(name) -> bool:
    from lhotse_tpu.audio import syscodecs

    return getattr(syscodecs, name)()


@pytest.mark.parametrize(
    "rel", ["stereo.mp3", "common_voice_en_651325.mp3"]
)
def test_real_mp3_fixture_manifest_and_samples_match(rel):
    if not _syscodec("mp3_available"):
        pytest.skip("libmpg123 not present")
    path = FIXTURES / rel
    theirs = RefRecording.from_file(path)
    mine = MyRecording.from_file(path)
    assert mine.sampling_rate == theirs.sampling_rate
    assert mine.num_channels == theirs.num_channels
    # mpg123's scan-based length vs decode length may differ by codec
    # priming frames in the stub path; durations agree within 30 ms.
    assert mine.duration == pytest.approx(theirs.duration, abs=0.03)
    n = min(mine.num_samples, theirs.num_samples)
    np.testing.assert_allclose(
        mine.load_audio()[:, :n], theirs.load_audio()[:, :n], atol=1e-4
    )


@pytest.mark.parametrize("rel", ["stereo.opus", "mono_c0.opus"])
def test_real_opus_fixture_windowed_read_matches(rel):
    if not _syscodec("opus_available"):
        pytest.skip("libopus not present")
    path = FIXTURES / rel
    theirs = RefRecording.from_file(path)
    mine = MyRecording.from_file(path)
    assert mine.sampling_rate == theirs.sampling_rate == 48000
    assert mine.num_channels == theirs.num_channels
    assert mine.duration == pytest.approx(theirs.duration, abs=0.03)
    t = theirs.load_audio(offset=0.1, duration=0.25)
    m = mine.load_audio(offset=0.1, duration=0.25)
    assert m.shape == t.shape
    np.testing.assert_allclose(m, t, atol=1e-4)


def test_real_mp3_fixture_fbank_parity(monkeypatch):
    """Real MP3 speech through decode -> resample -> fbank in both stacks.

    Without torchaudio installed, the reference's Resample transform falls
    back to scipy.signal.resample_poly (Kaiser window — ~8e-4 sample-domain
    deviation from its own sinc resampler; reference
    augmentation/torchaudio.py:124-138) even though the pure-torch sinc
    module (augmentation/resample.py:40) needs no torchaudio. Force the
    sinc path so the differential compares the PRIMARY behaviors."""
    if not _syscodec("mp3_available"):
        pytest.skip("libmpg123 not present")
    import lhotse.augmentation.torchaudio as ref_ta

    monkeypatch.setattr(ref_ta, "is_torchaudio_available", lambda: True)
    path = FIXTURES / "common_voice_en_651325.mp3"
    theirs = RefRecording.from_file(path).to_cut().resample(16000)
    mine = MyRecording.from_file(path).to_cut().resample(16000)
    tf = theirs.compute_features(RefFbank())
    mf = mine.compute_features(MyFbank())
    assert mf.shape == tuple(tf.shape)
    np.testing.assert_allclose(mf, np.asarray(tf), atol=2.5e-3)


# ---------------------------------------------------------------------------
# Real LOSSY fixtures (mp3/opus) through the in-process syscodecs bindings.
# The reference stack in this env shares our decoders (its soundfile stand-in
# is backed by them), so sample equality below proves the manifest/windowing
# plumbing of BOTH stacks; the hard-coded metadata/RMS pins are INDEPENDENT
# ground truth (captured from the real files) so codec regressions cannot
# hide behind the shared decode. Reference behavior under test:
# /root/reference/test/audio/test_audio_reads.py:25-42 (info/read
# consistency on these exact files).
# ---------------------------------------------------------------------------

LOSSY_EXPECT = {
    # rel path: (sampling_rate, num_channels, duration, rms_lo, rms_hi)
    "stereo.mp3": (8000, 2, 1.0, 0.30, 0.60),
    "common_voice_en_651325.mp3": (48000, 1, 2.376, 0.005, 0.05),
    "stereo.opus": (48000, 2, 1.0054166666666666, 0.03, 0.12),
    "mono_c0.opus": (48000, 1, 0.5054166666666666, 0.005, 0.03),
}


@pytest.mark.parametrize("rel", sorted(LOSSY_EXPECT))
def test_lossy_fixture_info_read_consistency_and_sanity(rel):
    sr, ch, dur, rms_lo, rms_hi = LOSSY_EXPECT[rel]
    mine = MyRecording.from_file(FIXTURES / rel)
    assert mine.sampling_rate == sr
    assert mine.num_channels == ch
    assert mine.duration == pytest.approx(dur, abs=1e-6)
    audio = mine.load_audio()
    # The reference's own consistency contract: info() frames == decoded.
    assert audio.shape == (ch, mine.num_samples)
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0 + 1e-4
    rms = float(np.sqrt((audio**2).mean()))
    assert rms_lo < rms < rms_hi, f"{rel}: rms {rms} outside sanity band"


@pytest.mark.parametrize("rel", sorted(LOSSY_EXPECT))
def test_lossy_fixture_manifest_matches_reference(rel):
    theirs = RefRecording.from_file(FIXTURES / rel)
    mine = MyRecording.from_file(FIXTURES / rel)
    assert mine.sampling_rate == theirs.sampling_rate
    assert mine.num_samples == theirs.num_samples
    assert mine.duration == pytest.approx(theirs.duration, abs=1e-9)
    assert mine.channel_ids == theirs.channel_ids
    np.testing.assert_array_equal(mine.load_audio(), theirs.load_audio())


@pytest.mark.parametrize("rel", ["common_voice_en_651325.mp3", "stereo.opus"])
def test_lossy_fixture_windowed_reads_match_full_decode(rel):
    """Partial reads slice identically to the full decode (lossy decoders
    must not re-anchor frame state differently per offset)."""
    mine = MyRecording.from_file(FIXTURES / rel)
    full = mine.load_audio()
    sr = mine.sampling_rate
    for offset, duration in [(0.0, 0.25), (0.1, 0.3), (0.5, None)]:
        if offset >= mine.duration:
            continue
        part = mine.load_audio(offset=offset, duration=duration)
        start = int(round(offset * sr))
        stop = start + part.shape[1]
        np.testing.assert_allclose(
            part, full[:, start:stop], atol=1e-6,
            err_msg=f"{rel} offset={offset} duration={duration}",
        )


def test_lossy_fixture_cut_fbank_runs():
    """Real-speech mp3 through cut algebra + fbank, both stacks agree.
    The SAME 16 kHz samples (our resampler) feed both extractors so the
    comparison isolates the feature math — the two stacks' resamplers
    legitimately differ by more than the fbank parity budget (the reference
    itself tolerates 1e-3 sample error between its own opus decoders,
    test_audio_reads.py:70-83)."""
    rel = "common_voice_en_651325.mp3"
    mine = MyRecording.from_file(FIXTURES / rel).to_cut().truncate(duration=2.0)
    theirs = RefRecording.from_file(FIXTURES / rel).to_cut().truncate(duration=2.0)
    assert mine.duration == pytest.approx(theirs.duration, abs=1e-9)
    wave16 = mine.resample(16000).load_audio()[0]
    # the reference path also runs end-to-end on its own resampled audio
    theirs_wave16 = theirs.resample(16000).load_audio()[0]
    assert theirs_wave16.shape == wave16.shape
    f_mine = MyFbank().extract(wave16, 16000)
    f_theirs = RefFbank().extract(wave16, 16000)
    assert f_mine.shape == tuple(f_theirs.shape)
    np.testing.assert_allclose(f_mine, np.asarray(f_theirs), atol=2e-4)
