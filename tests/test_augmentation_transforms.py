"""
Recording-level lazy transform chain: speed/tempo/volume perturbation, RIR
reverb, loudness normalization, narrowbanding, amplitude clipping, WPE
dereverberation, and their serialization + duration bookkeeping
(reference surface: lhotse/audio/recording.py:701-1015 and
lhotse/augmentation/; reference tests: test/augmentation/).
"""
import numpy as np
import pytest

from lhotse_tpu import Recording
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


@pytest.fixture
def rec(tmp_path):
    rng = np.random.default_rng(0)
    t = np.arange(SR * 2) / SR
    sig = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.normal(size=t.size)).astype(
        np.float32
    )
    path = tmp_path / "r.wav"
    write_wav(path, sig, SR)
    return Recording.from_file(path)


def _roundtrip(r: Recording) -> Recording:
    return Recording.from_dict(r.to_dict())


def test_perturb_speed_changes_duration_and_id(rec):
    fast = rec.perturb_speed(1.1)
    assert fast.id.endswith("_sp1.1")
    assert np.isclose(fast.duration, rec.duration / 1.1, atol=1e-3)
    audio = fast.load_audio()
    assert audio.shape[1] == fast.num_samples
    # Serialized transform chain reproduces identical samples.
    np.testing.assert_array_equal(_roundtrip(fast).load_audio(), audio)


def test_perturb_tempo_preserves_pitch_duration_math(rec):
    slow = rec.perturb_tempo(0.9)
    assert np.isclose(slow.duration, rec.duration / 0.9, atol=1e-3)
    assert slow.load_audio().shape[1] == slow.num_samples


def test_perturb_volume_scales_samples(rec):
    quiet = rec.perturb_volume(0.5)
    np.testing.assert_allclose(
        quiet.load_audio(), rec.load_audio() * 0.5, atol=1e-6)
    assert quiet.duration == rec.duration


def test_resample_changes_rate_not_duration(rec):
    r8k = rec.resample(8000)
    assert r8k.sampling_rate == 8000
    assert np.isclose(r8k.duration, rec.duration, atol=1e-3)
    assert r8k.load_audio().shape[1] == r8k.num_samples


def test_reverb_rir_keeps_shape_adds_energy_tail(rec):
    # Seeded synthetic (FRA) RIR: deterministic, so serialization replays it.
    rev = rec.reverb_rir(room_rng_seed=11, source_rng_seed=13)
    out = rev.load_audio()
    assert out.shape == rec.load_audio().shape
    assert rev.id.endswith("_rvb")
    assert not np.allclose(out, rec.load_audio())
    np.testing.assert_array_equal(_roundtrip(rev).load_audio(), out)


def test_reverb_rir_with_real_rir_recording(rec, tmp_path):
    rir_sig = np.zeros(SR // 4, dtype=np.float32)
    rir_sig[0] = 1.0
    rir_sig[SR // 100] = 0.5  # one 10ms echo
    write_wav(tmp_path / "rir.wav", rir_sig, SR)
    rir = Recording.from_file(tmp_path / "rir.wav")
    rev = rec.reverb_rir(rir_recording=rir, normalize_output=False)
    out = rev.load_audio()
    dry = rec.load_audio()
    # Kaldi int16 convention: RIR taps are scaled by 2^-15 and the output is
    # peak-aligned (here the peak is tap 0), so:
    #   wet = 2^-15 * (dry + 0.5 * delay(dry, 10ms))
    expected = dry.copy()
    expected[:, SR // 100 :] += 0.5 * dry[:, : -SR // 100]
    expected *= 0.5**15
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_normalize_loudness_hits_target_lufs(rec):
    target = -23.0
    norm = rec.normalize_loudness(target)
    out = norm.load_audio()
    from lhotse_tpu.augmentation.loudness import measure_loudness

    measured = measure_loudness(out, SR)
    assert abs(measured - target) < 1.0


def test_narrowband_suppresses_high_frequencies(rec):
    nb = rec.narrowband(codec="mulaw")
    out = nb.load_audio()
    assert out.shape[1] == rec.num_samples
    spec_orig = np.abs(np.fft.rfft(rec.load_audio()[0]))
    spec_nb = np.abs(np.fft.rfft(out[0]))
    hi = slice(int(len(spec_orig) * 0.6), None)
    assert spec_nb[hi].sum() < 0.5 * spec_orig[hi].sum()


def test_clip_amplitude_bounds_samples(rec):
    loud = rec.perturb_volume(10.0)
    assert np.abs(loud.load_audio()).max() > 1.0
    clipped = loud.clip_amplitude(hard=True, gain_db=6.0, oversampling=None)
    out = clipped.load_audio()
    # normalize=True rescales relative to the original peak; the clipping
    # shows as saturation — a plateau of samples pinned at the new maximum —
    # not as a [-1, 1] bound.
    dry = loud.load_audio()
    assert np.abs(out).max() <= np.abs(dry).max() + 1e-5
    n_sat_out = (np.abs(out) > 0.99 * np.abs(out).max()).sum()
    n_sat_dry = (np.abs(dry) > 0.99 * np.abs(dry).max()).sum()
    assert n_sat_out > 100 * max(n_sat_dry, 1)


def test_dereverb_wpe_runs_and_keeps_shape(rec):
    rev = rec.reverb_rir()
    der = rev.dereverb_wpe()
    out = der.load_audio()
    assert out.shape == (1, rec.num_samples)
    assert np.isfinite(out).all()


def test_chained_transforms_serialize_and_replay(rec):
    chain = rec.perturb_speed(1.1).perturb_volume(0.8).resample(8000)
    audio = chain.load_audio()
    assert audio.shape[1] == chain.num_samples
    replay = _roundtrip(chain)
    assert [t["name"] if isinstance(t, dict) else type(t).__name__
            for t in (replay.transforms or [])] == [
        t["name"] if isinstance(t, dict) else type(t).__name__
        for t in (chain.transforms or [])
    ]
    np.testing.assert_array_equal(replay.load_audio(), audio)


def test_offset_duration_reads_through_transform_chain(rec):
    fast = rec.perturb_speed(1.1)
    full = fast.load_audio()
    window = fast.load_audio(offset=0.5, duration=0.5)
    start = int(0.5 * SR)
    # Partial reads re-run the resampler on a padded sub-range: samples near
    # the window edges see a different filter context, so compare the
    # interior exactly and the edges loosely.
    np.testing.assert_allclose(
        window[:, 64:-64], full[:, start + 64 : start + int(0.5 * SR) - 64],
        atol=1e-6)
    np.testing.assert_allclose(
        window, full[:, start : start + int(0.5 * SR)], atol=5e-3)


# ---------------------------------------------------------------------------
# Clipping transform matrix (reference: test/augmentation/test_clipping.py)
# ---------------------------------------------------------------------------
class TestClipping:
    def _signal(self, amp=0.5):
        import numpy as np

        t = np.arange(8000) / 8000.0
        return (amp * np.sin(2 * np.pi * 40 * t)).astype(np.float32)[None, :]

    def test_hard_clipping_bounds(self):
        import numpy as np

        from lhotse_tpu.augmentation.clipping import Clipping

        x = self._signal(0.8)
        y = Clipping(hard=True, gain_db=12.0)(x, 8000)
        assert y.shape == x.shape
        # Peaks are flattened to the (rescaled) saturation ceiling.
        ceiling = 0.8 / 10 ** (12.0 / 20.0)
        assert np.abs(y).max() == pytest.approx(ceiling, rel=1e-4)
        assert np.isfinite(y).all()

    def test_soft_clipping_is_tanh_shaped(self):
        import numpy as np

        from lhotse_tpu.augmentation.clipping import Clipping

        x = self._signal(0.8)
        y = Clipping(hard=False, gain_db=6.0)(x, 8000)
        # Soft saturation compresses peaks but never flattens exactly.
        assert np.abs(y).max() < np.abs(x).max()
        assert len(np.unique(np.round(np.abs(y).max(axis=-1), 6))) >= 1

    def test_silence_passthrough(self):
        import numpy as np

        from lhotse_tpu.augmentation.clipping import Clipping

        x = np.zeros((1, 1000), np.float32)
        y = Clipping(hard=True, gain_db=20.0)(x, 8000)
        np.testing.assert_array_equal(y, x)
        tiny = np.full((1, 1000), 1e-6, np.float32)  # below -96 dBFS
        np.testing.assert_array_equal(Clipping()(tiny, 8000), tiny)

    def test_negative_gain_is_mild(self):
        import numpy as np

        from lhotse_tpu.augmentation.clipping import Clipping

        x = self._signal(0.9)
        y = Clipping(hard=True, gain_db=-6.0)(x, 8000)
        # Attenuate-then-clip-then-restore: hardly any distortion.
        np.testing.assert_allclose(y, x, atol=1e-3)

    def test_reverse_timestamps_identity(self):
        from lhotse_tpu.augmentation.clipping import Clipping

        assert Clipping().reverse_timestamps(1.25, 2.0, 8000) == (1.25, 2.0)

    def test_serialization_roundtrip(self):
        import numpy as np

        from lhotse_tpu.augmentation.clipping import Clipping
        from lhotse_tpu.augmentation.transform import AudioTransform

        t = Clipping(hard=True, gain_db=3.0, normalize=False)
        d = t.to_dict()
        t2 = AudioTransform.from_dict(d)
        x = self._signal(0.7)
        np.testing.assert_array_equal(t(x, 8000), t2(x, 8000))
