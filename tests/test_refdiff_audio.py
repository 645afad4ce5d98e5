"""
Sample-level differential tests: the full audio loading/transform/mix path vs
the ACTUAL reference implementation.

The reference runs in-env through a functional ``soundfile`` stand-in backed
by this repo's native decoders (tests/_reference.py::_StubSoundFile) — decode
is shared, so any sample difference isolates the two implementations' OWN
logic: partial-read arithmetic, transform chains (volume/speed/resample with
reverse-timestamp mapping), SNR mixing gains, and Shar payload round-trips.

Resample caveat: without torchaudio the reference's ``Resample`` transform
falls back to ``scipy.signal.resample_poly`` (reference augmentation/
torchaudio.py:124-139), a different filter from its primary vendored
sinc-hann resampler that ``Speed`` always uses — so resample parity is
asserted against the primary path (``get_or_create_resampler``), which our
resampler matches to float32 precision.
"""
import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    import torch
    from lhotse import Recording as RefRecording
    from lhotse.audio.backend import (
        LibsndfileBackend,
        set_current_audio_backend as ref_set_backend,
    )
    from lhotse.augmentation.torchaudio import get_or_create_resampler

    ref_set_backend(LibsndfileBackend())

from lhotse_tpu import CutSet as MyCutSet, Recording as MyRecording
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


@pytest.fixture()
def wav_pair(tmp_path):
    """Two stereo wavs on disk + the float32 arrays they quantize to."""
    rng = np.random.RandomState(42)
    arrays = []
    paths = []
    for name, sec, amp in (("a", 2.0, 0.1), ("b", 1.3, 0.05)):
        x = (rng.randn(2, int(SR * sec)) * amp).astype(np.float32)
        p = tmp_path / f"{name}.wav"
        write_wav(str(p), x, SR)
        paths.append(p)
        arrays.append(x)
    return paths, arrays


def _pair(path):
    return RefRecording.from_file(path), MyRecording.from_file(path)


def test_partial_reads_match(wav_pair):
    (pa, _), _ = wav_pair
    r, m = _pair(pa)
    assert (r.num_samples, r.sampling_rate, r.num_channels) == (
        m.num_samples,
        m.sampling_rate,
        m.num_channels,
    )
    for offset, duration in [(0, None), (0.5, 0.25), (0.123, 0.4), (1.9, None), (0.0, 2.0)]:
        a = r.load_audio(offset=offset, duration=duration)
        b = m.load_audio(offset=offset, duration=duration)
        assert a.shape == b.shape, (offset, duration)
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("factor", [0.9, 1.1, 0.5])
def test_volume_and_speed_chain_matches(wav_pair, factor):
    (pa, _), _ = wav_pair
    r, m = _pair(pa)
    rv, mv = r.perturb_volume(factor), m.perturb_volume(factor)
    np.testing.assert_array_equal(rv.load_audio(), mv.load_audio())

    rs, ms = r.perturb_speed(factor), m.perturb_speed(factor)
    assert rs.num_samples == ms.num_samples
    a, b = rs.load_audio(), ms.load_audio()
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) < 1e-5

    # partial read through the reverse-timestamp mapping
    a = rs.load_audio(offset=0.25, duration=0.5)
    b = ms.load_audio(offset=0.25, duration=0.5)
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) < 1e-5


@pytest.mark.parametrize("sr2", [8000, 22050, 44100, 24000])
def test_resampler_matches_reference_primary(wav_pair, sr2):
    """Our resampled Recording output vs the reference's primary sinc
    resampler applied to the raw samples."""
    (pa, _), (xa, _) = wav_pair
    _, m = _pair(pa)
    got = m.resample(sr2).load_audio()
    resampler = get_or_create_resampler(SR, sr2)
    want = resampler(torch.from_numpy(m.load_audio())).numpy()
    assert got.shape == want.shape
    assert float(np.abs(got - want).max()) < 1e-5


@pytest.mark.parametrize("snr", [None, 0.0, 5.0, -10.0])
def test_mix_waveforms_match(wav_pair, snr):
    (pa, pb), _ = wav_pair
    ra, ma = _pair(pa)
    rb, mb = _pair(pb)
    rmix = ra.to_cut().mix(rb.to_cut(), offset_other_by=0.3, snr=snr)
    mmix = ma.to_cut().mix(mb.to_cut(), offset_other_by=0.3, snr=snr)
    a, b = rmix.load_audio(), mmix.load_audio()
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) < 1e-6, f"snr={snr}"


def test_padded_cut_audio_matches(wav_pair):
    (pa, _), _ = wav_pair
    r, m = _pair(pa)
    a = r.to_cut().pad(duration=3.0, direction="both").load_audio()
    b = m.to_cut().pad(duration=3.0, direction="both").load_audio()
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_shar_payload_read_back_by_reference(tmp_path, wav_pair):
    """Shar archives we write must decode to the same samples when read by
    the reference's Shar reader (tar layout + wav payload interchange)."""
    from lhotse import CutSet as RefCutSet

    (pa, pb), _ = wav_pair
    cuts = MyCutSet.from_cuts([MyRecording.from_file(p).to_cut() for p in (pa, pb)])
    out = tmp_path / "shar"
    out.mkdir()
    cuts.to_shar(out, fields={"recording": "wav"}, shard_size=10, verbose=False)

    ref_cuts = {c.id: c for c in RefCutSet.from_shar(in_dir=out)}
    assert set(ref_cuts) == {c.id for c in cuts}
    for c in cuts:
        np.testing.assert_array_equal(ref_cuts[c.id].load_audio(), c.load_audio())


def test_on_the_fly_fbank_end_to_end_matches(wav_pair):
    """Manifest -> load -> extract through BOTH stacks end-to-end."""
    from lhotse import Fbank as RefFbank
    from lhotse_tpu import Fbank as MyFbank

    (pa, _), _ = wav_pair
    r, m = _pair(pa)
    rcut = r.to_cut().truncate(offset=0.2, duration=1.5).perturb_volume(2.0)
    mcut = m.to_cut().truncate(offset=0.2, duration=1.5).perturb_volume(2.0)
    a = RefFbank().extract(rcut.load_audio()[0], SR)
    b = MyFbank().extract(mcut.load_audio()[0], SR)
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) < 2e-3


def test_tempo_perturbation_runs_where_reference_cannot(wav_pair):
    """The reference's Tempo transform hard-requires torchaudio sox effects
    (augmentation/torchaudio.py:185-193), absent in this env; our native
    WSOLA time-stretch must produce the documented manifest arithmetic and
    finite audio."""
    (pa, _), _ = wav_pair
    r, m = _pair(pa)
    with pytest.raises(Exception):
        r.perturb_tempo(1.1).load_audio()
    mt = m.perturb_tempo(1.1)
    a = mt.load_audio()
    assert a.shape[1] == mt.num_samples
    assert np.isfinite(a).all()
    # tempo changes duration but not pitch-period content length bookkeeping
    assert abs(mt.duration - r.duration / 1.1) < 0.01
