"""
Array-level augmentation differential tests vs the ACTUAL reference:
identical waveforms and options through both implementations'
ReverbWithImpulseResponse / Clipping / FastRandomRIRGenerator.

Reference: lhotse/augmentation/{rir,clipping,utils}.py (all torch/numpy —
runnable in-env; WPE and loudness need nara_wpe/pyloudnorm, absent here).
"""
import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    import lhotse.augmentation as RA
    from lhotse.augmentation.utils import FastRandomRIRGenerator as RefRIRGen

import lhotse_tpu.augmentation as MA
from lhotse_tpu.augmentation.utils import FastRandomRIRGenerator as MyRIRGen
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


@pytest.fixture()
def speech():
    rng = np.random.RandomState(7)
    return (rng.randn(1, SR) * 0.1).astype(np.float32)


@pytest.fixture()
def rir_dict(tmp_path):
    """A 2-channel RIR on disk, as the serialized Recording dict both
    implementations' transforms accept."""
    rir = np.zeros((2, 1200), np.float32)
    rir[0, 0], rir[0, 180], rir[0, 600] = 1.0, 0.5, -0.25
    rir[1, 40], rir[1, 300], rir[1, 900] = 0.9, -0.4, 0.15
    p = tmp_path / "rir.wav"
    write_wav(str(p), rir, SR)
    from lhotse_tpu import Recording

    return Recording.from_file(p).to_dict()


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(normalize_output=False),
        dict(early_only=True),
        dict(rir_channels=[1]),
        dict(rir_channels=[0, 1]),
    ],
    ids=["default", "no-norm", "early", "ch1", "both-ch"],
)
def test_reverb_with_impulse_response_matches(speech, rir_dict, kw):
    r = RA.ReverbWithImpulseResponse(rir=dict(rir_dict), **kw)(
        np.copy(speech), sampling_rate=SR
    )
    m = MA.ReverbWithImpulseResponse(rir=dict(rir_dict), **kw)(
        np.copy(speech), sampling_rate=SR
    )
    assert r.shape == m.shape
    assert float(np.abs(np.asarray(r) - np.asarray(m)).max()) < 1e-5, kw


@pytest.mark.parametrize("hard", [True, False])
def test_clipping_matches(speech, hard):
    kw = dict(hard=hard, gain_db=6.0, normalize=True)
    r = RA.Clipping(**kw)(np.copy(speech) * 5, sampling_rate=SR)
    m = MA.Clipping(**kw)(np.copy(speech) * 5, sampling_rate=SR)
    assert np.asarray(r).shape == np.asarray(m).shape
    assert float(np.abs(np.asarray(r) - np.asarray(m)).max()) < 1e-6


@pytest.mark.parametrize("seed", [0, 123])
def test_fast_random_rir_generator_runs_where_reference_cannot(seed):
    """The reference's FRA-RIR generator hard-requires torchaudio
    (augmentation/utils.py:112-117 check_for_torchaudio + highpass_biquad),
    absent in this env; ours is dependency-free and must produce sane,
    seed-reproducible filters."""
    with pytest.raises(Exception):
        RefRIRGen(sr=SR, room_seed=seed, source_seed=seed)(nsource=1)
    m1 = np.asarray(MyRIRGen(sr=SR, room_seed=seed, source_seed=seed)(nsource=2))
    m2 = np.asarray(MyRIRGen(sr=SR, room_seed=seed, source_seed=seed)(nsource=2))
    assert m1.shape[0] == 2 and np.isfinite(m1).all()
    np.testing.assert_array_equal(m1, m2)


def test_reverb_via_cut_manifest_chain(tmp_path, speech, rir_dict):
    """reverb_rir at the Cut level: manifest transform + load_audio parity."""
    from lhotse import Recording as RefRecording
    from lhotse_tpu import Recording as MyRecording

    p = tmp_path / "sp.wav"
    write_wav(str(p), speech, SR)
    from lhotse_tpu import Recording

    rir_rec_mine = Recording.from_dict(dict(rir_dict))
    from lhotse import Recording as RefRec

    rir_rec_ref = RefRec.from_dict(dict(rir_dict))

    rc = RefRecording.from_file(p).to_cut().reverb_rir(rir_rec_ref, rir_channels=[0])
    mc = MyRecording.from_file(p).to_cut().reverb_rir(rir_rec_mine, rir_channels=[0])
    a, b = rc.load_audio(), mc.load_audio()
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) < 1e-5
