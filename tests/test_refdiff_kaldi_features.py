"""
Differential DSP tests: our JAX/numpy kaldi feature layers vs the reference's
torch implementations (reference lhotse/features/kaldi/layers.py), on the
same random audio across the layer-config space — not just the default-config
goldens.

Tolerance: both sides compute in float32; log-domain outputs agree to the
float32 noise floor (~1e-4..1e-3 absolute depending on config), which is the
documented fidelity target (BASELINE.md).
"""
import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    import torch
    import lhotse.features.kaldi.layers as RL

import lhotse_tpu.features.kaldi.layers as ML

ATOL = 2e-3  # float32 log-domain noise floor across configs


def _audio(sr: int, seconds: float = 2.3, batch: int = 2) -> np.ndarray:
    rng = np.random.RandomState(hash((sr, int(seconds * 100))) % 2**31)
    n = int(sr * seconds)
    return (rng.randn(batch, n) * 0.1).astype(np.float32)


def _diff(ref_layer, my_layer, audio) -> float:
    r = ref_layer(torch.from_numpy(audio)).numpy()
    m = np.asarray(my_layer(audio))
    assert r.shape == m.shape, (r.shape, m.shape)
    return float(np.abs(r - m).max())


CONFIGS = [
    dict(),
    dict(sampling_rate=8000),
    dict(sampling_rate=44100),
    dict(frame_length=0.032, frame_shift=0.008),
    dict(window_type="hanning"),
    dict(window_type="hamming"),
    dict(window_type="rectangular"),
    dict(preemph_coeff=0.0),
    dict(remove_dc_offset=False),
    dict(snip_edges=True),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[str(sorted(c.items())) for c in CONFIGS])
def test_log_filterbank_matches_reference(cfg):
    kw = dict(dither=0.0, **cfg)
    sr = kw.get("sampling_rate", 16000)
    d = _diff(RL.Wav2LogFilterBank(**kw), ML.Wav2LogFilterBank(**kw), _audio(sr))
    assert d < ATOL, f"max abs diff {d} for {kw}"


FB_EXTRA = [
    dict(num_filters=40),
    dict(num_filters=23),
    dict(low_freq=40.0, high_freq=-200.0),
    dict(low_freq=20.0, high_freq=7600.0),
    dict(use_energy=True),
]


@pytest.mark.parametrize(
    "cfg", FB_EXTRA, ids=[str(sorted(c.items())) for c in FB_EXTRA]
)
def test_log_filterbank_mel_options(cfg):
    kw = dict(dither=0.0, **cfg)
    d = _diff(RL.Wav2LogFilterBank(**kw), ML.Wav2LogFilterBank(**kw), _audio(16000))
    assert d < ATOL, f"max abs diff {d} for {kw}"


MFCC_CONFIGS = [
    dict(),
    dict(num_ceps=20, num_filters=30),
    dict(sampling_rate=8000),
]


@pytest.mark.parametrize(
    "cfg", MFCC_CONFIGS, ids=[str(sorted(c.items())) for c in MFCC_CONFIGS]
)
def test_mfcc_matches_reference(cfg):
    kw = dict(dither=0.0, **cfg)
    sr = kw.get("sampling_rate", 16000)
    d = _diff(RL.Wav2MFCC(**kw), ML.Wav2MFCC(**kw), _audio(sr))
    assert d < ATOL, f"max abs diff {d} for {kw}"


@pytest.mark.parametrize(
    "cfg, ref_error",
    [
        # reference layers.py:722 assigns log_e into mfcc[:, 0] (missing the
        # batch dim) — crashes for every batched input with use_energy=True
        (dict(use_energy=True), RuntimeError),
        # reference layers.py:665 wraps the int 0 in nn.Parameter when
        # cepstral_lifter=0 — crashes at construction
        (dict(cepstral_lifter=0), AttributeError),
    ],
    ids=["use_energy", "lifter0"],
)
def test_mfcc_configs_where_reference_crashes(cfg, ref_error):
    """Configs the reference cannot run at all; ours must produce sane output."""
    kw = dict(dither=0.0, **cfg)
    audio = _audio(16000)
    with pytest.raises(ref_error):
        RL.Wav2MFCC(**kw)(torch.from_numpy(audio))
    out = np.asarray(ML.Wav2MFCC(**kw)(audio))
    assert out.shape[:2] == (2, 230) and np.isfinite(out).all()


@pytest.mark.parametrize("cls", ["Wav2Spec", "Wav2LogSpec"])
def test_spectrogram_matches_reference(cls):
    kw = dict(dither=0.0)
    rl = getattr(RL, cls)(**kw)
    ml = getattr(ML, cls)(**kw)
    audio = _audio(16000)
    r = rl(torch.from_numpy(audio)).numpy()
    m = np.asarray(ml(audio))
    assert r.shape == m.shape
    # linear-power spectra span huge dynamic range: compare relatively
    denom = np.maximum(np.abs(r), 1e-3)
    reldiff = float((np.abs(r - m) / denom).max())
    assert reldiff < 5e-3 if cls == "Wav2Spec" else np.abs(r - m).max() < ATOL


def test_streaming_online_inference_matches_reference_offline():
    """Our streaming path vs the reference OFFLINE output on the same audio
    (the reference's own streaming contract, layers.py:199-224)."""
    audio = _audio(16000, seconds=1.7, batch=1)
    offline = RL.Wav2LogFilterBank(dither=0.0)(torch.from_numpy(audio)).numpy()

    layer = ML.Wav2LogFilterBank(dither=0.0)
    chunks = np.array_split(audio, 5, axis=1)
    feats, context = [], None
    for chunk in chunks:
        out, context = layer.online_inference(chunk, context=context)
        feats.append(np.asarray(out))
    streamed = np.concatenate(feats, axis=1)
    # Streaming framing lacks the final-edge reflection: compare the frames
    # produced against the reference's offline prefix.
    n = streamed.shape[1]
    assert n >= offline.shape[1] - 2
    assert float(np.abs(streamed - offline[:, :n]).max()) < ATOL
