"""
DNSMOS scoring logic with the ONNX sessions faked (no onnxruntime/network
in this env): melspec front-end geometry, P.835 polynomial mapping, hop
windowing over long/short audio, and score aggregation.
"""
import numpy as np
import pytest

from lhotse_tpu.workflows.dnsmos import INPUT_LENGTH, SAMPLING_RATE, ComputeScore


class _FakeSession:
    """Stands in for an ort.InferenceSession; records inputs."""

    def __init__(self, out):
        self.out = out
        self.calls = []

    def run(self, _none, feed):
        (name, arr), = feed.items()
        self.calls.append((name, np.asarray(arr).shape))
        return [np.asarray(self.out)[None]]


def _scorer(mos=(3.0, 3.5, 2.8), p808=3.2):
    cs = ComputeScore.__new__(ComputeScore)  # skip onnxruntime __init__
    cs.onnx_sess = _FakeSession(list(mos))
    cs.p808_onnx_sess = _FakeSession([p808])
    return cs


class TestMelspecFrontend:
    def test_shape_and_range(self):
        cs = _scorer()
        audio = 0.1 * np.random.RandomState(0).randn(SAMPLING_RATE).astype(np.float32)
        mel = cs._audio_melspec(audio)
        assert mel.shape == (1 + len(audio) // 160, 120)
        assert np.isfinite(mel).all()
        # Normalized as (log10(mel)+40)/40: silence floor maps to (−10+40)/40.
        silence = cs._audio_melspec(np.zeros(SAMPLING_RATE, np.float32))
        np.testing.assert_allclose(silence, 0.75, atol=1e-6)


class TestPolyfit:
    def test_default_polynomials(self):
        cs = _scorer()
        s, b, o = cs._polyfit(3.0, 3.0, 3.0, personalized=False)
        assert abs(s - np.poly1d([-0.08397278, 1.22083953, 0.0052439])(3.0)) < 1e-9
        assert abs(b - np.poly1d([-0.13166888, 1.60915514, -0.39604546])(3.0)) < 1e-9
        assert abs(o - np.poly1d([-0.06766283, 1.11546468, 0.04602535])(3.0)) < 1e-9

    def test_personalized_differs(self):
        cs = _scorer()
        a = cs._polyfit(3.0, 3.0, 3.0, personalized=False)
        b = cs._polyfit(3.0, 3.0, 3.0, personalized=True)
        assert not np.allclose(a, b)


class TestScoring:
    def test_short_audio_is_tiled_to_window(self):
        cs = _scorer()
        audio = 0.1 * np.random.RandomState(1).randn(SAMPLING_RATE).astype(np.float32)
        scores = cs(audio, personalized=False)
        assert set(scores) == {"OVRL", "SIG", "BAK", "P808_MOS"}
        assert all(np.isfinite(v) for v in scores.values())
        # Primary model saw exactly the 9.01 s window.
        name, shape = cs.onnx_sess.calls[0]
        assert name == "input_1"
        assert shape == (1, int(INPUT_LENGTH * SAMPLING_RATE))

    def test_long_audio_multiple_hops(self):
        cs = _scorer()
        audio = 0.1 * np.random.RandomState(2).randn(12 * SAMPLING_RATE).astype(np.float32)
        scores = cs(audio, personalized=False)
        n_hops = int(np.floor(len(audio) / SAMPLING_RATE) - INPUT_LENGTH) + 1
        assert len(cs.onnx_sess.calls) == n_hops
        assert len(cs.p808_onnx_sess.calls) == n_hops
        assert np.isfinite(scores["P808_MOS"])

    def test_p808_score_is_raw_mean(self):
        cs = _scorer(p808=4.25)
        audio = 0.05 * np.random.RandomState(3).randn(10 * SAMPLING_RATE).astype(np.float32)
        scores = cs(audio, personalized=False)
        assert abs(scores["P808_MOS"] - 4.25) < 1e-9
