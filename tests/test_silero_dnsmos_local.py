"""
Silero-VAD and DNSMOS workflows driven with LOCAL tiny stand-ins (no hub or
GitHub downloads) — the same treatment the CTC aligner got in
tests/test_asr_aligner_offline.py. Everything except the published weights
runs for real: span conversion, the detector base plumbing, the CLI command,
DNSMOS's mel frontend + 9.01 s windowing + polyfit mapping + custom-field
attachment.

Reference surfaces:
/root/reference/lhotse/workflows/activity_detection/silero_vad.py:50-146,
/root/reference/lhotse/workflows/dnsmos.py:13-230.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from lhotse_tpu import CutSet, Recording, RecordingSet, SupervisionSet
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.workflows.activity_detection import SileroVAD, SileroVAD16k

SR = 16000
WIN = 512


class TinySileroNet(torch.nn.Module):
    """Deterministic stand-in with silero's calling convention: a window's
    speech probability is a sharp sigmoid of its RMS."""

    def forward(self, x, sr):  # noqa: D102 - silero signature
        rms = torch.sqrt(torch.mean(x**2, dim=-1) + 1e-12)
        return torch.sigmoid(200.0 * (rms - 0.02))


def tiny_get_speech_timestamps(wav, model, sampling_rate=SR, return_seconds=False):
    """Minimal local reimplementation of silero's span extraction: threshold
    per-window probabilities at 0.5, merge consecutive speech windows."""
    assert not return_seconds
    spans = []
    active_start = None
    n = wav.shape[-1]
    for start in range(0, n - WIN + 1, WIN):
        prob = float(model(wav[start : start + WIN][None, :], sampling_rate))
        if prob >= 0.5 and active_start is None:
            active_start = start
        elif prob < 0.5 and active_start is not None:
            spans.append({"start": active_start, "end": start})
            active_start = None
    if active_start is not None:
        spans.append({"start": active_start, "end": n})
    return spans


@pytest.fixture
def local_silero(monkeypatch):
    monkeypatch.setattr(
        SileroVAD,
        "_get_model",
        classmethod(
            lambda cls, device="cpu", force_download=False: (
                TinySileroNet().to(device),
                tiny_get_speech_timestamps,
            )
        ),
    )


def speech_with_gaps(rng) -> np.ndarray:
    """4 s: speech on [0.5, 1.5) and [2.5, 3.5), silence elsewhere."""
    audio = np.zeros(4 * SR, np.float32)
    for s in (0.5, 2.5):
        seg = slice(int(s * SR), int((s + 1.0) * SR))
        t = np.arange(SR) / SR
        audio[seg] = (np.sin(2 * np.pi * 180 * t) * 0.3).astype(np.float32)
    audio += (rng.randn(len(audio)) * 1e-4).astype(np.float32)
    return audio


class TestSileroLocalModel:
    def test_detector_finds_speech_spans(self, local_silero, tmp_path):
        rng = np.random.RandomState(0)
        audio = speech_with_gaps(rng)
        write_wav(str(tmp_path / "a.wav"), audio, SR)
        rec = Recording.from_file(tmp_path / "a.wav")

        vad = SileroVAD16k()
        sups = vad(rec)
        assert len(sups) == 2
        for sup, expect_start in zip(sups, (0.5, 2.5)):
            assert sup.recording_id == rec.id and sup.channel == 0
            assert sup.id.startswith(f"{rec.id}-silero_vad_16k-0-")
            assert abs(sup.start - expect_start) < 0.1
            assert abs(sup.duration - 1.0) < 0.15

    def test_rejects_unsupported_rate(self, local_silero):
        with pytest.raises(ValueError, match="8000 or 16000"):
            SileroVAD(sampling_rate=44100)

    def test_cli_detect_activity_silero(self, local_silero, tmp_path):
        from click.testing import CliRunner

        from lhotse_tpu.bin.modes.workflows import workflows

        rng = np.random.RandomState(1)
        write_wav(str(tmp_path / "a.wav"), speech_with_gaps(rng), SR)
        recs = RecordingSet.from_recordings([Recording.from_file(tmp_path / "a.wav")])
        recs_path = tmp_path / "recs.jsonl.gz"
        recs.to_file(recs_path)

        res = CliRunner().invoke(
            workflows,
            [
                "activity-detection",
                "-r", str(recs_path),
                "-o", str(tmp_path),
                "-m", "silero_vad_16k",
                "-j", "1",
            ],
        )
        assert res.exit_code == 0, res.output
        sups = SupervisionSet.from_file(
            tmp_path / "recs_supervisions_silero_vad_16k.jsonl.gz"
        )
        assert len(sups) == 2


# ---------------------------------------------------------------------------
# DNSMOS with fake ONNX sessions (onnxruntime absent in-env).
# ---------------------------------------------------------------------------
from lhotse_tpu.workflows import dnsmos as dnsmos_mod
from lhotse_tpu.workflows.dnsmos import INPUT_LENGTH, ComputeScore, annotate_dnsmos


class FakePrimarySess:
    """sig/bak/ovr raw MOS derived deterministically from the input RMS."""

    def run(self, _, feeds):
        (audio,) = feeds.values()
        rms = float(np.sqrt(np.mean(audio**2)))
        base = 2.0 + 10.0 * rms
        return [np.array([[base, base + 0.5, base + 0.25]], np.float32)]


class FakeP808Sess:
    def run(self, _, feeds):
        (mel,) = feeds.values()
        return [np.array([[3.0 + float(np.mean(mel))]], np.float32)]


def fake_scorer() -> ComputeScore:
    scorer = object.__new__(ComputeScore)
    scorer.onnx_sess = FakePrimarySess()
    scorer.p808_onnx_sess = FakeP808Sess()
    return scorer


class TestDnsmosLocalModel:
    def test_melspec_frontend_geometry(self):
        rng = np.random.RandomState(0)
        audio = rng.randn(int(INPUT_LENGTH * SR) - 160).astype(np.float32) * 0.1
        mel = fake_scorer().audio_melspec(audio)
        assert mel.shape == (1 + len(audio) // 160, 120)
        assert np.isfinite(mel).all()
        # to_db output is the (log10 + 40) / 40 compression of the linear mel.
        lin = fake_scorer().audio_melspec(audio, to_db=False)
        np.testing.assert_allclose(
            mel, (np.log10(np.maximum(lin, 1e-10)) + 40.0) / 40.0, rtol=1e-6
        )

    def test_polyfit_mapping_matches_published_coefficients(self):
        s, b, o = fake_scorer().get_polyfit_val(3.0, 3.0, 3.0, False)
        assert s == pytest.approx(np.poly1d([-0.08397278, 1.22083953, 0.0052439])(3.0))
        assert b == pytest.approx(np.poly1d([-0.13166888, 1.60915514, -0.39604546])(3.0))
        assert o == pytest.approx(np.poly1d([-0.06766283, 1.11546468, 0.04602535])(3.0))

    def test_windowing_and_aggregation(self):
        rng = np.random.RandomState(1)
        audio = (rng.randn(12 * SR) * 0.1).astype(np.float32)
        scores = fake_scorer()(audio, personalized=False)
        assert set(scores) == {"OVRL", "SIG", "BAK", "P808_MOS"}
        assert all(np.isfinite(v) for v in scores.values())
        # 12 s input => floor(12 - 9.01) + 1 = 3 sliding windows, and the
        # deterministic fake gives identical per-window scores.
        one = fake_scorer()(audio[: int(INPUT_LENGTH * SR) + SR], personalized=False)
        assert scores["SIG"] == pytest.approx(one["SIG"], rel=0.2)

    def test_short_audio_is_tiled_to_window_length(self):
        rng = np.random.RandomState(2)
        audio = (rng.randn(2 * SR) * 0.1).astype(np.float32)  # < 9.01 s
        scores = fake_scorer()(audio, personalized=False)
        assert np.isfinite(scores["OVRL"])

    def test_annotate_dnsmos_attaches_custom_field(self, tmp_path, monkeypatch):
        monkeypatch.setattr(dnsmos_mod, "is_module_available", lambda name: True)
        monkeypatch.setattr(
            dnsmos_mod, "download_model", lambda personalized, root=None: ("p", "q")
        )
        monkeypatch.setattr(
            dnsmos_mod, "ComputeScore", lambda primary, p808: fake_scorer()
        )
        rng = np.random.RandomState(3)
        write_wav(
            str(tmp_path / "a.wav"), (rng.randn(10 * SR) * 0.1).astype(np.float32), SR
        )
        cuts = CutSet.from_cuts([Recording.from_file(tmp_path / "a.wav").to_cut()])
        out = list(annotate_dnsmos(cuts))
        assert len(out) == 1
        assert set(out[0].dnsmos) == {"OVRL", "SIG", "BAK", "P808_MOS"}

    def test_annotate_dnsmos_accepts_recording_set(self, tmp_path, monkeypatch):
        monkeypatch.setattr(dnsmos_mod, "is_module_available", lambda name: True)
        monkeypatch.setattr(
            dnsmos_mod, "download_model", lambda personalized, root=None: ("p", "q")
        )
        monkeypatch.setattr(
            dnsmos_mod, "ComputeScore", lambda primary, p808: fake_scorer()
        )
        rng = np.random.RandomState(4)
        write_wav(
            str(tmp_path / "b.wav"), (rng.randn(10 * SR) * 0.1).astype(np.float32), SR
        )
        recs = RecordingSet.from_recordings([Recording.from_file(tmp_path / "b.wav")])
        out = list(annotate_dnsmos(recs))
        assert len(out) == 1 and "SIG" in out[0].dnsmos
