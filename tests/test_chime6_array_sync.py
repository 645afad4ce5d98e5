"""
CHiME-6 array synchronization: frame-drop surgery, clock-drift warping
(native fallback path — no sox in this env), timestamp adjustment, and MD5
verification, on a synthesized raw-corpus fixture.
Behavioral model: reference lhotse/recipes/chime6.py:418-776.
"""
import hashlib
import json

import numpy as np
import pytest

from lhotse_tpu.audio.wavio import read_wav, write_wav
from lhotse_tpu.recipes.chime6 import (
    Chime6ArraySynchronizer,
    hms_to_seconds,
    seconds_to_hms,
    verify_md5_checksums,
)

SR = 16000


@pytest.fixture
def raw_corpus(tmp_path):
    root = tmp_path / "raw"
    audio = root / "audio" / "dev"
    audio.mkdir(parents=True)
    rng = np.random.default_rng(7)
    # Binaural headset: 2 channels, 400 samples.
    write_wav(audio / "S02_P05.wav", rng.standard_normal((2, 400)) * 0.1, SR)
    # One array with two channels, 300 samples, deterministic ramp so the
    # edit surgery is verifiable sample-by-sample.
    ramp = np.arange(300, dtype=np.float32) / 32768.0
    write_wav(audio / "S02_U01.CH1.wav", ramp[None, :], SR)
    write_wav(audio / "S02_U01.CH2.wav", -ramp[None, :], SR)
    trans = root / "transcriptions" / "dev"
    trans.mkdir(parents=True)
    (trans / "S02.json").write_text(json.dumps([
        {"session_id": "S02"},  # headerish entry without speaker: dropped
        {
            "speaker": "P05",
            "start_time": {"original": "00:00:10.00"},
            "end_time": {"original": "00:00:12.00"},
            "words": "hello there",
        },
    ]))
    return root


EDITS = {
    "S02": {
        # Array: drop samples 101..150 (1-based), i.e. output has a 0-gap-free
        # splice of [1..100] + [151..300]; then no clock drift (speed 1.0).
        "U01": {
            "edits": [[1, 100, 1], [151, 300, 101]],
            "speed": 1.0,
            "padding": 4,
        },
        # Headset: tiny speedup + trim 3 samples.
        "P05": {"speed": 1.25, "padding": -3},
    }
}


def test_synchronize_session_native(raw_corpus, tmp_path):
    out = tmp_path / "synced"
    sync = Chime6ArraySynchronizer(raw_corpus, out, audio_edits=EDITS)
    sync.synchronize_session("S02")

    # Array channels: 250 edited samples, then padding of 4 zeros in front.
    ch1, rate = read_wav(out / "audio" / "dev" / "S02_U01.CH1.wav")
    ch2, _ = read_wav(out / "audio" / "dev" / "S02_U01.CH2.wav")
    assert rate == SR and ch1.shape == (1, 254) and ch2.shape == (1, 254)
    ramp = np.arange(300) / 32768.0
    spliced = np.concatenate([ramp[:100], ramp[150:]])
    np.testing.assert_allclose(ch1[0, 4:], spliced, atol=1 / 32768.0)
    np.testing.assert_allclose(ch2[0, 4:], -spliced, atol=1 / 32768.0)
    assert np.all(ch1[0, :4] == 0)

    # Headset: warped to 400/1.25 = 320 samples, minus the 3-sample trim.
    p05, _ = read_wav(out / "audio" / "dev" / "S02_P05.wav")
    assert p05.shape == (2, 317)

    # Transcription timestamps: t/speed + padding/sr for the P05 speaker.
    segs = json.loads((out / "transcriptions" / "dev" / "S02.json").read_text())
    assert len(segs) == 1
    assert segs[0]["start_time"] == seconds_to_hms(10.0 / 1.25 - 3 / SR)
    assert segs[0]["end_time"] == seconds_to_hms(12.0 / 1.25 - 3 / SR)


def test_apply_edits_leaves_silence_for_unmapped_output(tmp_path):
    x = np.ones((1, 50), dtype=np.float32)
    # Map [1..10] -> 1 and [11..20] -> 31: positions 11..30 stay zero and
    # the output ends at the last edit's span (sample 40).
    out = Chime6ArraySynchronizer._apply_edits(x, [[1, 10, 1], [11, 20, 31]])
    assert out.shape == (1, 40)
    assert np.all(out[0, :10] == 1) and np.all(out[0, 10:30] == 0) and np.all(out[0, 30:] == 1)


def test_apply_edits_truncated_input(tmp_path):
    x = np.ones((2, 40), dtype=np.float32)
    # Second edit starts past the end of the input: ignored.
    out = Chime6ArraySynchronizer._apply_edits(x, [[1, 60, 1], [61, 80, 61]])
    assert out.shape == (2, 40)


def test_piecewise_native_warp(raw_corpus, tmp_path):
    out = tmp_path / "synced"
    edits = {
        "S02": {
            "U01": {
                "edits": [[1, 300, 1]],
                # Two segments: [0, 160) at speed 2.0 then the rest at 1.0.
                "speed": [2.0, 1.0],
                "padding": [0, 160],
            },
            "P05": {"speed": 1.0, "padding": 0},
        }
    }
    sync = Chime6ArraySynchronizer(raw_corpus, out, audio_edits=edits)
    sync.synchronize_session("S02")
    ch1, _ = read_wav(out / "audio" / "dev" / "S02_U01.CH1.wav")
    # 160 samples at speed 2 -> 80, remaining 140 at speed 1 -> 140.
    assert ch1.shape == (1, 220)


def test_verify_md5_checksums(tmp_path):
    corpus = tmp_path / "c"
    corpus.mkdir()
    write_wav(corpus / "S02_U01.CH1.wav", np.zeros((1, 64), dtype=np.float32), SR)
    digest = hashlib.md5((corpus / "S02_U01.CH1.wav").read_bytes()).hexdigest()
    good = tmp_path / "sums.txt"
    good.write_text(f"{digest} S02_U01.CH1.wav\n")
    assert verify_md5_checksums(corpus, checksum_file=good)
    bad = tmp_path / "bad.txt"
    bad.write_text(f"{'0' * 32} S02_U01.CH1.wav\n")
    assert not verify_md5_checksums(corpus, checksum_file=bad)
    # Unlisted files pass; session filtering skips mismatches outside scope.
    assert verify_md5_checksums(corpus, checksum_file=bad, sessions=["S99"])


def test_hms_round_trip():
    assert seconds_to_hms(hms_to_seconds("01:02:03.50")) == "01:02:03.500"
    assert hms_to_seconds(seconds_to_hms(3723.5)) == 3723.5


def test_hms_millisecond_carry_never_emits_60():
    # Rounding 59.9999 up must carry into the minute, not produce '60.000'.
    assert seconds_to_hms(59.9999) == "00:01:00.000"
    assert seconds_to_hms(3599.9996) == "01:00:00.000"
    assert seconds_to_hms(59.9994) == "00:00:59.999"


def test_synchronizer_tolerates_relative_corpus_dir(raw_corpus, tmp_path, monkeypatch):
    """Headset passthrough symlinks must not dangle when corpus_dir is given
    relative to the CWD (the normal CLI invocation)."""
    monkeypatch.chdir(tmp_path)
    sync = Chime6ArraySynchronizer("raw", "synced_rel", audio_edits=EDITS)
    sync.synchronize_session("S02")
    p05, _ = read_wav(tmp_path / "synced_rel" / "audio" / "dev" / "S02_P05.wav")
    assert p05.shape[0] == 2


def test_piecewise_negative_first_boundary(raw_corpus, tmp_path):
    """A negative first padding entry trims |start| samples AND shortens the
    first segment to end-|start| samples (reference chime6.py:673-684)."""
    out = tmp_path / "synced_neg"
    edits = {
        "S02": {
            "U01": {
                "edits": [[1, 300, 1]],
                # seg0: trim 40, take 160-40=120 samples; seg1: rest from 160.
                "speed": [1.0, 1.0],
                "padding": [-40, 160],
            },
            "P05": {"speed": 1.0, "padding": 0},
        }
    }
    sync = Chime6ArraySynchronizer(raw_corpus, out, audio_edits=edits)
    sync.synchronize_session("S02")
    ch1, _ = read_wav(out / "audio" / "dev" / "S02_U01.CH1.wav")
    ramp = np.arange(300) / 32768.0
    # seg0 = ramp[40:160] (120 samples), seg1 = ramp[160:] (140 samples).
    assert ch1.shape == (1, 260)
    np.testing.assert_allclose(ch1[0, :120], ramp[40:160], atol=1 / 32768.0)
    np.testing.assert_allclose(ch1[0, 120:], ramp[160:], atol=1 / 32768.0)


def test_transcription_speaker_without_fit_keeps_original_times(raw_corpus, tmp_path):
    out = tmp_path / "synced_nofit"
    edits = {
        "S02": {
            "U01": {"edits": [[1, 300, 1]], "speed": 1.0, "padding": 0},
            # P05 has no fit at all: audio is skipped with a warning and the
            # transcription keeps its original timestamps.
        }
    }
    sync = Chime6ArraySynchronizer(raw_corpus, out, audio_edits=edits)
    sync.synchronize_session("S02")
    segs = json.loads((out / "transcriptions" / "dev" / "S02.json").read_text())
    assert segs[0]["start_time"] == "00:00:10.00"
    assert segs[0]["end_time"] == "00:00:12.00"
