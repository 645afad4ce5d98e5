"""
Recipe fixture tests, tranche 6: aishell (Mandarin transcript table +
speaker dirs), yesno (filename-encoded labels, 30/rest split), vctk
(per-utterance txt + speaker-info table), and musan (annotated music +
recordings-only speech/noise).
"""
import numpy as np
import pytest

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _sig(seconds, seed=0):
    rng = np.random.RandomState(seed)
    return (0.1 * rng.randn(int(SR * seconds))).astype(np.float32)


# ---------------------------------------------------------------------------
# aishell
# ---------------------------------------------------------------------------
@pytest.fixture
def aishell_root(tmp_path):
    root = tmp_path / "aishell"
    trans = root / "data_aishell" / "transcript"
    trans.mkdir(parents=True)
    lines = []
    utts = {
        "train": [("S0002", "BAC009S0002W0122"), ("S0002", "BAC009S0002W0123")],
        "dev": [("S0724", "BAC009S0724W0121")],
        "test": [("S0764", "BAC009S0764W0121")],
    }
    for part, entries in utts.items():
        for spk, utt in entries:
            d = root / "data_aishell" / "wav" / part / spk
            d.mkdir(parents=True, exist_ok=True)
            write_wav(str(d / f"{utt}.wav"), _sig(1.0), SR)
            lines.append(f"{utt} 广州 市 汽车 限购")
    # One transcript entry with no audio: must be skipped with a warning.
    lines.append("BAC009S9999W0001 无 音频")
    (trans / "aishell_transcript_v0.8.txt").write_text("\n".join(lines) + "\n")
    return root


def test_prepare_aishell(aishell_root, tmp_path):
    from lhotse_tpu.recipes import prepare_aishell

    m = prepare_aishell(aishell_root, output_dir=tmp_path / "out")
    assert set(m) == {"train", "dev", "test"}
    recs, sups = m["train"]["recordings"], m["train"]["supervisions"]
    assert len(recs) == 2 and len(sups) == 2
    validate_recordings_and_supervisions(recs, sups)
    sup = sups["BAC009S0002W0122"]
    assert sup.speaker == "S0002"
    assert sup.language == "Chinese"
    assert sup.text == "广州市汽车限购"  # spaces removed
    assert (tmp_path / "out" / "aishell_recordings_dev.jsonl.gz").is_file()


# ---------------------------------------------------------------------------
# yesno
# ---------------------------------------------------------------------------
def test_prepare_yesno(tmp_path):
    from lhotse_tpu.recipes import prepare_yesno

    root = tmp_path / "waves_yesno"
    root.mkdir()
    # 31 distinct filename bit patterns.
    patterns = set()
    i = 0
    while len(patterns) < 31:
        bits = tuple((i >> k) & 1 for k in range(8))
        patterns.add(bits)
        i += 1
    names = sorted("_".join(str(b) for b in bits) for bits in patterns)
    for name in names:
        write_wav(str(root / f"{name}.wav"), _sig(0.5), 8000)

    m = prepare_yesno(root, output_dir=tmp_path / "out")
    assert set(m) == {"train", "test"}
    # sorted files alternate between splits (reference yesno.py:141-143)
    assert [r.id for r in m["train"]["recordings"]] == names[::2]
    assert [r.id for r in m["test"]["recordings"]] == names[1::2]
    validate_recordings_and_supervisions(**m["train"])
    # Labels decode from the filename bits.
    sup = next(iter(m["train"]["supervisions"]))
    assert set(sup.text.split()) <= {"YES", "NO"}
    assert len(sup.text.split()) == 8


# ---------------------------------------------------------------------------
# vctk
# ---------------------------------------------------------------------------
@pytest.fixture
def vctk_root(tmp_path):
    root = tmp_path / "VCTK-Corpus"
    (root / "wav48" / "p225").mkdir(parents=True)
    (root / "wav48" / "p226").mkdir(parents=True)
    (root / "txt" / "p225").mkdir(parents=True)
    (root / "txt" / "p226").mkdir(parents=True)
    for spk, utt, text in (
        ("p225", "p225_001", "Please call Stella."),
        ("p225", "p225_002", "Ask her to bring these things."),
        ("p226", "p226_001", "Please call Stella."),
    ):
        write_wav(str(root / "wav48" / spk / f"{utt}.wav"), _sig(1.0), 48000)
        (root / "txt" / spk / f"{utt}.txt").write_text(text + "\n")
    # A transcript with no audio: skipped.
    (root / "txt" / "p226" / "p226_999.txt").write_text("Ghost utterance.\n")
    (root / "speaker-info.txt").write_text(
        "ID  AGE  GENDER  ACCENTS  REGION\n"
        "225  23  F    English    Southern  England\n"
        "226  22  M    English    Surrey\n"
    )
    return root


def test_prepare_vctk(vctk_root, tmp_path):
    from lhotse_tpu.recipes import prepare_vctk

    m = prepare_vctk(vctk_root, output_dir=tmp_path / "out")
    recs, sups = m["recordings"], m["supervisions"]
    assert len(recs) == 3
    assert len(sups) == 3  # ghost transcript dropped
    validate_recordings_and_supervisions(recs, sups)
    sup = sups["p225_001"]
    assert sup.text == "Please call Stella."
    assert sup.speaker == "p225"
    assert sup.gender == "F"
    assert sup.custom["accent"] == "English"
    assert sup.custom["region"] == "Southern England"


# ---------------------------------------------------------------------------
# musan
# ---------------------------------------------------------------------------
@pytest.fixture
def musan_root(tmp_path):
    root = tmp_path / "musan"
    for part, names in (
        ("music", ["music-fma-0000", "music-fma-0001"]),
        ("speech", ["speech-librivox-0000"]),
        ("noise", ["noise-free-sound-0000"]),
    ):
        d = root / part / "sub"
        d.mkdir(parents=True)
        for n in names:
            write_wav(str(d / f"{n}.wav"), _sig(0.8), SR)
    (root / "music" / "sub" / "ANNOTATIONS").write_text(
        "music-fma-0000 jazz,blues Y artist1 extra-ignored\n"
        "music-fma-0001 rock N artist2\n"
    )
    return root


def test_prepare_musan(musan_root, tmp_path):
    from lhotse_tpu.recipes import prepare_musan

    m = prepare_musan(musan_root, output_dir=tmp_path / "out")
    assert set(m) == {"music", "speech", "noise"}
    validate_recordings_and_supervisions(**m["music"])
    sups = m["music"]["supervisions"]
    s0 = sups["music-fma-0000"]
    assert s0.custom["genres"] == ["jazz", "blues"]
    assert s0.custom["vocals"] is True
    assert s0.speaker == "artist1"
    assert "supervisions" not in m["speech"]
    assert len(m["noise"]["recordings"]) == 1

    # use_vocals=False keeps only instrumental tracks.
    m2 = prepare_musan(musan_root, use_vocals=False)
    assert [s.id for s in m2["music"]["supervisions"]] == ["music-fma-0001"]
