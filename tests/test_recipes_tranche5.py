"""
Recipe fixture tests, tranche 5: the flagship parsers that previously had
no end-to-end fixture coverage — librispeech (incl. word alignments, text
normalization, and manifest caching), tedlium (SPHERE + STM), and mtedx
(FLAC + WebVTT).
"""
import numpy as np
import pytest

from lhotse_tpu import RecordingSet, SupervisionSet, validate_recordings_and_supervisions
from lhotse_tpu.audio.flacio import write_flac
from lhotse_tpu.audio.sphio import write_sph
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _sig(seconds, seed=0):
    rng = np.random.RandomState(seed)
    return (0.1 * rng.randn(int(SR * seconds))).astype(np.float32)


# ---------------------------------------------------------------------------
# librispeech
# ---------------------------------------------------------------------------
@pytest.fixture
def librispeech_root(tmp_path):
    root = tmp_path / "LibriSpeech"
    for split, spk, chap, utts in [
        ("dev-clean", "84", "121123", ["0000", "0001"]),
        ("dev-clean", "174", "50561", ["0000"]),
        ("test-clean", "1089", "134686", ["0000"]),
    ]:
        chap_dir = root / split / spk / chap
        chap_dir.mkdir(parents=True, exist_ok=True)
        lines = []
        for i, utt in enumerate(utts):
            utt_id = f"{spk}-{chap}-{utt}"
            write_flac(str(chap_dir / f"{utt_id}.flac"), _sig(1.0 + 0.5 * i, seed=i), SR)
            lines.append(f"{utt_id} HELLO WORLD NUMBER {utt}")
        (chap_dir / f"{spk}-{chap}.trans.txt").write_text("\n".join(lines) + "\n")
    # Word alignments for one chapter (LibriSpeech-Alignments format).
    ali_dir = root / "dev-clean" / "84" / "121123"
    (ali_dir / "84-121123.alignment.txt").write_text(
        '84-121123-0000 "HELLO,WORLD,NUMBER,0000" "0.25,0.5,0.75,1.0"\n'
    )
    return root


def test_prepare_librispeech(librispeech_root, tmp_path):
    from lhotse_tpu.recipes import prepare_librispeech

    out = tmp_path / "manifests"
    m = prepare_librispeech(librispeech_root, output_dir=out)
    assert set(m) == {"dev-clean", "test-clean"}
    recs, sups = m["dev-clean"]["recordings"], m["dev-clean"]["supervisions"]
    assert len(recs) == 3 and len(sups) == 3
    validate_recordings_and_supervisions(recs, sups)

    sup = sups["84-121123-0000"]
    assert sup.text == "HELLO WORLD NUMBER 0000"
    assert sup.speaker == "84"
    assert sup.language == "English"
    # Alignment attached with word spans [t_{i-1}, t_i).
    ali = sup.alignment["word"]
    assert [a.symbol for a in ali] == ["HELLO", "WORLD", "NUMBER", "0000"]
    assert ali[0].start == 0.0 and ali[1].start == 0.25
    # The sibling utterance in the same chapter has no alignment row.
    assert sups["84-121123-0001"].alignment is None

    # Manifests are written and reloadable.
    reloaded = RecordingSet.from_file(out / "librispeech_recordings_dev-clean.jsonl.gz")
    assert len(reloaded) == 3


def test_prepare_librispeech_normalize_and_cache(librispeech_root, tmp_path):
    from lhotse_tpu.recipes import prepare_librispeech

    out = tmp_path / "manifests"
    m = prepare_librispeech(
        librispeech_root, dataset_parts="dev-clean", output_dir=out,
        normalize_text="lower",
    )
    sups = m["dev-clean"]["supervisions"]
    assert all(s.text == s.text.lower() for s in sups)
    # Second invocation returns the cached manifests (no re-scan needed).
    m2 = prepare_librispeech(
        librispeech_root, dataset_parts="dev-clean", output_dir=out
    )
    assert len(m2["dev-clean"]["supervisions"]) == len(sups)


def test_prepare_librispeech_missing_split_raises(tmp_path):
    from lhotse_tpu.recipes import prepare_librispeech

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError):
        prepare_librispeech(empty)


# ---------------------------------------------------------------------------
# tedlium
# ---------------------------------------------------------------------------
@pytest.fixture
def tedlium_root(tmp_path):
    root = tmp_path / "TEDLIUM_release-3"
    for split, talks in [("dev", ["TalkA"]), ("test", ["TalkB", "TalkC"])]:
        sph_dir = root / "legacy" / split / "sph"
        stm_dir = root / "legacy" / split / "stm"
        sph_dir.mkdir(parents=True)
        stm_dir.mkdir(parents=True)
        for t, talk in enumerate(talks):
            write_sph(str(sph_dir / f"{talk}.sph"), _sig(4.0, seed=t), SR)
            stm_dir.joinpath(f"{talk}.stm").write_text(
                f"{talk} 1 {talk}_spk 0.50 2.00 <o,f0,male> hello there\n"
                f"{talk} 1 {talk}_spk 2.10 3.80 <o,f0,male> general kenobi\n"
            )
    return root


def test_prepare_tedlium(tedlium_root, tmp_path):
    from lhotse_tpu.recipes.tedlium import prepare_tedlium

    m = prepare_tedlium(
        tedlium_root, output_dir=tmp_path / "out", dataset_parts=["dev", "test"]
    )
    assert set(m) == {"dev", "test"}
    recs, sups = m["test"]["recordings"], m["test"]["supervisions"]
    assert len(recs) == 2 and len(sups) == 4
    validate_recordings_and_supervisions(recs, sups)
    first = sorted(sups, key=lambda s: (s.recording_id, s.start))[0]
    assert first.text == "hello there"
    assert first.start == 0.5 and abs(first.duration - 1.5) < 1e-6


# ---------------------------------------------------------------------------
# mtedx
# ---------------------------------------------------------------------------
@pytest.fixture
def mtedx_root(tmp_path):
    root = tmp_path / "mtedx"
    base = root / "es-es" / "data"
    for split in ("train", "valid", "test"):
        wav_dir = base / split / "wav"
        vtt_dir = base / split / "vtt"
        wav_dir.mkdir(parents=True)
        vtt_dir.mkdir(parents=True)
        write_flac(str(wav_dir / f"talk_{split}.flac"), _sig(5.0), SR)
        vtt_dir.joinpath(f"talk_{split}.es.vtt").write_text(
            "WEBVTT\n"
            "\n"
            "00:00:00.500 --> 00:00:02.000\n"
            "hola mundo\n"
            "\n"
            "00:00:02.500 --> 00:00:04.000\n"
            "buenos dias\n"
        )
    return root


def test_prepare_mtedx(mtedx_root, tmp_path):
    from lhotse_tpu.recipes.mtedx import prepare_mtedx

    m = prepare_mtedx(mtedx_root, output_dir=tmp_path / "out", languages="es")
    assert "es" in m
    train = m["es"]["train"]
    recs, sups = train["recordings"], train["supervisions"]
    assert len(recs) == 1 and len(sups) == 2
    validate_recordings_and_supervisions(recs, sups)
    s = sorted(sups, key=lambda s: s.start)[0]
    assert s.text == "hola mundo"
    assert s.language == "es"
    assert s.start == 0.5 and abs(s.duration - 1.5) < 1e-6
