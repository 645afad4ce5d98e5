"""
Recipe fixture tests, tranche 7: commonvoice (per-language TSV + clips)
and timit (NIST sphere audio + TXT/WRD/PHN alignments, Kaldi core splits).
"""
import numpy as np
import pytest

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.sphio import write_sph
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _sig(seconds, seed=0):
    rng = np.random.RandomState(seed)
    return (0.1 * rng.randn(int(SR * seconds))).astype(np.float32)


# ---------------------------------------------------------------------------
# commonvoice
# ---------------------------------------------------------------------------
@pytest.fixture
def commonvoice_root(tmp_path):
    root = tmp_path / "cv-corpus"
    for lang in ("en", "pl"):
        clips = root / lang / "clips"
        clips.mkdir(parents=True)
        rows = ["client_id\tpath\tsentence\tage\tgender\taccents"]
        for i in range(2):
            name = f"common_voice_{lang}_{1000 + i}.wav"
            write_wav(str(clips / name), _sig(0.8, seed=i), SR)
            rows.append(
                f"spk{lang}{i}\t{name}\tSentence number {i}.\ttwenties\t"
                f"{'female' if i else 'male'}\taccent-{lang}"
            )
        # A TSV row referencing a missing clip: skipped, not fatal.
        rows.append(f"ghost\tmissing_{lang}.wav\tGhost.\t\t\t")
        (root / lang / "dev.tsv").write_text("\n".join(rows) + "\n")
    return root


def test_prepare_commonvoice(commonvoice_root, tmp_path):
    from lhotse_tpu.recipes import prepare_commonvoice

    m = prepare_commonvoice(
        commonvoice_root, output_dir=tmp_path / "out", languages=["en"],
        splits=["dev"])
    recs = m["en"]["dev"]["recordings"]
    sups = m["en"]["dev"]["supervisions"]
    assert len(recs) == 2 and len(sups) == 2  # ghost row skipped
    validate_recordings_and_supervisions(recs, sups)
    sup = sups["common_voice_en_1000"]
    assert sup.text == "Sentence number 0."
    assert sup.language == "en"
    assert sup.speaker == "spken0"
    assert sup.gender == "male"
    assert sup.custom["accents"] == "accent-en"


def test_prepare_commonvoice_auto_languages(commonvoice_root, tmp_path):
    from lhotse_tpu.recipes import prepare_commonvoice

    m = prepare_commonvoice(
        commonvoice_root, tmp_path / "out", languages="auto", splits=["dev"]
    )
    assert set(m) == {"en", "pl"}


# ---------------------------------------------------------------------------
# timit
# ---------------------------------------------------------------------------
@pytest.fixture
def timit_root(tmp_path):
    root = tmp_path / "timit"
    n = SR  # 1.0 s utterances
    # TRAIN speaker + one DEV-core and one TEST-core speaker.
    layout = [
        ("TRAIN", "DR1", "fcjf0"),
        ("TEST", "DR1", "fadg0"),  # dev core list
        ("TEST", "DR2", "fdhc0"),  # test core list
    ]
    for part, dr, spk in layout:
        d = root / "data" / part / dr / spk
        d.mkdir(parents=True)
        write_sph(str(d / "SA1.WAV"), _sig(1.0), SR)
        (d / "SA1.TXT").write_text(f"0 {n} she had your dark suit\n")
        (d / "SA1.WRD").write_text(
            f"0 {n//2} she\n{n//2} {n} had\n"
        )
        (d / "SA1.PHN").write_text(
            f"0 {n//4} sh\n{n//4} {n//2} iy\n{n//2} {n} hh\n"
        )
    return root


def test_prepare_timit(timit_root, tmp_path):
    from lhotse_tpu.recipes import prepare_timit

    m = prepare_timit(
        timit_root, output_dir=tmp_path / "out", num_phones=60)
    assert set(m) == {"TRAIN", "DEV", "TEST"}
    for part, spk in (("TRAIN", "fcjf0"), ("DEV", "fadg0"), ("TEST", "fdhc0")):
        recs, sups = m[part]["recordings"], m[part]["supervisions"]
        assert len(recs) == 1, part
        validate_recordings_and_supervisions(recs, sups)
        sup = sups[f"{spk}-SA1"]
        assert sup.text == "she had your dark suit"
        assert sup.speaker == spk
        assert sup.gender == "female"
        words = sup.alignment["word"]
        assert [w.symbol for w in words] == ["she", "had"]
        assert words[1].start == pytest.approx(0.5)
        phones = sup.alignment["phone"]
        assert [p.symbol for p in phones] == ["sh", "iy", "hh"]
