"""
Recipe fixture tests, tranche 9: the TTS corpora — ljspeech (metadata.csv
with raw|normalized text) and baker_zh / BZNSYP (alternating prosody-label
and pinyin lines).
"""
import numpy as np

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 22050


def _sig(seconds=0.5, seed=0):
    rng = np.random.RandomState(seed)
    return (0.1 * rng.randn(int(SR * seconds))).astype(np.float32)


def test_prepare_ljspeech(tmp_path):
    from lhotse_tpu.recipes import prepare_ljspeech

    root = tmp_path / "LJSpeech-1.1"
    (root / "wavs").mkdir(parents=True)
    rows = []
    for i in range(2):
        rid = f"LJ001-000{i}"
        write_wav(str(root / "wavs" / f"{rid}.wav"), _sig(seed=i), SR)
        rows.append(f"{rid}|Printing, in the year 1476|printing, in the year fourteen seventy-six")
    rows.append("LJ999-9999|Ghost row|ghost row")  # no audio: skipped
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")

    m = prepare_ljspeech(root, output_dir=tmp_path / "out")
    recs, sups = m["recordings"], m["supervisions"]
    assert len(recs) == 2 and len(sups) == 2
    validate_recordings_and_supervisions(recs, sups)
    sup = sups["LJ001-0000"]
    assert sup.text == "Printing, in the year 1476"
    assert sup.custom["normalized_text"] == "printing, in the year fourteen seventy-six"
    assert sup.gender == "female" and sup.language == "English"
    assert (tmp_path / "out" / "ljspeech_recordings_all.jsonl.gz").is_file()


def test_prepare_baker_zh(tmp_path):
    from lhotse_tpu.recipes import prepare_baker_zh

    root = tmp_path / "BZNSYP"
    (root / "Wave").mkdir(parents=True)
    (root / "ProsodyLabeling").mkdir(parents=True)
    labels = []
    for i in range(2):
        rid = f"00000{1 + i}"
        write_wav(str(root / "Wave" / f"{rid}.wav"), _sig(seed=i), SR)
        labels.append(f"{rid}\t卡尔普#2陪外孙#1玩滑梯#4。")
        labels.append("\tka2 er2 pu3 pei2 wai4 sun1 wan2 hua2 ti1")
    labels.append("000099\t鬼#1行#4。")  # no audio: skipped
    labels.append("\tgui3 hang2")
    (root / "ProsodyLabeling" / "000001-010000.txt").write_text(
        "\n".join(labels) + "\n"
    )

    m = prepare_baker_zh(root, output_dir=tmp_path / "out")
    recs, sups = m["recordings"], m["supervisions"]
    assert len(recs) == 2 and len(sups) == 2
    validate_recordings_and_supervisions(recs, sups)
    sup = sups["000001"]
    assert "#2" in sup.text  # prosody marks preserved in the raw text
    assert "#" not in sup.custom["normalized_text"]  # ...stripped here
    assert sup.custom["pinyin"].startswith("ka2 er2")
    assert sup.language == "Chinese"
