"""
Recipe fixture tests, tranche 8: the _zh_common Mandarin family —
magicdata (TRANS.txt tables + punctuation stripping), stcmds (per-utt
transcript files + positional speaker ids), thchs-30 (.wav.trn transcripts
shared across split symlink-style layouts).
"""
import numpy as np
import pytest

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _sig(seconds=0.6, seed=0):
    rng = np.random.RandomState(seed)
    return (0.1 * rng.randn(int(SR * seconds))).astype(np.float32)


def test_prepare_magicdata(tmp_path):
    from lhotse_tpu.recipes import prepare_magicdata

    root = tmp_path / "magicdata"
    for part, utts in (
        ("train", [("14_3466", "14_3466_20170826171404"), ("14_3466", "14_3466_20170826171942")]),
        ("dev", [("38_5718", "38_5718_20170915093303")]),
    ):
        lines = ["UtteranceID SpeakerID Transcription"]
        for spk, utt in utts:
            d = root / part / spk
            d.mkdir(parents=True, exist_ok=True)
            write_wav(str(d / f"{utt}.wav"), _sig(), SR)
            lines.append(f"{utt}.wav {spk} 北京， 你好！")
        (root / part / "TRANS.txt").write_text("\n".join(lines) + "\n")

    m = prepare_magicdata(root, output_dir=tmp_path / "out")
    assert set(m) == {"train", "dev"}
    recs, sups = m["train"]["recordings"], m["train"]["supervisions"]
    assert len(recs) == 2
    validate_recordings_and_supervisions(recs, sups)
    sup = sups["14_3466_20170826171404"]
    assert sup.speaker == "14_3466"
    # WeNet normalization strips the punctuation.
    assert "，" not in sup.text and "！" not in sup.text
    assert "北京" in sup.text


def test_prepare_stcmds(tmp_path):
    from lhotse_tpu.recipes import prepare_stcmds

    root = tmp_path / "stcmds"
    d = root / "ST-CMDS-20170001_1-OS"
    d.mkdir(parents=True)
    for i in range(2):
        stem = f"20170001P0000{1 + i}A000{1 + i}"
        write_wav(str(d / f"{stem}.wav"), _sig(seed=i), SR)
        (d / f"{stem}.txt").write_text("今天 天气 很好\n")
    # A transcript without audio is ignored.
    (d / "20170001P00009A0009.txt").write_text("孤儿 文本\n")

    m = prepare_stcmds(root, output_dir=tmp_path / "out")
    assert set(m) == {"train"}
    recs, sups = m["train"]["recordings"], m["train"]["supervisions"]
    assert len(recs) == 2
    validate_recordings_and_supervisions(recs, sups)
    sup = sups["20170001P00001A0001"]
    assert sup.speaker == "P00001A"  # positional slice of the stem
    assert "今天" in sup.text


def test_prepare_thchs_30(tmp_path):
    from lhotse_tpu.recipes import prepare_thchs_30

    root = tmp_path / "thchs"
    data = root / "data_thchs30" / "data"
    data.mkdir(parents=True)
    for part, utt in (("train", "A11_0"), ("dev", "B11_374"), ("test", "C21_9")):
        pd = root / "data_thchs30" / part
        pd.mkdir(parents=True, exist_ok=True)
        write_wav(str(pd / f"{utt}.wav"), _sig(), SR)
        (data / f"{utt}.wav.trn").write_text("绿 是 阳春 烟 景\nlv4 shi4\nl v4 sh i4\n")

    m = prepare_thchs_30(root, output_dir=tmp_path / "out")
    assert set(m) == {"train", "dev", "test"}
    for part, utt, spk in (
        ("train", "A11_0", "A11"),
        ("dev", "B11_374", "B11"),
        ("test", "C21_9", "C21"),
    ):
        recs, sups = m[part]["recordings"], m[part]["supervisions"]
        assert len(recs) == 1, part
        validate_recordings_and_supervisions(recs, sups)
        sup = sups[utt]
        assert sup.speaker == spk
        # Only the first .trn line (characters) is the transcript.
        assert "阳春" in sup.text
        assert "lv4" not in sup.text
