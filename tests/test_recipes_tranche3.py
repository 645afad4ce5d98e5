"""Tranche-3 recipe prepare_* functions on synthesized corpus trees."""
import numpy as np
import pytest

from lhotse_tpu.audio.wavio import write_wav


def _wav(path, seconds=1.0, sr=16000, seed=0, channels=1):
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    write_wav(path, (rng.randn(channels, int(seconds * sr)) * 0.1).astype(np.float32), sr)


def test_prepare_baker_zh(tmp_path):
    from lhotse_tpu.recipes import prepare_baker_zh

    _wav(tmp_path / "Wave" / "000001.wav", seed=1)
    _wav(tmp_path / "Wave" / "000002.wav", seed=2)
    (tmp_path / "ProsodyLabeling").mkdir()
    (tmp_path / "ProsodyLabeling" / "000001-010000.txt").write_text(
        "000001\t卡尔普#2陪外孙#1玩滑梯#4。\n"
        "\tka2 er2 pu3 pei2 wai4 sun1 wan2 hua2 ti1\n"
        "000002\t假语村言#2别再#1拥抱我#4。\n"
        "\tjia2 yu3 cun1 yan2 bie2 zai4 yong1 bao4 wo3\n",
        encoding="utf-8")
    m = prepare_baker_zh(tmp_path, output_dir=tmp_path / "out")
    sups = sorted(m["supervisions"], key=lambda s: s.id)
    assert len(sups) == 2
    assert sups[0].gender == "female" and sups[0].language == "Chinese"
    assert "#2" in sups[0].text
    assert "#" not in sups[0].custom["normalized_text"]
    assert sups[0].custom["pinyin"].startswith("ka2")


def test_prepare_tal_asr(tmp_path):
    from lhotse_tpu.recipes import prepare_tal_asr

    root = tmp_path / "aisolution_data"
    _wav(root / "wav" / "train" / "spkA" / "utt001.wav", seed=3)
    _wav(root / "wav" / "dev" / "spkB" / "utt002.wav", seed=4)
    (root / "transcript").mkdir(parents=True)
    (root / "transcript" / "transcript.txt").write_text(
        "utt001 你好，世界。\nutt002 Ａpple＃测试\n".replace("＃", "#"), encoding="utf-8")
    m = prepare_tal_asr(tmp_path, output_dir=tmp_path / "out")
    train = sorted(m["train"]["supervisions"], key=lambda s: s.id)
    dev = sorted(m["dev"]["supervisions"], key=lambda s: s.id)
    assert len(train) == 1 and train[0].speaker == "spkA"
    assert "，" not in train[0].text and "。" not in train[0].text
    assert dev[0].text.startswith("APPLE")  # fullwidth A mapped, '#' stripped, uppercased
    assert len(list(m["test"]["recordings"])) == 0


def test_prepare_tal_csasr(tmp_path):
    from lhotse_tpu.recipes import prepare_tal_csasr

    root = tmp_path / "TALCS_corpus"
    for part, seed in (("train_set", 5), ("dev_set", 6), ("test_set", 7)):
        _wav(root / part / "wav" / f"u{seed}.wav", seed=seed)
        (root / part / "label.txt").write_text(
            f"u{seed} 上面是 ＨＩ world！\n", encoding="utf-8")
    m = prepare_tal_csasr(tmp_path, output_dir=tmp_path / "out")
    sups = list(m["train_set"]["supervisions"])
    assert len(sups) == 1
    assert "！" not in sups[0].text and "HI WORLD" in sups[0].text
    assert sups[0].speaker == "u5"


def test_prepare_cdsd(tmp_path):
    from lhotse_tpu.recipes import prepare_cdsd

    root = tmp_path / "after_catting"
    _wav(root / "1h" / "Audio" / "S01" / "utt1.wav", seed=8)
    (root / "1h" / "Text").mkdir(parents=True)
    (root / "1h" / "Text" / "S01.txt").write_text("utt1 你 好 ｔest\n", encoding="utf-8")
    _wav(root / "10h" / "Audio" / "S02" / "utt2.wav", seed=9)
    (root / "10h" / "Text").mkdir(parents=True)
    (root / "10h" / "Text" / "S02.txt").write_text("utt2 再 见\n", encoding="utf-8")
    m = prepare_cdsd(tmp_path, output_dir=tmp_path / "out")
    s1 = list(m["1h"]["supervisions"])[0]
    assert s1.speaker == "S01"
    assert " " not in s1.text  # spaces removed
    assert "TEST" in s1.text  # fullwidth t -> t, uppercased
    assert len(list(m["10h"]["supervisions"])) == 1


def test_prepare_speechio(tmp_path):
    from lhotse_tpu.recipes import prepare_speechio

    part = "SPEECHIO_ASR_ZH00000"
    pdir = tmp_path / part
    _wav(pdir / "wavs" / "a_0001.wav", seed=10)
    pdir.mkdir(parents=True, exist_ok=True)
    (pdir / "metadata.tsv").write_text(
        "ID\tAUDIO\tTEXT\na_0001\twavs/a_0001.wav\t测试文本\n", encoding="utf-8")
    m = prepare_speechio(tmp_path, output_dir=tmp_path / "out")
    assert part in m and len(list(m[part]["supervisions"])) == 1
    sup = list(m[part]["supervisions"])[0]
    assert sup.text == "测试文本" and sup.speaker == "a"


def test_prepare_kespeech(tmp_path):
    from lhotse_tpu.recipes import prepare_kespeech

    _wav(tmp_path / "Audio" / "u1.wav", seed=11)
    task = tmp_path / "Tasks" / "ASR" / "test"
    task.mkdir(parents=True)
    (task / "wav.scp").write_text("u1 Audio/u1.wav\n")
    (task / "text").write_text("u1 <SPOKEN_NOISE>你好\n", encoding="utf-8")
    (task / "utt2subdialect").write_text("u1 Mandarin\n")
    (task / "utt2spk").write_text("u1 spk1\n")
    m = prepare_kespeech(tmp_path, output_dir=tmp_path / "out", dataset_parts=["test"])
    sups = list(m["test"]["supervisions"])
    assert len(sups) == 1
    assert sups[0].text == "你好"  # noise token stripped
    assert sups[0].language == "Mandarin" and sups[0].speaker == "spk1"
    with pytest.raises(ValueError):
        prepare_kespeech(tmp_path, output_dir=None, dataset_parts=["bogus"])


def test_prepare_wenetspeech4tts(tmp_path):
    from lhotse_tpu.recipes import prepare_wenetspeech4tts

    pack = tmp_path / "Premium" / "WenetSpeech4TTS_Premium_1"
    _wav(pack / "wavs" / "X001_S1.wav", seed=12)
    (pack / "txts").mkdir(parents=True)
    (pack / "txts" / "X001_S1.txt").write_text("X001_S1\t你好世界\n[0.0,1.0]\n", encoding="utf-8")
    (tmp_path / "filelists").mkdir()
    (tmp_path / "filelists" / "Basic_filelist.lst").write_text(
        "X001_S1 ../Premium/WenetSpeech4TTS_Premium_1/wavs/X001_S1.wav\n")
    mos_dir = tmp_path / "DNSMOS_P808Scores"
    mos_dir.mkdir()
    for tier in ("Basic", "Premium", "Standard"):
        (mos_dir / f"{tier}_DNSMOS.lst").write_text("X001_S1 4.01\n")
    m = prepare_wenetspeech4tts(
        tmp_path, dataset_parts="all", output_dir=tmp_path / "out")
    for tier in ("Basic", "Premium", "Standard"):
        sups = list(m[tier]["supervisions"])
        assert len(sups) == 1, tier
        assert sups[0].text == "你好世界"
        assert sups[0].custom["dns_mos"] == pytest.approx(4.01)


def test_prepare_xbmu_amdo31(tmp_path):
    from lhotse_tpu.recipes import prepare_xbmu_amdo31

    _wav(tmp_path / "data" / "wav" / "train" / "spk1" / "spk1-u001.wav", seed=13)
    tr = tmp_path / "data" / "transcript"
    tr.mkdir(parents=True)
    (tr / "transcript_clean.txt").write_text("u001 tibetan words here\n")
    m = prepare_xbmu_amdo31(tmp_path, output_dir=tmp_path / "out")
    sups = list(m["train"]["supervisions"])
    assert len(sups) == 1
    assert sups[0].recording_id == "spk1-u001"
    assert sups[0].language == "tibetan" and sups[0].speaker == "spk1"
    assert sups[0].text == "tibetan words here"
