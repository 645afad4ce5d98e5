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
    # Cached re-run still returns the prepared parts.
    again = prepare_speechio(tmp_path, output_dir=tmp_path / "out")
    assert part in again and len(list(again[part]["recordings"])) == 1


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


def test_prepare_callhome_english_asr(tmp_path):
    from lhotse_tpu.recipes import prepare_callhome_english

    audio = tmp_path / "audio"
    trans = tmp_path / "trans"
    for split, adir in (("train", "train"), ("devtest", "devtest"), ("evaltest", "evltest")):
        _wav(audio / "data" / adir / f"en_{split}.sph", seconds=30.0, seed=20, channels=2)
        tdir = trans / "transcrpt" / split
        tdir.mkdir(parents=True)
        (tdir / f"en_{split}.txt").write_text(
            "# comment line\n"
            "1.00 2.50 A: hello there\n"
            "2.50 4.00 B: hi and this line\n"
            "wraps onto the next\n")
    m = prepare_callhome_english(
        audio, transcript_dir=trans, output_dir=tmp_path / "out")
    sups = sorted(m["train"]["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2
    assert sups[0].channel == 0 and sups[1].channel == 1  # A->0, B->1
    assert sups[1].text.endswith("wraps onto the next")  # continuation stitched
    assert "evaltest" in m  # the LDC 'evltest' typo is handled


def test_prepare_callhome_egyptian(tmp_path):
    from lhotse_tpu.recipes import prepare_callhome_egyptian

    audio = tmp_path / "audio"
    trans = tmp_path / "trans"
    _wav(audio / "callhome/arabic/train" / "ar_1.sph", seconds=10.0, seed=21)
    tdir = trans / "callhome_arabic_trans_970711/transcrp/train/roman"
    tdir.mkdir(parents=True)
    (tdir / "ar_1.txt").write_text("0.50 2.00 B: %ah Tayyib\n")
    _wav(audio / "callhome/arabic/devtest" / "ar_2.sph", seconds=5.0, seed=22)
    d2 = trans / "callhome_arabic_trans_970711/transcrp/devtest/roman"
    d2.mkdir(parents=True)
    (d2 / "ar_2.txt").write_text("0.00 1.00 A: kalam\n")
    _wav(audio / "callhome/arabic/evltest" / "ar_3.sph", seconds=5.0, seed=23)
    d3 = trans / "callhome_arabic_trans_970711/transcrp/evaltest/roman"
    d3.mkdir(parents=True)
    (d3 / "ar_3.txt").write_text("0.00 1.00 A: kalam\n")
    m = prepare_callhome_egyptian(audio, trans, output_dir=tmp_path / "out")
    (sup,) = list(m["train"]["supervisions"])
    assert sup.text == "%ah Tayyib" and sup.speaker == "ar_1_B"
    assert len(list(m["evaltest"]["recordings"])) == 1


_TDF_HEADER = (
    "file;unicode\tchannel;int\tstart;float\tend;float\tspeaker;unicode\t"
    "speakerType;unicode\tspeakerDialect;unicode\ttranscript;unicode\t"
    "section;int\tturn;int\tsegment;int\tsectionType;unicode\tsuType;unicode\n"
    ";;MM sectionTypes\n;;MM sectionBoundaries\n")


def _tdf_row(reco, channel, start, end, speaker, text):
    return (f"{reco}\t{channel}\t{start}\t{end}\t{speaker}\tmale\tdialect\t{text}"
            f"\t0\t1\t2\treport\tstatement\n")


def test_prepare_gale_arabic(tmp_path):
    from lhotse_tpu.recipes import prepare_gale_arabic

    adir = tmp_path / "LDC_S"
    tdir = tmp_path / "LDC_T"
    tdir.mkdir()
    test_id = "ALAM_WITHEVENT_ARB_20070116_205800"
    _wav(adir / f"{test_id}.wav", seconds=30.0, seed=24)
    _wav(adir / "OTHER_PROG_ARB_20070101_000000.flac", seconds=30.0, seed=25)
    (tdir / "x.tdf").write_text(
        _TDF_HEADER
        + _tdf_row(f"{test_id}.sph", 0, 1.0, 2.0, "spk*1", "marhaba")
        + _tdf_row("OTHER_PROG_ARB_20070101_000000", 0, 0.0, 3.0, "no speaker", "x")
        + _tdf_row("OTHER_PROG_ARB_20070101_000000", 0, 3.0, 4.0, "spk2", "ahlan"))
    m = prepare_gale_arabic([adir], [tdir], output_dir=tmp_path / "out")
    test_sups = list(m["test"]["supervisions"])
    train_sups = list(m["train"]["supervisions"])
    assert len(test_sups) == 1 and test_sups[0].speaker == "spk1"  # '*' cleaned
    assert test_sups[0].recording_id == test_id  # '.sph' suffix cleaned
    assert len(train_sups) == 1  # 'no speaker' row dropped
    assert train_sups[0].custom["section_type"] == "report"


def test_prepare_fisher_spanish(tmp_path):
    from lhotse_tpu.recipes import prepare_fisher_spanish

    adir = tmp_path / "audio"
    tdir = tmp_path / "trans"
    tdir.mkdir()
    _wav(adir / "fsp_20050301_1.sph", seconds=10.0, seed=26, channels=2)
    (tdir / "fsp_20050301_1.tdf").write_text(
        _TDF_HEADER
        + _tdf_row("fsp_20050301_1", 0, 0.5, 2.0, "x", "hola  amigo")
        + _tdf_row("fsp_20050301_1", 1, 2.0, 3.5, "y", "buenos dias"))
    (tdir / "spanish_call.tbl").write_text(
        "sid,junk,spkA,a,b,c,d,e,spkB\n1,z,maria,a,b,c,d,e,jose\n")
    m = prepare_fisher_spanish(adir, tdir, output_dir=tmp_path / "out")
    sups = sorted(m["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2
    assert sups[0].speaker == "maria" and sups[1].speaker == "jose"
    assert sups[0].text == "hola amigo"  # double space collapsed
    assert sups[0].language == "Spanish"


def test_prepare_mgb2_dev(tmp_path):
    from lhotse_tpu.recipes import prepare_mgb2
    from lhotse_tpu.recipes.mgb2 import cleaning, from_buck_walter, make_supervisions

    corpus = tmp_path / "corpus"
    dev = corpus / "dev"
    _wav(dev / "wav" / "prog1.wav", seconds=10.0, seed=27)
    dev.mkdir(parents=True, exist_ok=True)
    (dev / "text.non_overlap_speech").write_text("prog1-seg1 mrHbA\n")
    (dev / "segments.non_overlap_speech").write_text("prog1-seg1 prog1 0.5 2.0\n")
    (dev / "wav.scp").write_text("prog1 wav/prog1.wav\n")
    # train/test dirs absent: prepare only dev by pre-creating cached outputs
    out = tmp_path / "out"
    out.mkdir()
    import gzip
    for part in ("train", "test"):
        for kind in ("recordings", "supervisions"):
            with gzip.open(out / f"mgb2_{kind}_{part}.jsonl.gz", "wt") as f:
                f.write("")
    m = prepare_mgb2(corpus, out, text_cleaning=False)
    dev_sups = list(m["dev"]["supervisions"])
    assert len(dev_sups) == 1
    assert dev_sups[0].text == from_buck_walter("mrHbA")
    # XML train parsing unit-level
    xml = tmp_path / "p.xml"
    xml.write_text(
        '<?xml version="1.0"?><transcript><segments annotation_id="x">'
        '<segment id="PROG_utt1" starttime="1.0" endtime="2.5" WMER="10.0" '
        'who="TRSspeaker3overlap"><element>ahlan</element><element>bik</element>'
        '</segment>'
        '<segment id="PROG_utt2" starttime="3.0" endtime="4.0" WMER="95.0" '
        'who="TRSspeaker4overlap"><element>dropped</element></segment>'
        '</segments></transcript>')
    sups = make_supervisions(xml, mer_thresh=80)
    assert len(sups) == 1  # WMER 95 filtered out
    assert sups[0].text == "ahlan bik" and sups[0].speaker == 3
    assert sups[0].recording_id == "PROG"
    assert cleaning("مَرْحَبا ب العالم!!") == "مرحبا العالم"


def test_prepare_aspire_single(tmp_path):
    from lhotse_tpu.recipes import prepare_aspire

    data = tmp_path / "IARPA-ASpIRE-Dev-Sets-v2.0" / "data"
    for part in ("dev", "dev_test"):
        _wav(data / "dev_and_dev_test_audio" / f"ASpIRE_single_{part}" / f"{part}_rec1.wav",
             seconds=10.0, seed=30)
    stm = data / "dev_and_dev_test_STM_files"
    stm.mkdir(parents=True)
    (stm / "dev.stm").write_text(
        "dev_rec1 1 spkA 0.50 2.00 hello aspire\n"
        "dev_rec1 1 spkA 2.00 3.00 second utt\n")
    (stm / "dev_test.stm").write_text("dev_test_rec1 1 spkB 0.00 1.00 test utt\n")
    m = prepare_aspire(tmp_path, output_dir=tmp_path / "out", mic="single")
    dev = sorted(m["dev"]["supervisions"], key=lambda s: s.start)
    assert len(dev) == 2 and dev[0].id == "dev_rec1-spkA-000"
    assert dev[0].text == "hello aspire" and dev[0].channel == 0
    assert len(list(m["dev_test"]["supervisions"])) == 1


def test_prepare_slu(tmp_path):
    from lhotse_tpu.recipes import prepare_slu

    (tmp_path / "data").mkdir(parents=True)
    _wav(tmp_path / "wavs" / "u1.wav", seed=31)
    _wav(tmp_path / "wavs" / "u2.wav", seed=32)
    for part in ("train", "valid", "test"):
        (tmp_path / "data" / f"{part}_data.csv").write_text(
            ",path,transcription,action,object,location\n"
            "0,wavs/u1.wav,turn on the lights,activate,lights,none\n"
            "1,wavs/u2.wav,turn them off,deactivate,lights,none\n")
    m = prepare_slu(tmp_path, output_dir=tmp_path / "out")
    sups = sorted(m["train"]["supervisions"], key=lambda s: str(s.id))
    assert len(sups) == 2
    assert sups[0].text == "turn on the lights"
    assert sups[0].custom["frames"] == ("activate", "lights", "none")


def test_prepare_broadcast_news(tmp_path):
    from lhotse_tpu.recipes import prepare_broadcast_news

    audio = tmp_path / "audio"
    trans = tmp_path / "trans"
    trans.mkdir()
    _wav(audio / "prog1.sph", seconds=30.0, seed=33)
    (trans / "prog1.sgml").write_text(
        '<episode program="NPR News" language="English">\n'
        '<section type="report" starttime="0.0" endtime="10.0">\n'
        '<turn speaker="Alice Smith" spkrtype="female" starttime="0.0" endtime="10.0">\n'
        '<time sec="0.5">\nfirst segment text\n'
        '<time sec="4.0">\nsecond segment text\n'
        "</turn>\n</section>\n</episode>\n")
    m = prepare_broadcast_news(audio, trans, output_dir=tmp_path / "out")
    assert len(list(m["recordings"])) == 1
    sections = list(m["sections"])
    segments = sorted(m["segments"], key=lambda s: s.start)
    assert len(sections) == 1 and sections[0].custom["program"] == "NPR News"
    assert len(segments) == 2
    assert segments[0].text == "first segment text"
    assert segments[0].start == 0.5 and segments[0].end == 4.0
    assert segments[1].end == 10.0  # closed by the turn endtime
    assert segments[0].speaker == "Alice Smith" and segments[0].gender == "female"


def test_uwb_atcc_text_normalize():
    from lhotse_tpu.recipes.uwb_atcc import int_to_words, text_normalize

    assert int_to_words(119) == "ONE HUNDRED NINETEEN"
    assert int_to_words(40) == "FORTY"
    out = text_normalize(
        "lufthansa 4 7 A climb FL 310 [ehm_] roger",
        silence_sym="", breath_sym="", noise_sym="", foreign_sym="<unk>",
        unintelligble_sym="<unk>", partial_sym="<unk>", unknown_sym="<unk>")
    assert "FOUR SEVEN ALFA" in out
    assert "FLIGHT LEVEL THREE HUNDRED TEN" in out
    assert "LUFTHANSA" in out and "ROGER" in out and "[" not in out


def test_prepare_uwb_atcc(tmp_path):
    from lhotse_tpu.recipes import prepare_uwb_atcc

    _wav(tmp_path / "TWR-test1.wav", seconds=10.0, sr=8000, seed=34)
    (tmp_path / "TWR-test1.trs").write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<Trans audio_filename="e2_TWR-test1.wav">\n'
        '<Episode><Section type="report" startTime="0" endTime="10">\n'
        '<Turn startTime="0" endTime="10">\n'
        '<Sync time="0.5"/> [ground] contact praha\n'
        '<Sync time="3.0"/> [air] roger contact\n'
        "</Turn></Section></Episode></Trans>\n")
    m = prepare_uwb_atcc(tmp_path, output_dir=tmp_path / "out")
    sups = sorted(m["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2
    assert sups[0].speaker == "ground" and sups[0].id.endswith("_AT")
    assert sups[0].start == 0.5 and sups[0].end == 3.0
    assert "CONTACT PRAHA" in sups[0].text
    assert sups[1].speaker == "air" and sups[1].end == 10.0


def test_prepare_atcosim(tmp_path):
    from lhotse_tpu.recipes import prepare_atcosim

    txt = tmp_path / "TXTdata"
    txt.mkdir(parents=True)
    _wav(tmp_path / "WAVdata" / "d1" / "s1" / "u1.wav", seconds=2.0, sr=32000, seed=35)
    (txt / "fulldata.csv").write_text(
        "recording_id,directory,subdirectory,filename,length_sec,speaker_id,"
        "transcription,recording_corrupt\n"
        "rec1,d1,s1,u1,2.0,zf1,contact =wien <OT>ok</OT> hm,0\n"
        "rec2,d1,s1,u2,2.0,zm2,broken file,1\n")
    # returns a (recordings, supervisions) tuple like the reference does
    _, supervisions = prepare_atcosim(tmp_path, output_dir=tmp_path / "out")
    sups = list(supervisions)
    assert len(sups) == 1  # corrupt row skipped
    assert sups[0].gender == "F" and sups[0].speaker == "zf1"
    assert "CONTACT" in sups[0].text and "<unk>" in sups[0].text  # =wien partial
    assert "HMM" in sups[0].text  # typo fix, OT markup unwrapped
    assert sups[0].custom["orig_text"].startswith("contact")


def test_prepare_grid(tmp_path):
    from lhotse_tpu.recipes import prepare_grid

    (tmp_path / "audio_25k").mkdir(parents=True)
    _wav(tmp_path / "video" / "s1" / "bbaf2n.mpg", seconds=3.0, seed=36)
    ali = tmp_path / "alignments" / "s1"
    ali.mkdir(parents=True)
    (ali / "bbaf2n.align").write_text(
        "0 500 sil\n500 1500 bin\n1500 2500 blue\n2500 3000 sil\n")
    m = prepare_grid(tmp_path, output_dir=tmp_path / "out", num_jobs=1)
    (sup,) = list(m["supervisions"])
    assert sup.text == "bin blue"  # 'sil' dropped
    assert sup.speaker == "s1"
    ali_items = sup.alignment["word"]
    assert len(ali_items) == 4 and ali_items[1].symbol == "bin"
    assert ali_items[1].start == 0.5 and ali_items[1].duration == 1.0


def test_prepare_medical(tmp_path):
    from lhotse_tpu.recipes import prepare_medical

    _wav(tmp_path / "audio" / "RES0001.mp3", seconds=10.0, seed=37)
    for part in ("test", "dev", "train"):
        (tmp_path / f"medical_{part}.info").write_text(
            "audio/RES0001.mp3,0.5[2.5,doctor hello patient]\n")
    m = prepare_medical(tmp_path, output_dir=tmp_path / "out")
    sups = list(m["train"]["supervisions"])
    assert len(sups) == 1
    assert sups[0].text == "doctor hello patient"
    assert sups[0].start == 0.5 and sups[0].duration == 2.0
    assert sups[0].recording_id == "RES0001"
    again = prepare_medical(tmp_path, output_dir=tmp_path / "out")
    assert len(list(again["train"]["supervisions"])) == 1


def test_prepare_librimix_mini(tmp_path):
    from lhotse_tpu.recipes import prepare_librimix_mini

    _wav(tmp_path / "s1" / "m1_s1.wav", seconds=4.0, seed=40)
    _wav(tmp_path / "s2" / "m1_s2.wav", seconds=4.0, seed=41)
    _wav(tmp_path / "mix" / "m1.wav", seconds=4.0, seed=42)
    _wav(tmp_path / "noise" / "m1_n.wav", seconds=4.0, seed=43)
    csv_path = tmp_path / "mixture_train_mix_both.csv"
    csv_path.write_text(
        "mixture_ID,mixture_path,source_1_path,source_2_path,noise_path,length\n"
        f"m1,{tmp_path}/mix/m1.wav,{tmp_path}/s1/m1_s1.wav,"
        f"{tmp_path}/s2/m1_s2.wav,{tmp_path}/noise/m1_n.wav,{4 * 16000}\n"
        f"short,{tmp_path}/mix/m1.wav,{tmp_path}/s1/m1_s1.wav,"
        f"{tmp_path}/s2/m1_s2.wav,{tmp_path}/noise/m1_n.wav,8000\n")
    m = prepare_librimix_mini(
        csv_path, output_dir=tmp_path / "out", with_precomputed_mixtures=True)
    assert set(m) == {"sources", "premixed", "noise"}
    srcs = list(m["sources"]["recordings"])
    assert len(srcs) == 1  # the 0.5 s row is below min_segment_seconds
    assert srcs[0].num_channels == 2
    sups = sorted(m["sources"]["supervisions"], key=lambda s: s.id)
    assert [s.channel for s in sups] == [0, 1]
    assert len(list(m["premixed"]["recordings"])) == 1


def test_prepare_librispeechmix(tmp_path):
    import json as _json
    from lhotse_tpu import CutSet, MonoCut, Recording
    from lhotse_tpu.recipes import prepare_librispeechmix

    _wav(tmp_path / "a1.wav", seconds=2.0, seed=44)
    _wav(tmp_path / "a2.wav", seconds=1.0, seed=45)
    cuts = CutSet.from_cuts([
        MonoCut(id=f"{stem}-0", start=0, duration=dur, channel=0,
                recording=Recording.from_file(tmp_path / f"{stem}.wav"))
        for stem, dur in (("a1", 2.0), ("a2", 1.0))])
    ls_root = tmp_path / "ls"
    ls_root.mkdir()
    cuts.to_file(ls_root / "librispeech_cutset_dev-clean.jsonl.gz")
    meta = tmp_path / "meta"
    meta.mkdir()
    (meta / "dev-clean-2mix.jsonl").write_text(
        _json.dumps({"id": "x/mix1", "wavs": ["w/a1.wav", "w/a2.wav"], "delays": [0.0, 0.5]})
        + "\n")
    m = prepare_librispeechmix(ls_root, meta, output_dir=tmp_path / "out")
    cutset = m["dev-clean-2mix"]["cutset"]
    (cut,) = list(cutset)
    assert cut.id == "mix1"
    assert cut.duration == 2.0  # max(2.0, 0.5 + 1.0)
    from lhotse_tpu.cut import PaddingCut
    speech_tracks = [t for t in cut.tracks if not isinstance(t.cut, PaddingCut)]
    assert len(speech_tracks) == 2
    # a2 is delayed by 0.5 s
    offsets = sorted(t.offset for t in speech_tracks)
    assert offsets == [0.0, 0.5]


def test_prepare_cmu_indic(tmp_path):
    from lhotse_tpu.recipes import prepare_cmu_indic

    pkg = tmp_path / "cmu_indic_ben_rm"
    _wav(pkg / "wav" / "ben_0001.wav", seed=46)
    _wav(pkg / "wav" / "arctic_a0001.wav", seed=47)
    (pkg / "etc").mkdir()
    (pkg / "etc" / "txt.done.data").write_text(
        '( ben_0001 "বাংলা বাক্য" )\n( arctic_a0001 "An English prompt." )\n')
    (pkg / "etc" / "voice.feats").write_text("name x\nage 34\n")
    m = prepare_cmu_indic(tmp_path, output_dir=tmp_path / "out")
    sups = sorted(m["supervisions"], key=lambda s: s.id)
    by_id = {s.id: s for s in sups}
    ben = by_id["ben_rm-ben_0001"]
    eng = by_id["ben_rm-arctic_a0001"]
    assert ben.language == "Bengali" and ben.gender == "F"
    assert ben.custom["age"] == 34
    assert eng.language == "English" and eng.custom["accent"] == "Bengali"


def test_prepare_cslu_kids(tmp_path):
    from lhotse_tpu.recipes import prepare_cslu_kids

    _wav(tmp_path / "speech" / "scripted" / "00" / "0" / "ks001" / "ks001000.wav", seed=48)
    _wav(tmp_path / "speech" / "spontaneous" / "01" / "0" / "ks002" / "ks002xx0.wav", seed=49)
    (tmp_path / "docs").mkdir(parents=True)
    (tmp_path / "docs" / "all.map").write_text('00 "the word"\n01 "ignored"\n')
    (tmp_path / "docs" / "00-verified.txt").write_text("x/ks001000.wav 1\n")
    tdir = tmp_path / "trans" / "spontaneous" / "01" / "0" / "ks002"
    tdir.mkdir(parents=True)
    (tdir / "ks002xx0.txt").write_text("hello <bn> world\n")
    m = prepare_cslu_kids(tmp_path, output_dir=tmp_path / "out")
    by_id = {s.id: s for s in m["supervisions"]}
    scripted = by_id["ks001000"]
    spont = by_id["ks002xx0"]
    assert scripted.text == "the word"
    assert scripted.custom["verification_label"] == 1
    assert spont.custom["type"] == "spontaneous"
    assert "<bn>" not in spont.text and "hello" in spont.text


def test_prepare_bengaliai_speech(tmp_path):
    from lhotse_tpu.recipes import prepare_bengaliai_speech

    _wav(tmp_path / "train_mp3s" / "u1.mp3", seed=50)
    _wav(tmp_path / "train_mp3s" / "u2.mp3", seed=51)
    _wav(tmp_path / "test_mp3s" / "t1.mp3", seed=52)
    (tmp_path / "train.csv").write_text(
        "id,sentence,split\nu1,বাংলা বাক্য,train\nu2,অন্য বাক্য,valid\n")
    m = prepare_bengaliai_speech(tmp_path, output_dir=tmp_path / "out")
    assert [s.text for s in m["train"]["supervisions"]] == ["বাংলা বাক্য"]
    assert [s.text for s in m["valid"]["supervisions"]] == ["অন্য বাক্য"]
    test_sups = list(m["test"]["supervisions"])
    assert len(test_sups) == 1 and test_sups[0].text is None
    again = prepare_bengaliai_speech(tmp_path, output_dir=tmp_path / "out")
    assert [s.text for s in again["train"]["supervisions"]] == ["বাংলা বাক্য"]


def test_prepare_but_reverb_db(tmp_path):
    from lhotse_tpu.recipes import prepare_but_reverb_db

    base = tmp_path / "Q301" / "MicID01" / "SpkID1" / "01"
    _wav(base / "RIR" / "IR_sweep.v00.wav", seed=53)
    _wav(base / "silence" / "sil.v00.wav", seconds=2.0, seed=54)
    m = prepare_but_reverb_db(tmp_path, output_dir=tmp_path / "out")
    rirs = list(m["rir"]["recordings"])
    sils = list(m["silence"]["recordings"])
    assert len(rirs) == 1 and len(sils) == 1
    assert rirs[0].id == "Q301-MicID01-SpkID1-01-vv00"


def test_prepare_himia(tmp_path):
    from lhotse_tpu.recipes import prepare_himia

    corpus = tmp_path
    # train part with SPEECHDATA/train.scp
    tr = corpus / "train" / "SPEECHDATA"
    _wav(tr / "SV0001" / "SV0001_1_01.wav", seed=55)
    tr.mkdir(parents=True, exist_ok=True)
    (tr / "train.scp").write_text("SV0001/SV0001_1_01.wav\n")
    # cw_test part
    _wav(corpus / "cw_test" / "16k_wav_file" / "CW0001_1.wav", seed=56)
    res = corpus / "cw_test" / "resource"
    res.mkdir(parents=True)
    (res / "transcription.txt").write_text("CW0001_1.wav 你好米你\n", encoding="utf-8")
    m = prepare_himia(corpus, dataset_parts=("train", "cw_test"), output_dir=tmp_path / "out")
    tr_sups = list(m["train"]["supervisions"])
    assert len(tr_sups) == 1 and tr_sups[0].text == "你好米雅"
    assert tr_sups[0].speaker == "SV0001"
    cw_sups = list(m["cw_test"]["supervisions"])
    assert len(cw_sups) == 1 and cw_sups[0].text == "你好米你"


def test_ksponspeech_normalize_and_prepare(tmp_path):
    import numpy as np
    from lhotse_tpu.recipes import prepare_ksponspeech
    from lhotse_tpu.recipes.ksponspeech import normalize

    cid, text = normalize("a/b.pcm :: o/ (7%)/(칠 퍼센트) 정도+  맞다/")
    assert cid == "a/b.pcm"
    assert text == "7% 정도 맞다"
    # synthesize a tiny PCM file and .trn table
    pcm = (np.sin(np.arange(16000) / 30.0) * 8000).astype("<i2")
    d = tmp_path / "KsponSpeech_01"
    d.mkdir()
    pcm.tofile(d / "u1.pcm")
    (tmp_path / "train.trn").write_text(
        "KsponSpeech_01/u1.pcm :: 안녕 (3)/(삼) 하세요\n", encoding="utf-8")
    m = prepare_ksponspeech(
        tmp_path, dataset_parts=["train"], output_dir=tmp_path / "out")
    sups = list(m["train"]["supervisions"])
    assert len(sups) == 1
    assert sups[0].text == "안녕 3 하세요"
    assert sups[0].language == "Korean"
    assert (d / "u1.flac").is_file()  # PCM converted in place


def test_prepare_radio(tmp_path):
    import json as _json
    from lhotse_tpu.recipes import prepare_radio
    from lhotse_tpu.audio.flacio import write_flac
    import numpy as np

    fname = "23_09_27_10h_30m_00s_s_dur30_station-xyz_lat40.1_long-3.7"
    rec_dir = tmp_path / "recos" / "recos.0"
    rec_dir.mkdir(parents=True)
    rng = np.random.RandomState(57)
    write_flac(rec_dir / f"{fname}.flac", (rng.randn(1, 32000) * 0.1).astype(np.float32), 16000)
    seg_dir = tmp_path / "segs" / "segs.0"
    seg_dir.mkdir(parents=True)
    (seg_dir / f"{fname}.json").write_text(
        _json.dumps([["male", 0.5, 1.5], ["music", 0.0, 2.0], ["female", 1.6, 1.7]]))
    m = prepare_radio(tmp_path, output_dir=tmp_path / "out", num_jobs=1)
    sups = list(m["supervisions"])
    assert len(sups) == 1  # music dropped; 0.1s female below min duration
    assert sups[0].custom["est_gender"] == "male"
    assert sups[0].custom["lat"] == 40.1 and sups[0].custom["lon"] == -3.7
    assert sups[0].custom["station"] == "station-xyz"
    assert len(list(m["recordings"])) == 1


def test_reazonspeech_normalize_and_prepare(tmp_path):
    import json as _json
    from lhotse_tpu.recipes import prepare_reazonspeech
    from lhotse_tpu.recipes.reazonspeech import normalize

    out = normalize("１２３、こんにちは。")
    assert "、" not in out and "。" not in out
    assert out.startswith("百二十三")
    _wav(tmp_path / "u0.wav", seed=58)
    items = [
        {"id": str(i), "audio_filepath": str(tmp_path / "u0.wav"),
         "text": "こんにちは", "duration": 1.0}
        for i in range(1105)]
    (tmp_path / "dataset.json").write_text(_json.dumps(items), encoding="utf-8")
    m = prepare_reazonspeech(tmp_path, output_dir=tmp_path / "out")
    assert len(list(m["dev"]["recordings"])) == 1000
    assert len(list(m["test"]["recordings"])) == 100
    assert len(list(m["train"]["recordings"])) == 5
    assert len(list(m["train"]["cuts"])) == 5
    # A cached re-run must return the cuts manifest too (the reference's
    # default read_manifests_if_cached types silently drop it).
    again = prepare_reazonspeech(tmp_path, output_dir=tmp_path / "out")
    assert len(list(again["train"]["cuts"])) == 5
    assert len(list(again["dev"]["recordings"])) == 1000


def test_prepare_icmcasr(tmp_path):
    from lhotse_tpu.recipes import prepare_icmcasr

    section = tmp_path / "train" / "S01"
    _wav(section / "DA01.wav", seconds=5.0, seed=59)
    section.mkdir(parents=True, exist_ok=True)
    (section / "DA01.TextGrid").write_text(
        'File type = "ooTextFile"\n'
        'Object class = "TextGrid"\n'
        "xmin = 0\nxmax = 5\ntiers? <exists>\nsize = 1\nitem []:\n"
        "    item [1]:\n"
        '        class = "IntervalTier"\n'
        '        name = "spk001"\n'
        "        xmin = 0\nxmax = 5\nintervals: size = 2\n"
        "        intervals [1]:\n"
        "            xmin = 0.0\nxmax = 1.0\n"
        '            text = ""\n'
        "        intervals [2]:\n"
        "            xmin = 1.0\nxmax = 2.5\n"
        '            text = "你好 世界"\n')
    (tmp_path / "dev").mkdir()
    m = prepare_icmcasr(tmp_path, output_dir=tmp_path / "out", mic="ihm")
    sups = list(m["train"]["supervisions"])
    assert len(sups) == 1
    assert sups[0].speaker == "spk001"
    assert sups[0].start == 1.0 and sups[0].duration == 1.5
    assert "你好" in sups[0].text
    again = prepare_icmcasr(tmp_path, output_dir=tmp_path / "out", mic="ihm")
    assert len(list(again["train"]["supervisions"])) == 1


def _flac(path, seconds=1.0, sr=16000, seed=0, channels=1):
    from lhotse_tpu.audio.flacio import write_flac

    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    write_flac(path, (rng.randn(channels, int(seconds * sr)) * 0.1).astype(np.float32), sr)


def test_prepare_mtedx_single_language(tmp_path):
    from lhotse_tpu.recipes.mtedx import prepare_single_mtedx_language

    root = tmp_path / "es-es"
    for split in ("train", "valid", "test"):
        _flac(root / "data" / split / "wav" / f"talk_{split}.flac", seconds=30.0, seed=60)
        vtt = root / "data" / split / "vtt"
        vtt.mkdir(parents=True)
        (vtt / f"talk_{split}.es.vtt").write_text(
            "WEBVTT\n\n"
            "1\n00:00:01.000 --> 00:00:03.000\nHola, (Risas) Mundo!\n\n"
            "2\n00:00:04.000 --> 00:00:06.000\n- Buenos dias\n")
    m = prepare_single_mtedx_language(root, output_dir=tmp_path / "out", language="es")
    sups = sorted(m["train"]["supervisions"], key=lambda s: s.start)
    # the cue with an interior (Risas) noise span is dropped (reference behavior)
    assert len(sups) == 1
    assert sups[0].start == 4.0 and sups[0].duration == 2.0
    assert sups[0].text == "buenos dias"  # '-' stripped, lowercased
    assert sups[0].language == "es"


def test_prepare_must_c(tmp_path):
    from lhotse_tpu.recipes import prepare_must_c

    data = tmp_path / "en-de" / "data"
    for split in ("dev", "tst-COMMON", "tst-HE", "train"):
        _wav(data / split / "wav" / "ted_767.wav", seconds=30.0, seed=61)
        txt = data / split / "txt"
        txt.mkdir(parents=True)
        (txt / f"{split}.yaml").write_text(
            "- {duration: 3.5, offset: 16.08, speaker_id: spk.767, wav: ted_767.wav}\n"
            "- {duration: 2.0, offset: 20.0, speaker_id: spk.767, wav: ted_767.wav}\n")
        (txt / f"{split}.de").write_text("Hallo Welt\nZweiter Satz\n")
    m = prepare_must_c(tmp_path, tmp_path / "out", tgt_lang="de")
    sups = sorted(m["train"]["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2
    assert sups[0].text == "Hallo Welt" and sups[0].start == 16.08
    assert sups[0].speaker == "spk.767" and sups[0].language == "de"


def test_prepare_iwslt22_ta(tmp_path):
    from lhotse_tpu.recipes import prepare_iwslt22_ta

    corpus = tmp_path / "ldc"
    splits = tmp_path / "splits"
    splits.mkdir()
    fname = "20170101_120000_12345_A"
    _wav(corpus / "data" / "audio" / "ta" / f"{fname}.sph", seconds=30.0, sr=8000, seed=62)
    tdir = corpus / "data" / "transcripts" / "ta"
    tdir.mkdir(parents=True)
    (tdir / f"{fname}.ta.tsv").write_text(
        "1.0\t2.5\tspkA\tO/ kalam tounsi?\n"
        "3.0\t4.0\tspkA\texcluded line\n")
    xdir = corpus / "data" / "translations" / "ta"
    xdir.mkdir(parents=True)
    (xdir / f"{fname}.eng.tsv").write_text(
        "1.0\t2.5\tspkA\tTunisian Words!\n"
        "3.0\t4.0\tspkA\tdropped.\n")
    (splits / "train.file_id.txt").write_text(f"{fname}\n")
    (splits / "dev.file_id.txt").write_text("")
    (splits / "test1.file_id.txt").write_text("")
    (splits / "exclude-utterance.txt").write_text(f"{fname} 3.0 4.0\n")
    m = prepare_iwslt22_ta(corpus, splits, output_dir=tmp_path / "out")
    sups = list(m["train"]["supervisions"])
    assert len(sups) == 1  # excluded utterance dropped
    assert sups[0].text == " kalam tounsi"  # markers filtered
    assert sups[0].custom["translated_text"]["eng"] == "tunisian words"
    assert sups[0].language == "ta"


def test_prepare_emilia(tmp_path):
    import json as _json
    from lhotse_tpu.recipes import prepare_emilia

    data = tmp_path / "raw" / "DE"
    _wav(data / "DE_B00000" / "DE_B00000_S00000" / "mp3" / "DE_B00000_S00000_W000029.mp3",
         seed=63)
    data.mkdir(parents=True, exist_ok=True)
    (data / "DE_B00000.jsonl").write_text(
        _json.dumps({
            "id": "DE_B00000_S00000_W000029",
            "wav": "DE_B00000/DE_B00000_S00000/mp3/DE_B00000_S00000_W000029.mp3",
            "text": " Und es gibt auch einen Stadtplan.", "duration": 1.0,
            "speaker": "DE_B00000_S00000", "language": "de", "dnsmos": 3.37}) + "\n")
    cuts = prepare_emilia(tmp_path, lang="de", num_jobs=1, output_dir=tmp_path / "out")
    (cut,) = list(cuts)
    assert cut.supervisions[0].language == "de"
    assert cut.supervisions[0].custom["dnsmos"] == pytest.approx(3.37)
    with pytest.raises(ValueError):
        prepare_emilia(tmp_path, lang="xx", num_jobs=1)


def test_prepare_gigaspeech2(tmp_path):
    from lhotse_tpu.recipes import prepare_gigaspeech2

    lang_dir = tmp_path / "data" / "th"
    _wav(lang_dir / "dev" / "0" / "12" / "0-12-3.wav", seed=64)
    lang_dir.mkdir(parents=True, exist_ok=True)
    (lang_dir / "dev.tsv").write_text("0-12-3\tสวัสดี\n")
    m = prepare_gigaspeech2(tmp_path, output_dir=tmp_path / "out")
    sups = list(m["th"]["dev"]["supervisions"])
    assert len(sups) == 1
    assert sups[0].text == "สวัสดี" and sups[0].language == "th"


def test_prepare_bvcc(tmp_path):
    from lhotse_tpu.recipes import prepare_bvcc

    for track in ("main", "ood"):
        root = tmp_path / f"phase1-{track}" / "DATA"
        _wav(root / "wav" / f"sys1-utt_{track}.wav", seed=65)
        _wav(root / "wav" / f"sys1-test_{track}.wav", seed=66)
        sets = root / "sets"
        sets.mkdir(parents=True)
        info = ("{}_20-29_L001_Male_x_x_No" if track == "main" else "{}_na_L001_na_na_na_EE")
        row = f"sys1,sys1-utt_{track}.wav,4,0,{info}\n"
        (sets / "TRAINSET").write_text(row)
        (sets / "DEVSET").write_text(row)
        (sets / "test.scp").write_text(f"sys1-test_{track}.wav\n")
        if track == "ood":
            (sets / "unlabeled_mos_list.txt").write_text(f"sys1-test_{track}.wav\n")
    m = prepare_bvcc(tmp_path, output_dir=tmp_path / "out")
    assert set(m) == {
        "main1_dev", "main1_train", "main1_test", "ood1_dev", "ood1_train",
        "ood1_test", "ood1_unlabeled"}
    (sup,) = list(m["main1_train"]["supervisions"])
    assert sup.custom["MOS"] == {"L001": 4}
    assert sup.custom["listeners"]["L001"]["M_F"] == "M"
    assert "supervisions" not in m["main1_test"]


def test_prepare_notsofar1(tmp_path):
    import json as _json
    from lhotse_tpu.recipes import prepare_notsofar1

    mtg = tmp_path / "benchmark-datasets" / "dev_set" / "v1" / "MTG" / "MTG001"
    _wav(mtg / "sc_dev1" / "ch0.wav", seconds=10.0, seed=67)
    _wav(mtg / "mc_dev2" / "ch0.wav", seconds=10.0, seed=68)
    _wav(mtg / "mc_dev2" / "ch1.wav", seconds=10.0, seed=69)
    _wav(mtg / "close_talk" / "CT_1.wav", seconds=10.0, seed=70)
    (mtg / "gt_transcription.json").write_text(_json.dumps([
        {"speaker_id": "Alice", "start_time": 1.0, "end_time": 2.5,
         "text": "hello meeting",
         "word_timing": [["hello", 1.0, 1.5], ["<eh>", 1.5, 1.6], ["meeting", 1.6, 2.5]]},
    ]))
    (mtg / "gt_meeting_metadata.json").write_text(_json.dumps(
        {"ParticipantAliasToCtDevice": {"Alice": "CT_1"}}))
    m = prepare_notsofar1(tmp_path, output_dir=tmp_path / "out")
    dev = m["dev_set"]["v1"]
    sc_sups = list(dev["single_channel"]["supervisions"])
    assert len(sc_sups) == 1 and sc_sups[0].speaker == "Alice"
    assert [a.symbol for a in sc_sups[0].alignment["word"]] == ["hello", "meeting"]
    mc_recs = list(dev["multi_channel"]["recordings"])
    assert mc_recs[0].num_channels == 2
    ihm_sups = list(dev["close_talk"]["supervisions"])
    assert len(ihm_sups) == 1 and ihm_sups[0].recording_id == "MTG001_close_talk_CT_1"


def test_csj_sdb_parser():
    from lhotse_tpu.recipes.csj import CSJSDBParser

    parser = CSJSDBParser()
    # F-tag resolves to the left (disfluent) choice
    out = parser.parse("(F_えー)+感動詞+(F_エー) それ+代名詞+ソレ", sep="")
    assert out == "えーそれ"
    # W-tag (mispronunciation) resolves to the right (corrected) choice
    out = parser.parse("(W_アタシ;ワタシ)+代名詞+X", sep="")
    assert out == "ワタシ"
    # with_tags yields per-character tag labels
    pairs = parser.parse("(F_えー)+感動詞+X それ+代名詞+X", sep="", with_tags=True)
    chars, tags = zip(*pairs)
    assert "".join(chars) == "えーそれ"
    assert tags[0] == "F" and tags[-1] == ""


def test_prepare_csj(tmp_path):
    from lhotse_tpu.recipes import prepare_csj

    vol = tmp_path / "MORPH" / "SDB" / "core"
    vol.mkdir(parents=True)
    wav_dir = tmp_path / "WAV" / "core"
    _wav(wav_dir / "A01M0007.wav", seconds=10.0, seed=71)

    def sdb_row(sgid, start, end, surface, pron, spkid="A01M0007"):
        cols = [""] * 17
        cols[0] = "0001"
        cols[1] = "x"
        cols[2] = spkid
        cols[3] = f"{sgid} {start}-{end} L:x"
        cols[5] = surface
        cols[10] = pron
        cols[11] = "感動詞"
        return "\t".join(cols)

    (vol / "A01M0007.sdb").write_text(
        sdb_row("0001", "0.5", "1.2", "(F_えー)", "(F_エー)") + "\n"
        + sdb_row("0001", "0.5", "1.2", "それ", "ソレ") + "\n"
        + sdb_row("0002", "2.0", "3.0", "はい", "ハイ") + "\n",
        encoding="shift_jis")
    m = prepare_csj(tmp_path, dataset_parts=["core"], manifest_dir=tmp_path / "out")
    sups = sorted(m["core"]["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2
    assert sups[0].text == "えーそれ"
    assert sups[0].custom["disfluent_tag"].startswith("F,F")
    assert sups[0].gender == "Male"
    assert sups[1].text == "はい"


def test_prepare_nsc_part3(tmp_path):
    from lhotse_tpu.recipes import prepare_nsc

    root = tmp_path / "IMDA - National Speech Corpus" / "PART3"
    _wav(root / "Audio Same CloseMic" / "conf_0001.wav", seconds=10.0, seed=72)
    scripts = root / "Scripts Same"
    scripts.mkdir(parents=True)
    (scripts / "conf_0001.TextGrid").write_text(
        'File type = "ooTextFile"\nObject class = "TextGrid"\n'
        "xmin = 0\nxmax = 10\ntiers? <exists>\nsize = 1\nitem []:\n"
        "    item [1]:\n"
        '        class = "IntervalTier"\n'
        '        name = "conf_0001"\n'
        "        xmin = 0\nxmax = 10\nintervals: size = 3\n"
        "        intervals [1]:\n            xmin = 0.0\n            xmax = 1.0\n"
        '            text = "<S>"\n'
        "        intervals [2]:\n            xmin = 1.0\n            xmax = 3.0\n"
        '            text = "lah okay can"\n'
        "        intervals [3]:\n            xmin = 3.0\n            xmax = 10.0\n"
        '            text = "<Z>"\n')
    m = prepare_nsc(
        tmp_path, dataset_part="PART3_SameCloseMic", output_dir=tmp_path / "out")
    sups = list(m["supervisions"])
    assert len(sups) == 1  # <S>/<Z> silences skipped
    assert sups[0].text == "lah okay can"
    assert sups[0].language == "Singaporean English"
    assert sups[0].recording_id == "PART3_SameCloseMic_conf_0001"


def test_sbcsae_parse_raw_transcript():
    from lhotse_tpu.recipes.sbcsae import _parse_raw_transcript

    text, tag = _parse_raw_transcript("... And then [2he said2],")
    assert text == "And then he said,"
    assert tag == ""
    text, tag = _parse_raw_transcript("you know @ @@ what X .")
    assert "<LAUGH>" in text and "<UNK>" in text
    text, tag = _parse_raw_transcript("he said <L2 hola L2> there")
    assert tag == "clr"


def test_prepare_sbcsae(tmp_path):
    from lhotse_tpu.recipes import prepare_sbcsae

    corpus = tmp_path / "SBCSAE"
    _wav(corpus / "WAV" / "SBC001.wav", seconds=30.0, seed=73, channels=2)
    trn = corpus / "TRN"
    trn.mkdir(parents=True)
    (trn / "SBC001.trn").write_text(
        "1.00 3.50\tLENORE:\t... So you don't need to go borrow equipment,\n"
        "3.50 4.20\t\t.. from anybody.\n"
        "4.20 5.00\t>ENV:\t((DOOR))\n")
    for part in ("Part_1", "Part_2", "Part_3", "Part_4"):
        d = corpus / "docs" / part
        d.mkdir(parents=True)
        if part == "Part_1":
            (d / "segment.tbl").write_text("sbc001 speaker:\t0001 LENORE\n")
            (d / "speaker.tbl").write_text("0001,Lenore,F,x,Walnut Cre CA,CA\n")
        else:
            (d / "segment.tbl").write_text("")
            (d / "speaker.tbl").write_text("")
    m = prepare_sbcsae(corpus, output_dir=tmp_path / "out", omit_realignments=True)
    sups = sorted(m["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2  # the >ENV line is dropped
    assert sups[0].speaker == "0001_LENORE" and sups[0].gender == "F"
    assert sups[1].speaker == "0001_LENORE"  # speaker buffer carried over
    assert "borrow equipment" in sups[0].text
