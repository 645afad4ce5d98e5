"""Tranche-2 recipe prepare_* functions on synthesized corpus trees."""
import gzip
import json

import numpy as np
import pytest

from lhotse_tpu.audio.flacio import write_flac
from lhotse_tpu.audio.wavio import write_wav


def _wav(path, seconds=1.0, sr=16000, seed=0, channels=1):
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    write_wav(path, (rng.randn(channels, int(seconds * sr)) * 0.1).astype(np.float32), sr)


def _flac(path, seconds=1.0, sr=16000, seed=0, channels=1):
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    write_flac(path, (rng.randn(channels, int(seconds * sr)) * 0.1).astype(np.float32), sr)


def test_prepare_cmu_arctic(tmp_path):
    from lhotse_tpu.recipes import prepare_cmu_arctic

    pkg = tmp_path / "cmu_us_bdl_arctic"
    _wav(pkg / "wav" / "arctic_a0001.wav", seed=1)
    _wav(pkg / "wav" / "arctic_a0002.wav", seed=2)
    (pkg / "etc").mkdir()
    (pkg / "etc" / "txt.done.data").write_text(
        '( arctic_a0001 "Author of the danger trail." )\n'
        '( arctic_a0002 "Philip Steels etc." )\n'
    )
    m = prepare_cmu_arctic(tmp_path, output_dir=tmp_path / "out")
    sups = sorted(m["supervisions"], key=lambda s: s.id)
    assert len(sups) == 2
    assert sups[0].id == "bdl-arctic_a0001"
    assert sups[0].text == "Author of the danger trail."
    assert sups[0].speaker == "bdl" and sups[0].gender == "male"


def test_prepare_l2_arctic(tmp_path):
    from lhotse_tpu.recipes import prepare_l2_arctic

    spk = tmp_path / "aba"
    _wav(spk / "wav" / "arctic_a0001.wav", seed=3)
    (spk / "transcript").mkdir()
    (spk / "transcript" / "arctic_a0001.txt").write_text("Author of the danger trail.")
    _wav(tmp_path / "suitcase_corpus" / "wav" / "aba.wav", seed=4)
    (tmp_path / "suitcase_corpus" / "transcript").mkdir(parents=True)
    (tmp_path / "suitcase_corpus" / "transcript" / "aba.txt").write_text("free talk")
    m = prepare_l2_arctic(tmp_path, output_dir=tmp_path / "out")
    read = list(m["read"]["supervisions"])
    suitcase = list(m["suitcase"]["supervisions"])
    assert len(read) == 1 and read[0].id == "aba-arctic_a0001"
    assert read[0].custom["accent"] == "Arabic"
    assert len(suitcase) == 1 and suitcase[0].text == "free talk"


def test_prepare_cmu_kids(tmp_path):
    from lhotse_tpu.recipes import prepare_cmu_kids

    tables = tmp_path / "cmu_kids" / "tables"
    tables.mkdir(parents=True)
    (tables / "sentence.tbl").write_text("ab1\t5\tThe dog ran away.\n")
    (tables / "speaker.tbl").write_text("header1\nheader2\n" "fabc\tSUM96\t3/9\tx\ty\n")
    (tables / "transcrp.tbl").write_text("fabcab11 the dog ran away\n")
    _wav(tmp_path / "cmu_kids" / "kids" / "fabc" / "signal" / "fabcab11.sph", seed=5)
    m = prepare_cmu_kids(tmp_path, output_dir=tmp_path / "out")
    (sup,) = list(m["supervisions"])
    assert sup.text == "The dog ran away."
    assert sup.gender == "Female" and sup.speaker == "fabc"
    assert sup.custom["bin"] == 1 and sup.custom["speaker_age"] == 9


def test_prepare_audio_mnist(tmp_path):
    from lhotse_tpu.recipes import prepare_audio_mnist

    data = tmp_path / "data"
    (data).mkdir(parents=True)
    meta = {"01": {"age": 30, "gender": "male", "accent": "german"}}
    (data / "audioMNIST_meta.txt").write_text(json.dumps(meta))
    _wav(data / "01" / "0_01_0.wav", sr=48000, seed=6)
    m = prepare_audio_mnist(tmp_path, output_dir=tmp_path / "out")
    (sup,) = list(m["supervisions"])
    assert sup.text == "zero"
    assert sup.custom["gender"] == "male"


def test_prepare_heroico(tmp_path):
    from lhotse_tpu.recipes import prepare_heroico

    speech = tmp_path / "speech"
    trans = tmp_path / "transcripts"
    trans.mkdir()
    _wav(speech / "Answers_Spanish" / "1" / "7.wav", seed=7)
    _wav(speech / "Recordings_Spanish" / "1" / "100.wav", seed=8)
    _wav(speech / "Recordings_Spanish" / "1" / "400.wav", seed=9)
    _wav(speech / "usma" / "native-f-maria" / "s3.wav", seed=10)
    (trans / "heroico-answers.txt").write_text("1/7\thola amigo\n", encoding="iso-8859-1")
    (trans / "heroico-recordings.txt").write_text(
        "100\tbuenos dias\n400\trepeticion\n", encoding="iso-8859-1")
    (trans / "usma-prompts.txt").write_text("s3\tcomo estas\n", encoding="iso-8859-1")
    m = prepare_heroico(speech, trans, output_dir=tmp_path / "out")
    assert {s.text for s in m["train"]["supervisions"]} == {"hola amigo", "buenos dias"}
    assert [s.text for s in m["devtest"]["supervisions"]] == ["repeticion"]
    assert [s.text for s in m["test"]["supervisions"]] == ["como estas"]


def test_prepare_daily_talk(tmp_path):
    from lhotse_tpu.recipes import prepare_daily_talk

    _wav(tmp_path / "data" / "0" / "0_0_d0.wav", seed=11)
    _wav(tmp_path / "data" / "0" / "1_1_d0.wav", seed=12)
    meta = {
        "0": {
            "0": {"index": 0, "text": "hi there", "speaker": 0,
                  "turn": 0, "topic": "greeting", "emotion": "none", "act": "inform"},
            "1": {"index": 1, "text": "hello", "speaker": 1,
                  "turn": 1, "topic": "greeting", "emotion": "none", "act": "inform"},
        }
    }
    (tmp_path / "metadata.json").write_text(json.dumps(meta))
    recordings, supervisions = prepare_daily_talk(tmp_path, output_dir=tmp_path / "out")
    assert len(recordings) == 2
    sups = sorted(supervisions, key=lambda s: s.id)
    assert sups[0].text == "hi there" and sups[0].speaker == "dailytalk_spk0"
    assert sups[1].custom["turn"] == 1


def test_prepare_speechcommands(tmp_path):
    from lhotse_tpu.recipes import prepare_speechcommands

    main = tmp_path / "speech_commands_v0.02"
    _wav(main / "yes" / "aaa_nohash_0.wav", seed=13)
    _wav(main / "yes" / "bbb_nohash_0.wav", seed=14)
    _wav(main / "no" / "ccc_nohash_0.wav", seed=15)
    _wav(main / "_background_noise_" / "running_tap.wav", seed=16)
    (main / "validation_list.txt").write_text("yes/bbb_nohash_0.wav\n")
    (main / "testing_list.txt").write_text("no/ccc_nohash_0.wav\n")
    test_root = tmp_path / "speech_commands_test_set_v0.02"
    _wav(test_root / "yes" / "ddd_nohash_0.wav", seed=17)
    # The official test archive flattens non-core words under _unknown_ and
    # ships silence clips under _silence_ (reference: speechcommands.py:283-298).
    _wav(test_root / "_unknown_" / "bed_0c40e715_nohash_0.wav", seed=18)
    _wav(test_root / "_silence_" / "running_tap_0.wav", seed=19)
    m = prepare_speechcommands("2", tmp_path, output_dir=tmp_path / "out")
    train_ids = {s.id for s in m["train"]["supervisions"]}
    assert train_ids == {"yes_aaa_nohash_0"}
    valid = sorted(m["valid"]["supervisions"], key=lambda s: s.id)
    assert {s.id for s in valid} == {"yes_bbb_nohash_0", "_background_noise__running_tap"}
    test_sups = {s.id: s for s in m["test"]["supervisions"]}
    assert test_sups["yes_ddd_nohash_0"].text == "yes"
    assert test_sups["yes_ddd_nohash_0"].speaker == "ddd"
    assert test_sups["_unknown__bed_0c40e715_nohash_0"].text == "bed"
    assert test_sups["_unknown__bed_0c40e715_nohash_0"].speaker == "0c40e715"
    assert test_sups["_silence__running_tap_0"].text == ""
    assert test_sups["_silence__running_tap_0"].speaker is None


def test_prepare_chime6_mdm(tmp_path):
    from lhotse_tpu.recipes import prepare_chime6

    for session, seed in (("S02", 20), ("S09", 21)):
        for ch in (1, 2):
            _wav(
                tmp_path / "audio" / "dev" / f"{session}_U01.CH{ch}.wav", seconds=2.0,
                seed=seed + ch)
        segs = [
            {"start_time": "00:00:00.200", "end_time": "00:00:01.000", "speaker": "P05", "words": "hello there", "location": "kitchen"},
            {"start_time": "00:00:01.000", "end_time": "00:00:01.000", "speaker": "P05", "words": "zero duration dropped"},
        ]
        tdir = tmp_path / "transcriptions" / "dev"
        tdir.mkdir(parents=True, exist_ok=True)
        (tdir / f"{session}.json").write_text(json.dumps(segs))
    # normalize_text defaults to "kaldi" (reference parity); pin "upper" here.
    m = prepare_chime6(
        tmp_path, output_dir=tmp_path / "out", dataset_parts="dev", normalize_text="upper")
    recs = m["dev"]["recordings"]
    assert len(recs) == 2 and recs["S02"].num_channels == 2
    sups = list(m["dev"]["supervisions"])
    assert len(sups) == 2  # zero-duration rows dropped
    assert sups[0].text == "HELLO THERE"
    assert sups[0].custom["location"] == "kitchen"


def test_prepare_dipco_ihm(tmp_path):
    from lhotse_tpu.recipes import prepare_dipco
    from lhotse_tpu.recipes.dipco import SESSIONS

    seed = 30
    for part, sessions in SESSIONS.items():
        for session in sessions:
            seed += 1
            _wav(tmp_path / "audio" / part / f"{session}_P01.wav", seconds=2.0, seed=seed)
            segs = [{
                "speaker_id": "P01",
                "start_time": {"close-talk": "00:00:00.25"},
                "end_time": {"close-talk": "00:00:01.25"},
                "words": "pass the salt",
                "gender": "female",
                "nativeness": "native",
                "mother_tongue": "English",
            }]
            tdir = tmp_path / "transcriptions" / part
            tdir.mkdir(parents=True, exist_ok=True)
            (tdir / f"{session}.json").write_text(json.dumps(segs))
    m = prepare_dipco(tmp_path, output_dir=tmp_path / "out", mic="ihm")
    assert len(m["dev"]["recordings"]) == 5
    sup = next(iter(m["dev"]["supervisions"]))
    assert sup.start == 0.25 and abs(sup.duration - 1.0) < 1e-6
    assert sup.custom["nativeness"] == "native"


def test_prepare_dihard3(tmp_path):
    from lhotse_tpu.recipes import prepare_dihard3

    dev = tmp_path / "dev"
    _flac(dev / "data" / "DH_DEV_0001.flac", seconds=2.0, seed=40)
    (dev / "docs").mkdir(parents=True)
    (dev / "docs" / "recordings.tbl").write_text(
        "id\tin_core\tlang\tdomain\tsource\n"
        "DH_DEV_0001\tTrue\teng\tbroadcast_interview\tyoutube\n"
    )
    (dev / "data" / "DH_DEV_0001.rttm").write_text(
        "SPEAKER DH_DEV_0001 1 0.10 0.80 <NA> <NA> spkA <NA> <NA>\n"
    )
    (dev / "data" / "DH_DEV_0001.uem").write_text("DH_DEV_0001 1 0.00 2.00\n")
    m = prepare_dihard3(dev_audio_dir=dev, output_dir=tmp_path / "out")
    sups = list(m["dev"]["supervisions"])
    assert len(sups) == 1 and sups[0].speaker == "spkA"
    assert sups[0].custom["domain"] == "broadcast_interview"
    assert len(m["dev"]["uem"]) == 1


def test_prepare_librilight(tmp_path):
    from lhotse_tpu.recipes import prepare_librilight

    flac = tmp_path / "small" / "100" / "book1" / "chapter1.flac"
    _flac(flac, seconds=2.0, seed=41)
    flac.with_suffix(".json").write_text(
        json.dumps({"speaker": "100", "voice_activity": [[0.1, 0.9], [1.2, 1.8]]})
    )
    m = prepare_librilight(tmp_path, output_dir=tmp_path / "out")
    sups = sorted(m["small"]["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2 and sups[0].speaker == "100"
    assert abs(sups[1].start - 1.2) < 1e-6


def test_prepare_rir_noise(tmp_path):
    from lhotse_tpu.recipes import prepare_rir_noise

    root = tmp_path / "RIRS_NOISES"
    _wav(root / "pointsource_noises" / "noise-1.wav", seed=42)
    _wav(root / "real_rirs_isotropic_noises" / "RWCP_type4_rir_cirline.wav", seed=43)
    _wav(root / "real_rirs_isotropic_noises" / "RVB2014_type1_noise_largeroom1_1.wav", seed=44)
    _wav(root / "simulated_rirs" / "smallroom" / "Room001" / "Room001-00001.wav", seed=45)
    m = prepare_rir_noise(root, output_dir=tmp_path / "out")
    assert len(m["point_noise"]["recordings"]) == 1
    assert len(m["real_rir"]["recordings"]) == 1
    assert len(m["iso_noise"]["recordings"]) == 1
    assert len(m["sim_rir"]["recordings"]) == 1


def test_prepare_voxconverse(tmp_path):
    from lhotse_tpu.recipes import prepare_voxconverse

    for split, name, seed in (("dev", "abc", 50), ("test", "xyz", 51)):
        _wav(tmp_path / split / f"{name}.wav", seconds=2.0, seed=seed)
        (tmp_path / split / f"{name}.rttm").write_text(
            f"SPEAKER {name} 1 0.20 1.00 <NA> <NA> spk00 <NA> <NA>\n"
        )
    m = prepare_voxconverse(tmp_path, output_dir=tmp_path / "out")
    assert set(m) == {"dev", "test"}
    (sup,) = list(m["dev"]["supervisions"])
    assert sup.speaker == "spk00" and sup.start == 0.2


def test_prepare_aishell2(tmp_path):
    from lhotse_tpu.recipes import prepare_aishell2

    ios = tmp_path / "AISHELL-2" / "iOS"
    for part, root_name, seed in (("train", "data", 60), ("dev", "dev", 61), ("test", "test", 62)):
        root = ios / root_name
        utt = f"I{part}0001W0001"
        _wav(root / "wav" / f"S{seed}" / f"{utt}.wav", seed=seed)
        root.mkdir(parents=True, exist_ok=True)
        (root / "trans.txt").write_text(f"{utt}\t你好 世界\n")
    m = prepare_aishell2(tmp_path, output_dir=tmp_path / "out")
    assert set(m) == {"train", "dev", "test"}
    (sup,) = list(m["train"]["supervisions"])
    assert sup.speaker == "S60" and "你好" in sup.text


def test_prepare_aishell3(tmp_path):
    from lhotse_tpu.recipes import prepare_aishell3

    (tmp_path / "spk-info.txt").write_text("# header\nSSB0005\tA\tfemale\tnorth\n")
    (tmp_path / "train").mkdir()
    (tmp_path / "train" / "label_train-set.txt").write_text("#\nSSB00050001|ni2 hao3|你好\n")
    _wav(tmp_path / "train" / "wav" / "SSB0005" / "SSB00050001.wav", sr=44100, seed=63)
    (tmp_path / "train" / "content.txt").write_text("SSB00050001.wav\t你 ni2 好 hao3\n")
    _wav(tmp_path / "test" / "wav" / "SSB0005" / "SSB00050002.wav", sr=44100, seed=64)
    (tmp_path / "test" / "content.txt").write_text("SSB00050002.wav\t世 shi4 界 jie4\n")
    m = prepare_aishell3(tmp_path, output_dir=tmp_path / "out")
    (sup,) = list(m["train"]["supervisions"])
    assert sup.text == "你好" and sup.custom["pinyin"] == "ni2 hao3"
    assert sup.gender == "female"
    assert sup.custom["tones_pinyin"] == "ni2 hao3"
    (sup_t,) = list(m["test"]["supervisions"])
    assert sup_t.text == "世界"


def test_prepare_mobvoihotwords(tmp_path):
    from lhotse_tpu.recipes import prepare_mobvoihotwords

    data = tmp_path / "mobvoi_hotword_dataset"
    res = tmp_path / "mobvoi_hotword_dataset_resources"
    res.mkdir(parents=True)
    k = 0
    for part in ("train", "dev", "test"):
        for polarity, kw in (("p", 0), ("n", -1)):
            utt = f"utt{k}"
            k += 1
            _wav(data / f"{utt}.wav", seed=70 + k)
            (res / f"{polarity}_{part}.json").write_text(
                json.dumps([{"utt_id": utt, "speaker_id": f"spk{k}", "keyword_id": kw}])
            )
    m = prepare_mobvoihotwords(tmp_path, output_dir=tmp_path / "out")
    assert set(m) == {"train", "dev", "test"}
    texts = {s.text for s in m["train"]["supervisions"]}
    assert "HiXiaowen" in texts or "FREETEXT" in texts
    assert len(m["train"]["supervisions"]) == 2


_TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 2
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "{tier}"
        xmin = 0
        xmax = 2
        intervals: size = 2
        intervals [1]:
            xmin = 0.25
            xmax = 1.0
            text = "你好"
        intervals [2]:
            xmin = 1.0
            xmax = 2.0
            text = ""
"""


def test_prepare_ali_meeting_far(tmp_path):
    from lhotse_tpu.recipes import prepare_ali_meeting

    base = tmp_path / "Train_Ali_far"
    _wav(base / "audio_dir" / "R0001_M0001.wav", seconds=2.0, seed=80, channels=8)
    (base / "textgrid_dir").mkdir(parents=True)
    (base / "textgrid_dir" / "R0001_M0001.TextGrid").write_text(_TEXTGRID.format(tier="F_SPK0093"))
    m = prepare_ali_meeting(tmp_path, output_dir=tmp_path / "out", mic="far")
    (sup,) = list(m["train"]["supervisions"])
    assert sup.speaker == "0093" and sup.gender == "F"
    assert sup.text == "你好" and sup.start == 0.25


def test_prepare_aishell4(tmp_path):
    from lhotse_tpu.recipes import prepare_aishell4

    _flac(tmp_path / "test" / "wav" / "L_R001S01C01.flac", seconds=2.0, seed=81)
    (tmp_path / "test" / "TextGrid").mkdir(parents=True)
    (tmp_path / "test" / "TextGrid" / "L_R001S01C01.TextGrid").write_text(
        _TEXTGRID.format(tier="1")
    )
    m = prepare_aishell4(tmp_path, output_dir=tmp_path / "out")
    (sup,) = list(m["test"]["supervisions"])
    assert sup.speaker == "SPK0001" and sup.text == "你好"


def test_prepare_tedlium2(tmp_path):
    from lhotse_tpu.recipes import prepare_tedlium2

    for part in ("train", "dev", "test"):
        root = tmp_path / part
        _wav(root / "sph" / "TalkA.sph", seconds=3.0, seed=82)
        (root / "stm").mkdir(parents=True)
        (root / "stm" / "TalkA.stm").write_text(
            "TalkA 1 TalkA_spk 0.00 2.50 <o,f0,male> hello world\n"
        )
    m = prepare_tedlium2(tmp_path, output_dir=tmp_path / "out")
    assert set(m) == {"train", "dev", "test"}
    (sup,) = list(m["train"]["supervisions"])
    assert sup.text == "hello world" and sup.duration == 2.5


def test_prepare_earnings21(tmp_path):
    from lhotse_tpu.recipes import prepare_earnings21

    _wav(tmp_path / "media" / "4320211.mp3", seconds=2.0, seed=83)
    nlp = tmp_path / "transcripts" / "nlp_references"
    nlp.mkdir(parents=True)
    (nlp / "4320211.nlp").write_text(
        "token|speaker|ts|endTs\n"
        "good|1|0.0|0.3\n"
        "morning|1|0.3|0.8\n"
    )
    recordings, supervisions = prepare_earnings21(tmp_path, output_dir=tmp_path / "out")
    (sup,) = list(supervisions)
    assert sup.text == "good morning"


def test_prepare_wham(tmp_path):
    from lhotse_tpu.recipes import prepare_wham

    for split, seed in (("tr", 84), ("cv", 85), ("tt", 86)):
        _wav(tmp_path / split / f"noise_{split}.wav", seed=seed)
    m = prepare_wham(tmp_path, output_dir=tmp_path / "out")
    assert set(m) == {"tr", "cv", "tt"}
    assert len(m["tr"]["recordings"]) == 1


def test_prepare_voxpopuli(tmp_path):
    from lhotse_tpu.recipes import prepare_voxpopuli

    _wav(
        tmp_path / "raw_audios" / "en" / "2020" / "20200101-0900-PLENARY_en.ogg", seconds=3.0,
        seed=87)
    out = tmp_path / "out"
    out.mkdir()
    header = "id|session_id|start_time|end_time|speaker_id|gender|normed_text|original_text|split"
    row = "x|20200101-0900-PLENARY|0.5|2.0|spk1|female|good morning|Good morning.|train"
    with gzip.open(out / "asr_en.tsv.gz", "wt") as f:
        f.write(header + "\n" + row + "\n")
    m = prepare_voxpopuli(tmp_path, output_dir=out, lang="en")
    (sup,) = list(m["train"]["supervisions"])
    assert sup.text == "good morning" and sup.custom["orig_text"] == "Good morning."
    assert set(m) == {"train"}


def test_prepare_hifitts(tmp_path):
    from lhotse_tpu.recipes import prepare_hifitts

    _wav(tmp_path / "audio" / "book1" / "utt1.wav", sr=44100, seed=88)
    row = {
        "audio_filepath": "audio/book1/utt1.wav", "text": "hello world",
        "text_normalized": "Hello, world!", "duration": 1.0}
    (tmp_path / "92_manifest_clean_train.json").write_text(json.dumps(row) + "\n")
    m = prepare_hifitts(tmp_path, output_dir=tmp_path / "out")
    assert "92_clean_train" in m
    (sup,) = list(m["92_clean_train"]["supervisions"])
    assert sup.text == "hello world" and sup.custom["text_punct"] == "Hello, world!"
    again = prepare_hifitts(tmp_path, output_dir=tmp_path / "out")
    assert "92_clean_train" in again
    assert len(list(again["92_clean_train"]["recordings"])) == 1


def test_prepare_mdcc(tmp_path):
    from lhotse_tpu.recipes import prepare_mdcc

    _wav(tmp_path / "audio" / "1.wav", seed=89)
    (tmp_path / "transcription").mkdir()
    (tmp_path / "transcription" / "1.txt").write_text("早晨")
    for part in ("train", "valid", "test"):
        (tmp_path / f"cnt_asr_{part}_metadata.csv").write_text(
            "audio_path,text_path,gender,duration\n"
            + ("./audio/1.wav,./transcription/1.txt,F,1.0\n" if part == "train" else "")
        )
    m = prepare_mdcc(tmp_path, output_dir=tmp_path / "out")
    assert set(m) == {"train"}
    (sup,) = list(m["train"]["supervisions"])
    assert sup.text == "早晨" and sup.language == "yue"


def test_prepare_babel(tmp_path):
    from lhotse_tpu.recipes import prepare_single_babel_language

    stem = "BABEL_BP_101_10033_20111024_205740_inLine"
    conv = tmp_path / "conversational"
    _wav(conv / "training" / "audio" / f"{stem}.sph", seconds=3.0, seed=90)
    tdir = conv / "training" / "transcription"
    tdir.mkdir(parents=True)
    (tdir / f"{stem}.txt").write_text("[0.0]\n<no-speech>\n[0.5]\nhello ((  ))\n[2.0]\n")
    for split in ("dev", "eval"):
        (conv / split / "audio").mkdir(parents=True)
        (conv / split / "transcription").mkdir(parents=True)
    m = prepare_single_babel_language(tmp_path, output_dir=tmp_path / "out")
    sups = sorted(m["training"]["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2
    assert sups[0].text == "<silence>"
    assert sups[1].language == "Cantonese" and sups[1].speaker == "101_10033_A"


def test_prepare_fisher_english(tmp_path):
    from lhotse_tpu.recipes import prepare_fisher_english

    stem = "fe_03_00001"
    _wav(
        tmp_path / "LDC2004S13" / "audio" / "000" / f"{stem}.sph", seconds=3.0, seed=91, channels=2)
    tdir = tmp_path / "LDC2004T19" / "fe_03_p1_tran" / "data" / "trans" / "000"
    tdir.mkdir(parents=True)
    (tdir / f"{stem}.txt").write_text(
        "# header\n#\n#\n"
        "0.00 1.20 A: hello there\n"
        "1.20 2.40 B: hi how are you\n"
    )
    doc = tmp_path / "LDC2004T19" / "doc"
    doc.mkdir(parents=True)
    (doc / "fe_03_p1_calldata.tbl").write_text(
        "CALL_ID,h1,h2,h3,h4,APIN,h6,h7,h8,h9,BPIN\n"
        "00001,x,x,x,x,9001,x,x,x,x,9002\n"
    )
    m = prepare_fisher_english(
        tmp_path, output_dir=tmp_path / "out", audio_dirs=["LDC2004S13"],
        transcript_dirs=["LDC2004T19"], absolute_paths=True)
    sups = sorted(m["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2
    assert sups[0].channel == 0 and sups[0].speaker == "9001"
    assert sups[1].channel == 1 and sups[1].speaker == "9002"


def test_prepare_adept(tmp_path):
    from lhotse_tpu.recipes import prepare_adept

    _wav(tmp_path / "wav_44khz" / "emphasis" / "marked" / "prompt_1.wav", sr=44100, seed=92)
    txt = tmp_path / "txt" / "emphasis" / "marked"
    txt.mkdir(parents=True)
    (txt / "prompt_1.txt").write_text("I never said she stole my money.")
    (tmp_path / "adept_prompts.json").write_text(
        json.dumps({"emphasis": {"prompt_1": {"marked": "stress on never"}}})
    )
    m = prepare_adept(tmp_path, output_dir=tmp_path / "out")
    (sup,) = list(m["supervisions"])
    assert sup.custom["label"] == "marked"
    assert sup.custom["text"] == "stress on never"


def test_prepare_ears(tmp_path):
    from lhotse_tpu.recipes import prepare_ears

    _wav(tmp_path / "p001" / "emo_adoration_sentences.wav", sr=48000, seed=93)
    (tmp_path / "speaker_statistics.json").write_text(
        json.dumps({"p001": {"gender": "female", "age": "18-25"}})
    )
    (tmp_path / "transcripts.json").write_text(
        json.dumps({"emo_adoration_sentences": "You're just the sweetest."})
    )
    m = prepare_ears(tmp_path, output_dir=tmp_path / "out")
    (sup,) = list(m["supervisions"])
    assert sup.speaker == "p001" and sup.gender == "female"
    assert sup.text == "You're just the sweetest."
    assert sup.custom["age"] == "18-25"
    again = prepare_ears(tmp_path, output_dir=tmp_path / "out")
    (sup2,) = list(again["supervisions"])
    assert sup2.text == "You're just the sweetest."


def test_prepare_libricss_sdm(tmp_path):
    from lhotse_tpu.recipes import prepare_libricss
    from lhotse_tpu.recipes.libricss import OVERLAP_RATIOS

    root = tmp_path / "for_release"
    for ov in OVERLAP_RATIOS:
        (root / ov).mkdir(parents=True)
    session = root / "0L" / "overlap_ratio_0.0_sil0.1_0.5_session0_actual0.0"
    _wav(session / "record" / "raw_recording.wav", seconds=3.0, seed=94)
    (session / "transcription").mkdir(parents=True)
    (session / "transcription" / "meeting_info.txt").write_text(
        "start\tend\tspeaker\tutt_id\ttext\n"
        "0.5\t2.0\t103\t103-1240-0000\tCHAPTER ONE\n"
    )
    m = prepare_libricss(tmp_path, output_dir=tmp_path / "out", type="sdm")
    (sup,) = list(m["supervisions"])
    assert sup.recording_id == "0L_session0"
    assert sup.text == "CHAPTER ONE" and sup.channel == 0


def test_textgrid_parser_roundtrip():
    from lhotse_tpu.recipes.textgrid import parse_textgrid

    tiers = parse_textgrid(_TEXTGRID.format(tier="F_SPK0093"))
    assert len(tiers) == 1
    assert tiers[0].name == "F_SPK0093"
    assert len(tiers[0].intervals) == 2
    assert tiers[0].intervals[0].mark == "你好"
    assert tiers[0].intervals[0].minTime == 0.25


def test_tranche2_cli_registered():
    from click.testing import CliRunner

    from lhotse_tpu.bin.lhotse_tpu import cli

    r = CliRunner().invoke(cli, ["prepare", "--help"])
    assert r.exit_code == 0
    for name in (
        "chime6", "dipco", "ali-meeting", "aishell4", "libricss", "dihard3", "voxconverse",
        "aishell2", "tedlium2", "earnings21", "voxpopuli", "librilight", "fisher-english", "babel",
        "mdcc", "heroico", "cmu-kids", "speechcommands", "audio-mnist", "mobvoihotwords",
        "cmu-arctic", "l2-arctic", "hifitts", "adept", "daily-talk", "ears", "rir-noise", "wham",
        "aishell3"):
        assert name in r.output, f"missing prepare command: {name}"
    r2 = CliRunner().invoke(cli, ["download", "--help"])
    assert r2.exit_code == 0
    # download commands register under the recipe's own name, matching the
    # reference CLI (`lhotse download dipco ...`)
    for name in ("dipco", "voxconverse", "speechcommands", "wham"):
        assert name in r2.output, f"missing download command: {name}"
