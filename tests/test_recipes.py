"""Recipe prepare_* functions on synthesized corpus trees."""
import numpy as np
import pytest

from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.recipes import (prepare_aishell, prepare_libritts, prepare_musan, prepare_yesno)
from lhotse_tpu.recipes.tedlium import _parse_stm_file, normalize_text_tedlium


def _wav(path, seconds=1.0, sr=16000, seed=0):
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    write_wav(path, (rng.randn(1, int(seconds * sr)) * 0.1).astype(np.float32), sr)


def test_prepare_yesno(tmp_path):
    flags = ["0_0_1_0_1_0_1_1", "1_1_0_1_0_1_0_0"]
    for i, name in enumerate(flags):
        _wav(tmp_path / f"{name}.wav", sr=8000, seed=i)
    manifests = prepare_yesno(tmp_path, output_dir=tmp_path / "out")
    # sorted files alternate between splits (reference yesno.py:141-143):
    # with 2 files, one lands in each.
    assert set(manifests) == {"train", "test"}
    sups = manifests["train"]["supervisions"]
    assert len(sups) == 1
    by_id = {s.id: s for s in sups}
    assert by_id["0_0_1_0_1_0_1_1"].text == "NO NO YES NO YES NO YES YES"
    assert (tmp_path / "out" / "yesno_recordings_train.jsonl.gz").is_file()


def test_prepare_musan(tmp_path):
    root = tmp_path / "musan"
    _wav(root / "music" / "fma" / "music-fma-0000.wav", seed=1)
    _wav(root / "noise" / "free-sound" / "noise-free-sound-0000.wav", seed=2)
    _wav(root / "speech" / "us-gov" / "speech-us-gov-0000.wav", seed=3)
    ann = root / "music" / "fma" / "ANNOTATIONS"
    ann.write_text("music-fma-0000 rock,pop Y artist1\n")
    manifests = prepare_musan(root, output_dir=tmp_path / "out")
    assert set(manifests) == {"music", "speech", "noise"}
    music_sups = manifests["music"]["supervisions"]
    (seg,) = list(music_sups)
    assert seg.custom["genres"] == ["rock", "pop"] and seg.custom["vocals"]
    assert seg.speaker == "artist1"
    # no vocals filter drops the only (vocal) segment
    novocals = prepare_musan(root, parts=("music",), use_vocals=False)
    assert len(novocals["music"]["supervisions"]) == 0
    assert "supervisions" not in manifests["noise"]


def test_prepare_aishell(tmp_path):
    root = tmp_path / "aishell"
    data = root / "data_aishell"
    trans = data / "transcript"
    trans.mkdir(parents=True)
    (trans / "aishell_transcript_v0.8.txt").write_text(
        "BAC009S0002W0122 中 文 ｔｅｓｔ\n"
        "BAC009S0002W0123 你 好\n"
        "BAC009S0003W0001 早 上 好\n"
    )
    _wav(data / "wav" / "train" / "S0002" / "BAC009S0002W0122.wav", seed=4)
    # An untranscribed wav in the same split must be skipped with a warning.
    _wav(data / "wav" / "train" / "S0002" / "BAC009S0002W9999.wav", seed=9)
    _wav(data / "wav" / "dev" / "S0002" / "BAC009S0002W0123.wav", seed=5)
    _wav(data / "wav" / "test" / "S0003" / "BAC009S0003W0001.wav", seed=6)
    manifests = prepare_aishell(root, output_dir=tmp_path / "out")
    (train_seg,) = list(manifests["train"]["supervisions"])
    # Only ａｂｃｋｔ are mapped to ASCII (the reference's exact sed set);
    # other fullwidth letters just get uppercased. Spaces removed.
    assert train_seg.text == "中文TＥＳT"
    assert train_seg.speaker == "S0002"
    assert len(manifests["train"]["recordings"]) == 1  # untranscribed dropped
    assert len(manifests["test"]["supervisions"]) == 1


def test_prepare_libritts(tmp_path):
    root = tmp_path / "LibriTTS"
    part = root / "dev-clean"
    chapter = part / "84" / "121123"
    _wav(chapter / "84_121123_000007_000001.wav", sr=24000, seed=7)
    _wav(chapter / "84_121123_000008_000000.wav", sr=24000, seed=8)
    (chapter / "84_121123.trans.tsv").write_text(
        "84_121123_000007_000001\tMaximilian!\tMaximilian.\n"
        "84_121123_000008_000000\tVillefort rose.\tVillefort rose.\n"
    )
    (chapter / "84_121123.book.tsv").write_text(
        "84_121123_000007_000001 x x 12.5\n84_121123_000008_000000 x x 7.25\n"
    )
    (root / "SPEAKERS.txt").write_text(";ID |SEX| SUBSET\n84 | F | dev-clean\n")
    manifests = prepare_libritts(
        root, dataset_parts="dev-clean", output_dir=tmp_path / "out", link_previous_utt=True)
    sups = {s.id: s for s in manifests["dev-clean"]["supervisions"]}
    s1 = sups["84_121123_000007_000001"]
    assert s1.text == "Maximilian." and s1.custom["orig_text"] == "Maximilian!"
    assert s1.custom["snr"] == 12.5 and s1.gender == "F" and s1.speaker == "84"
    assert s1.custom["prev_utt"] is None
    assert sups["84_121123_000008_000000"].custom["prev_utt"] == ("84_121123_000007_000001")


def test_tedlium_stm_parsing(tmp_path):
    stm = tmp_path / "TalkA.stm"
    stm.write_text(
        "TalkA 1 spk 0.00 2.50 <o,f0,male> hello {NOISE} world\n"
        "TalkA 1 spk 2.50 3.00 <o,f0,male> ignore_time_segment_in_scoring\n"
        "TalkA 1 spk 3.00 4.25 <o,f0,male> they 're here\n"
    )
    segs = _parse_stm_file(stm, normalize_text="none")
    assert len(segs) == 2
    assert segs[0].text == "hello [NOISE] world"
    assert segs[0].start == 0.0 and segs[0].duration == 2.5
    assert segs[1].recording_id == "TalkA"
    assert normalize_text_tedlium("they 're [NOISE] here", "kaldi") == "they're  here"
    assert normalize_text_tedlium("abc", "upper") == "ABC"


def test_recipes_cli_registered():
    from click.testing import CliRunner

    from lhotse_tpu.bin.lhotse_tpu import cli

    runner = CliRunner()
    for group in ("download", "prepare"):
        result = runner.invoke(cli, [group, "--help"])
        assert result.exit_code == 0
        for name in ("yesno", "musan", "aishell", "tedlium", "libritts"):
            assert name in result.output, (group, name)


def test_prepare_mls(tmp_path):
    from lhotse_tpu.audio.flacio import write_flac
    from lhotse_tpu.recipes import prepare_mls

    root = tmp_path / "mls"
    lang_dir = root / "mls_polish"
    (lang_dir).mkdir(parents=True)
    (lang_dir / "metainfo.txt").write_text("1234 | F | train | 10.5\n")
    for split in ("train", "dev", "test"):
        split_dir = lang_dir / split / "audio" / "1234" / "5678"
        split_dir.mkdir(parents=True)
        rng = np.random.RandomState(1)
        audio = (rng.randn(16000) * 0.1).astype(np.float32)
        write_flac(split_dir / f"1234_5678_{split}.flac", audio[None, :], 16000)
        (lang_dir / split / "transcripts.txt").write_text(f"1234_5678_{split}\tdzien dobry\n")
    manifests = prepare_mls(root, output_dir=tmp_path / "out", opus=False)
    assert set(manifests) == {"polish"}
    assert set(manifests["polish"]) == {"train", "dev", "test"}
    (seg,) = list(manifests["polish"]["train"]["supervisions"])
    assert seg.text == "dzien dobry"
    assert seg.speaker == "1234" and seg.gender == "F" and seg.language == "polish"


def test_prepare_commonvoice(tmp_path):
    from lhotse_tpu.recipes import prepare_commonvoice

    root = tmp_path / "cv-corpus"
    lang = root / "pl"
    clips = lang / "clips"
    clips.mkdir(parents=True)
    _wav(clips / "sample-000.wav", seed=11)
    header = "client_id\tpath\tsentence\tup_votes\tdown_votes\tage\tgender\taccents\tvariant\tlocale\tsegment\n"
    (lang / "train.tsv").write_text(
        header + "spk1\tsample-000.wav\tCzesc swiecie\t2\t0\ttwenties\tfemale\t\t\tpl\t\n"
    )
    (lang / "dev.tsv").write_text(header)
    (lang / "test.tsv").write_text(header)
    manifests = prepare_commonvoice(
        root, output_dir=tmp_path / "out", languages="pl", splits=("train",))
    (seg,) = list(manifests["pl"]["train"]["supervisions"])
    assert seg.text == "Czesc swiecie"
    assert seg.speaker == "spk1" and seg.gender == "female"
    assert seg.custom["age"] == "twenties"
    assert (tmp_path / "out" / "cv_recordings_pl_train.jsonl.gz").is_file()


def test_gigaspeech_parse_utterance():
    from lhotse_tpu.recipes.gigaspeech import parse_utterance

    audio = {
        "aid": "AUD0001", "path": "audio/AUD0001.opus", "sample_rate": 16000, "channels": 1,
        "duration": 10.0,
        "segments": [ { "sid": "SEG0001", "begin_time": 0.5, "end_time": 3.25, "speaker": "spk-1", "text_tn": "HELLO WORLD", } ],
    }
    rec, segs = parse_utterance(audio, "/corpus")
    assert rec.id == "AUD0001" and rec.duration == 10.0
    assert rec.sources[0].source == "/corpus/audio/AUD0001.opus"
    assert segs[0].start == 0.5 and segs[0].duration == 2.75
    assert segs[0].text == "HELLO WORLD"


def _ami_tree(tmp_path):
    """Mini AMI corpus: one meeting per partition (train/dev/test), two
    headsets each, NXT annotations."""
    root = tmp_path / "ami"
    # full-corpus partition: ES2002a -> train, ES2011a -> dev, ES2004a -> test
    meetings = ["ES2002a", "ES2011a", "ES2004a"]
    ann = root / "ami_public_manual_1.6.2"
    (ann / "corpusResources").mkdir(parents=True)
    (ann / "segments").mkdir()
    (ann / "words").mkdir()
    meetings_xml = ['<?xml version="1.0"?>', "<meetings>"]
    for mi, meet in enumerate(meetings):
        audio_dir = root / "wav_db" / meet / "audio"
        for ch in (0, 1):
            _wav(audio_dir / f"{meet}.Headset-{ch}.wav", seconds=10.0, seed=20 + 2 * mi + ch)
        meetings_xml += [
            f'  <meeting observation="{meet}">',
            f'    <speaker nxt_agent="A" global_name="MEE00{mi}" channel="0"/>',
            f'    <speaker nxt_agent="B" global_name="FEE10{mi}" channel="1"/>', "  </meeting>"]
        (ann / "segments" / f"{meet}.A.segments.xml").write_text(
            '<?xml version="1.0"?>\n<segmentation>\n'
            '  <segment transcriber_start="1.0" transcriber_end="4.0"/>\n'
            "</segmentation>"
        )
        (ann / "segments" / f"{meet}.B.segments.xml").write_text(
            '<?xml version="1.0"?>\n<segmentation>\n'
            '  <segment transcriber_start="5.0" transcriber_end="8.0"/>\n'
            "</segmentation>"
        )
        (ann / "words" / f"{meet}.A.words.xml").write_text(
            '<?xml version="1.0"?>\n<words>\n'
            '  <w starttime="1.1" endtime="1.5">hello</w>\n'
            '  <w starttime="1.6" endtime="2.2">there</w>\n'
            '  <w starttime="2.2" endtime="2.2" punc="true">.</w>\n'
            '  <w starttime="2.5" endtime="3.5">okay</w>\n'
            "</words>"
        )
        (ann / "words" / f"{meet}.B.words.xml").write_text(
            '<?xml version="1.0"?>\n<words>\n'
            '  <w starttime="5.2" endtime="6.0">mm</w>\n'
            '  <w starttime="6.1" endtime="7.0">hmm</w>\n'
            "</words>"
        )
    meetings_xml.append("</meetings>")
    (ann / "corpusResources" / "meetings.xml").write_text("\n".join(meetings_xml))
    return root


def test_prepare_ami_ihm(tmp_path):
    from lhotse_tpu.recipes import prepare_ami

    root = _ami_tree(tmp_path)
    manifests = prepare_ami(
        root, output_dir=tmp_path / "out", mic="ihm", partition="full-corpus",
        normalize_text="kaldi")
    # ES2002a is in the full-corpus train partition.
    recs = manifests["train"]["recordings"]
    sups = list(manifests["train"]["supervisions"])
    assert len(recs) == 1 and recs["ES2002a"].num_channels == 2
    # Speaker A: segment split at the full stop -> 2 segments; B -> 1.
    a_sups = [s for s in sups if s.speaker == "MEE000"]
    b_sups = [s for s in sups if s.speaker == "FEE100"]
    assert len(a_sups) == 2 and len(b_sups) == 1
    assert a_sups[0].text == "HELLO THERE"
    assert a_sups[0].channel == 0 and b_sups[0].channel == 1
    # Per-word normalization means the dash rule doesn't fire on the join...
    assert b_sups[0].text == "MM HMM"
    # ...but does when normalizing a full phrase:
    from lhotse_tpu.recipes.ami import normalize_text_ami

    assert normalize_text_ami("mm hmm", "kaldi") == "MM-HMM"
    ali = a_sups[0].alignment["word"]
    assert [w.symbol for w in ali] == ["HELLO", "THERE"]
    assert a_sups[0].gender == "M" and b_sups[0].gender == "F"


def test_ami_split_segment():
    from lhotse_tpu.recipes.ami import split_segment

    words = [
        (0.0, 0.5, "one"), (0.6, 1.0, "two"), (1.0, 1.0, "."), (1.2, 1.5, "three"),
        (1.6, 2.0, "four"), (2.1, 2.5, "five"), (2.5, 2.5, ","), (2.6, 3.0, "six")]
    segs = split_segment(words)
    # The full-stop split keeps the comma token inside the second chunk.
    assert [len(s) for s in segs] == [2, 5]
    segs = split_segment(words, max_words_per_segment=3)
    assert [[w[2] for w in s] for s in segs] == [["one", "two"], ["three", "four", "five"], ["six"]]


def test_prepare_timit(tmp_path):
    from lhotse_tpu.recipes import prepare_timit
    from lhotse_tpu.recipes.timit import get_phonemes

    root = tmp_path / "timit"

    def utt(part, spk, name, seed):
        d = root / "data" / part / "DR1" / spk
        _wav(d / f"{name}.WAV", seed=seed)
        (d / f"{name}.TXT").write_text("0 16000 she had your dark suit\n")
        (d / f"{name}.WRD").write_text("0 8000 she\n8000 16000 had\n")
        (d / f"{name}.PHN").write_text("0 4000 h#\n4000 8000 sh\n8000 12000 ix\n12000 16000 axr\n")

    utt("TRAIN", "mabc0", "SI1", 30)
    utt("TEST", "fadg0", "SI2", 31)  # dev speaker
    utt("TEST", "fdhc0", "SI3", 32)  # test speaker
    manifests = prepare_timit(root, output_dir=tmp_path / "out", num_phones=48)
    assert {len(manifests[p]["recordings"]) for p in ("TRAIN", "DEV", "TEST")} == {1}
    (sup,) = list(manifests["TRAIN"]["supervisions"])
    assert sup.text == "she had your dark suit"
    assert [a.symbol for a in sup.alignment["word"]] == ["she", "had"]
    # 48-fold: h# -> sil, ix stays, axr -> er
    assert [a.symbol for a in sup.alignment["phone"]] == ["sil", "sh", "ix", "er"]
    assert sup.gender == "male"
    (dev_sup,) = list(manifests["DEV"]["supervisions"])
    assert dev_sup.speaker == "fadg0" and dev_sup.gender == "female"
    # 39-fold check via the table
    assert get_phonemes(39)["ix"] == "ih" and get_phonemes(39)["zh"] == "sh"


def test_prepare_voxceleb1_with_trials(tmp_path):
    from lhotse_tpu.recipes import prepare_voxceleb

    root = tmp_path / "vox1"
    wav = root / "wav"
    # Two dev speakers, one test speaker, two utts each.
    speakers = {"id10001": "dev", "id10002": "dev", "id10270": "test"}
    meta = ["VoxCeleb1 ID\tVGGFace1 ID\tGender\tNationality\tSet"]
    for i, (spk, split) in enumerate(speakers.items()):
        meta.append(f"{spk}\tName_{spk}\t{'m' if i % 2 == 0 else 'f'}\tUSA\t{split}")
        for j in range(2):
            _wav(wav / spk / "sessA" / f"{j:05d}.wav", seed=40 + 2 * i + j)
    (root / "vox1_meta.csv").write_text("\n".join(meta) + "\n")
    trials = tmp_path / "trials.txt"
    trials.write_text(
        "1 id10270/sessA/00000.wav id10270/sessA/00001.wav\n"
        "0 id10270/sessA/00000.wav id10001/sessA/00000.wav\n"
    )
    manifests = prepare_voxceleb(
        voxceleb1_root=root, output_dir=tmp_path / "out", trials_path=trials)
    assert len(manifests["train"]["recordings"]) == 4
    assert len(manifests["test"]["recordings"]) == 2
    pos1, pos2 = manifests["pos_trials"]
    assert len(pos1) == len(pos2) == 1
    assert pos1[0].id == pos2[0].id  # CutPairsSampler contract: same ids
    neg1, neg2 = manifests["neg_trials"]
    # The negative trial references a train-split recording -> skipped.
    assert len(neg1) == 0
    (sup,) = list(manifests["test"]["supervisions"].find(recording_id="id10270-sessA-00000"))
    assert sup.custom["nationality"] == "USA"


def test_prepare_ljspeech(tmp_path):
    from lhotse_tpu.recipes import prepare_ljspeech
    from lhotse_tpu.recipes.ljspeech import text_normalizer

    root = tmp_path / "LJSpeech-1.1"
    (root / "wavs").mkdir(parents=True)
    _wav(root / "wavs" / "LJ001-0001.wav", sr=22050, seed=50)
    (root / "metadata.csv").write_text(
        "LJ001-0001|Printing, in the only sense|printing in the only sense\n"
        "LJ001-0002|missing audio|missing audio\n"
    )
    manifests = prepare_ljspeech(root, output_dir=tmp_path / "out")
    (sup,) = list(manifests["supervisions"])
    assert sup.text == "Printing, in the only sense"
    assert sup.custom["normalized_text"] == "printing in the only sense"
    assert sup.gender == "female"
    norm = text_normalizer(sup)
    assert norm.text == "PRINTING IN THE ONLY SENSE"


def test_prepare_vctk(tmp_path):
    from lhotse_tpu.recipes import prepare_vctk

    root = tmp_path / "VCTK-Corpus"
    root.mkdir(parents=True)
    (root / "speaker-info.txt").write_text(
        "ID  AGE  GENDER  ACCENTS  REGION\n"
        "225  23  F  English  Southern England\n"
    )
    (root / "txt" / "p225").mkdir(parents=True)
    (root / "txt" / "p225" / "p225_001.txt").write_text("Please call Stella.\n")
    (root / "wav48" / "p225").mkdir(parents=True)
    _wav(root / "wav48" / "p225" / "p225_001.wav", sr=48000, seed=51)
    manifests = prepare_vctk(root, output_dir=tmp_path / "out")
    (sup,) = list(manifests["supervisions"])
    assert sup.text == "Please call Stella."
    assert sup.speaker == "p225" and sup.gender == "F"
    assert sup.custom["accent"] == "English"
    assert sup.custom["region"] == "Southern England"


def test_prepare_chinese_openslr_family(tmp_path):
    from lhotse_tpu.recipes import (
        prepare_aidatatang_200zh, prepare_magicdata, prepare_primewords, prepare_stcmds,
        prepare_thchs_30)

    # --- stcmds: .txt next to each .wav ---
    st = tmp_path / "stcmds" / "ST-CMDS-20170001_1-OS"
    st.mkdir(parents=True)
    _wav(st / "20170001P00001A0001.wav", seed=60)
    (st / "20170001P00001A0001.txt").write_text("你好，世界\n")
    m = prepare_stcmds(tmp_path / "stcmds")
    (sup,) = list(m["train"]["supervisions"])
    assert sup.text == "你好世界"  # fullwidth comma stripped
    assert sup.speaker == "P00001A"

    # --- thchs-30: .wav.trn with 3 lines; splits are symlink dirs ---
    th = tmp_path / "thchs" / "data_thchs30"
    (th / "data").mkdir(parents=True)
    for part, utt in (("train", "A11_0"), ("dev", "A11_1"), ("test", "A11_2")):
        (th / part).mkdir()
        _wav(th / part / f"{utt}.wav", seed=61)
        (th / "data" / f"{utt}.wav.trn").write_text("绿 是 阳春\nlv4 shi4\nl v4\n")
    m = prepare_thchs_30(tmp_path / "thchs")
    (sup,) = list(m["train"]["supervisions"])
    assert sup.text == "绿 是 阳春" and sup.speaker == "A11"

    # --- magicdata: TRANS.txt table ---
    mg = tmp_path / "magic"
    for part, utt in (("train", "utt_001"), ("dev", "utt_002"), ("test", "utt_003")):
        (mg / part / "SPK01").mkdir(parents=True)
        _wav(mg / part / "SPK01" / f"{utt}.wav", seed=62)
        (mg / part / "TRANS.txt").write_text(
            "UtteranceID\tSpeakerID\tTranscription\n"
            f"{utt}.wav\tSPK01\t你好！世界[FIL]\n"
        )
    m = prepare_magicdata(mg)
    (sup,) = list(m["train"]["supervisions"])
    assert sup.text == "你好世界" and sup.speaker == "SPK01"

    # --- primewords: JSON transcript table ---
    pw = tmp_path / "pw" / "primewords_md_2018_set1"
    (pw / "audio_files" / "0" / "00").mkdir(parents=True)
    _wav(pw / "audio_files" / "0" / "00" / "abc123.wav", seed=63)
    import json as _json

    (pw / "set1_transcript.json").write_text(
        _json.dumps([{"file": "abc123.wav", "text": "早上好", "user_id": 42}])
    )
    m = prepare_primewords(tmp_path / "pw")
    (sup,) = list(m["train"]["supervisions"])
    assert sup.text == "早上好" and sup.speaker == "42"

    # --- aidatatang_200zh: shared transcript + corpus/<split>/<spk>/ ---
    ad = tmp_path / "adt" / "aidatatang_200zh"
    (ad / "transcript").mkdir(parents=True)
    (ad / "transcript" / "aidatatang_200_zh_transcript.txt").write_text(
        "T0055G0001S0001 ｔｅＡ 早上 好\n"
        "T0055G0001S0002 下午 好\n"
        "T0055G0001S0003 晚上 好\n"
    )
    for part, utt in (("train", "S0001"), ("dev", "S0002"), ("test", "S0003")):
        d = ad / "corpus" / part / "G0001"
        d.mkdir(parents=True)
        _wav(d / f"T0055G0001{utt}.wav", seed=64)
    m = prepare_aidatatang_200zh(tmp_path / "adt")
    (sup,) = list(m["train"]["supervisions"])
    # Ａ mapped to ASCII, then everything uppercased (incl. fullwidth).
    assert sup.text == "ＴＥA 早上 好"
    assert sup.speaker == "G0001"
    assert set(m) == {"train", "dev", "test"}


def test_prepare_switchboard(tmp_path):
    from lhotse_tpu.recipes import prepare_switchboard

    audio = tmp_path / "LDC97S62"
    audio.mkdir()
    # Stereo conversation (RIFF content behind .sph: backends sniff magic).
    rng = np.random.RandomState(70)
    from lhotse_tpu.audio.wavio import write_wav

    write_wav(audio / "sw02001.sph", (rng.randn(2, 16000) * 0.1).astype(np.float32), 8000)
    trans = tmp_path / "swb_ms98_transcriptions" / "20" / "2001"
    trans.mkdir(parents=True)
    (trans / "sw2001A-ms98-a-trans.text").write_text(
        "sw2001A-ms98-a-0001 0.00 1.00 [silence]\n"
        "sw2001A-ms98-a-0002 1.00 1.90 hello there\n"
    )
    (trans / "sw2001B-ms98-a-trans.text").write_text("sw2001B-ms98-a-0001 0.50 1.80 hi yourself\n")
    m = prepare_switchboard(
        audio, transcripts_dir=tmp_path / "swb_ms98_transcriptions", output_dir=tmp_path / "out",
        absolute_paths=True)
    sups = sorted(m["supervisions"], key=lambda s: s.id)
    assert len(sups) == 2  # [silence] omitted
    assert sups[0].text == "hello there" and sups[0].channel == 0
    assert sups[1].text == "hi yourself" and sups[1].channel == 1
    assert sups[0].speaker.endswith("A") and sups[1].speaker.endswith("B")
    # Retaining silence keeps all three.
    m2 = prepare_switchboard(
        audio, transcripts_dir=tmp_path / "swb_ms98_transcriptions", omit_silence=False,
        absolute_paths=True)
    assert len(m2["supervisions"]) == 3


def test_prepare_eval2000(tmp_path):
    from lhotse_tpu.recipes import prepare_eval2000

    root = tmp_path
    audio = root / "LDC2002S09" / "hub5e_00" / "english"
    audio.mkdir(parents=True)
    rng = np.random.RandomState(71)
    from lhotse_tpu.audio.wavio import write_wav

    write_wav(audio / "en_4156.sph", (rng.randn(2, 16000) * 0.1).astype(np.float32), 8000)
    trans = root / "LDC2002T43" / "reference" / "english"
    trans.mkdir(parents=True)
    (trans / "en_4156.txt").write_text(
        "# header line\n"
        "\n"
        "0.00 1.10 A: yeah right\n"
        "1.10 1.95 B: uh huh\n"
    )
    m = prepare_eval2000(root, output_dir=root / "out", absolute_paths=True)
    sups = sorted(m["supervisions"], key=lambda s: s.id)
    assert len(sups) == 2
    assert sups[0].text == "yeah right" and sups[0].channel == 0
    assert sups[1].channel == 1 and sups[1].speaker == "en_4156-B"


def test_prepare_fleurs(tmp_path):
    from lhotse_tpu.recipes import prepare_fleurs

    root = tmp_path / "fleurs"
    lang = "en_us"
    meta = root / "metadata" / lang
    meta.mkdir(parents=True)
    for dset, utts in (("train", 2), ("dev", 1), ("test", 1)):
        d = root / lang / dset
        d.mkdir(parents=True)
        rows = []
        for i in range(utts):
            fname = f"{dset}_utt{i}.wav"
            _wav(d / fname, seed=80 + i)
            rows.append(f"100{i}\t{fname}\tRaw text {i}.\traw text {i}\t" f"r a w |\t16000\tFEMALE")
        (meta / f"{dset}.tsv").write_text("\n".join(rows) + "\n")
    manifests = prepare_fleurs(root, output_dir=tmp_path / "out", languages=lang)
    assert set(manifests[lang]) == {"train", "dev", "test"}
    sups = sorted(manifests[lang]["train"]["supervisions"], key=lambda s: s.id)
    assert len(sups) == 2
    assert sups[0].text == "raw text 0"
    assert sups[0].custom["raw_text"] == "Raw text 0."
    assert sups[0].gender == "FEMALE" and sups[0].language == lang
    assert (tmp_path / "out" / lang / f"fleurs-{lang}_recordings_train.jsonl.gz").is_file()


def test_prepare_spgispeech(tmp_path):
    from lhotse_tpu.recipes import prepare_spgispeech

    root = tmp_path / "spgi"
    for part in ("train", "val"):
        d = root / part / "07a785e9"
        d.mkdir(parents=True)
        _wav(d / "1.wav", seed=90)
        (root / f"{part}.csv").write_text(
            "wav_filename|wav_filesize|transcript\n"
            "07a785e9/1.wav|32044|Hello, World!\n"
            "07a785e9/2.wav|32044|missing audio\n"
        )
    m = prepare_spgispeech(root, output_dir=tmp_path / "out")
    sups = list(m["train"]["supervisions"])
    assert len(sups) == 1
    assert sups[0].text == "hello world"  # normalized
    assert sups[0].speaker == "07a785e9"
    assert sups[0].id == "07a785e9_1"


def test_earnings22_parsers(tmp_path):
    from lhotse_tpu.recipes.earnings22 import (normalize, parse_nlp_file, read_metadata)

    nlp = tmp_path / "4320211.nlp"
    nlp.write_text(
        "token|speaker|ts|endTs|punct|case|tags|wer_tags\n"
        "Hello|1|0.0|0.5|||[]|[]\n"
        "world.|1|0.5|0.9|||[]|[]\n"
    )
    assert parse_nlp_file(nlp) == ["Hello", "world."]
    meta = tmp_path / "metadata.csv"
    meta.write_text(
        "file,source,ticker,date,sector,lang_region,other,x\n"
        "4320211,rev,ABC,2022,tech,en-US,misc,1\n"
    )
    md = read_metadata(meta)
    assert md["4320211"][4] == "en-US"
    assert normalize("Hello, World!") == "hello world"


def test_prepare_wenet_speech(tmp_path):
    import json as _json

    from lhotse_tpu.recipes import prepare_wenet_speech

    root = tmp_path / "wenet"
    (root / "audio").mkdir(parents=True)
    _wav(root / "audio" / "X0001.wav", seconds=10.0, seed=95)
    meta = {
        "audios": [
            {
                "aid": "X0001",
                "path": "audio/X0001.wav",
                "duration": 10.0,
                "segments": [
                    {
                        "sid": "X0001_S0001",
                        "begin_time": 0.5,
                        "end_time": 3.0,
                        "text": " 大家好 ",
                        "subsets": ["L", "M", "DEV"],
                    },
                    {
                        "sid": "X0001_S0002",
                        "begin_time": 4.0,
                        "end_time": 6.5,
                        "text": "再见",
                        "subsets": ["L"],
                    },
                ],
            }
        ]
    }
    (root / "WenetSpeech.json").write_text(_json.dumps(meta))
    m = prepare_wenet_speech(root, dataset_parts=["L", "DEV"], output_dir=tmp_path / "out")
    assert len(m["L"]["supervisions"]) == 2
    assert len(m["DEV"]["supervisions"]) == 1
    (dev_sup,) = list(m["DEV"]["supervisions"])
    assert dev_sup.text == "大家好"
    assert dev_sup.start == 0.5 and dev_sup.duration == 2.5
    with pytest.raises(ValueError):
        prepare_wenet_speech(root, dataset_parts=["XL"])


def test_prepare_peoples_speech(tmp_path):
    import json as _json

    from lhotse_tpu.recipes import prepare_peoples_speech

    root = tmp_path / "ps"
    audio_dir = root / "train" / "clean" / "some" / "session"
    audio_dir.mkdir(parents=True)
    _wav(audio_dir / "utt0.wav", seed=96)
    manifest = {
        "identifier": "session-xyz",
        "training_data": { "name": ["utt0"], "label": ["hello people"], "audio_document_id": ["some/session/utt0.wav"], },
    }
    (root / "train" / "clean.json").write_text(_json.dumps(manifest) + "\n")
    m = prepare_peoples_speech(root, output_dir=tmp_path / "out")
    assert set(m) == {"train/clean"}
    (sup,) = list(m["train/clean"]["supervisions"])
    assert sup.text == "hello people"
    assert sup.custom["session_id"] == "session-xyz"
    again = prepare_peoples_speech(root, output_dir=tmp_path / "out")
    assert set(again) == {"train/clean"}
    assert len(list(again["train/clean"]["recordings"])) == 1


def test_prepare_icsi_ihm(tmp_path):
    from lhotse_tpu.recipes import prepare_icsi

    audio = tmp_path / "speech"
    trans = tmp_path / "transcripts"
    (trans / "Segments").mkdir(parents=True)
    (trans / "Words").mkdir()
    # One meeting per partition: Bdb001 (train), Bmr021 (dev), Bmr013 (test).
    meetings = ["Bdb001", "Bmr021", "Bmr013"]
    preambles = ['<?xml version="1.0"?>', "<Meetings>"]
    for mi, meet in enumerate(meetings):
        d = audio / meet
        for ch in ("0", "1"):
            _wav(d / f"chan{ch}.sph", seconds=10.0, seed=100 + 2 * mi + int(ch))
        preambles += [
            f'  <Meeting Session="{meet}">', "    <Preamble>", "      <Channels>",
            '        <Channel Name="chan0"/>', '        <Channel Name="chan1"/>',
            "      </Channels>", "      <Participants>",
            f'        <Participant Name="me0{mi}" Channel="chan0"/>',
            f'        <Participant Name="fe1{mi}" Channel="chan1"/>', "      </Participants>",
            "    </Preamble>", "  </Meeting>"]
        (trans / "Segments" / f"{meet}.A.segs.xml").write_text(
            '<?xml version="1.0"?>\n<segments>\n'
            f'  <segment participant="me0{mi}" starttime="1.0" endtime="4.0"/>\n'
            "</segments>"
        )
        (trans / "Words" / f"{meet}.A.words.xml").write_text(
            '<?xml version="1.0"?>\n<words>\n'
            '  <w starttime="1.1" endtime="1.5">okay</w>\n'
            '  <w starttime="1.6" endtime="2.2">let\'s</w>\n'
            '  <w starttime="2.3" endtime="2.9">start</w>\n'
            "</words>"
        )
        (trans / "Segments" / f"{meet}.B.segs.xml").write_text(
            '<?xml version="1.0"?>\n<segments>\n'
            f'  <segment participant="fe1{mi}" starttime="5.0" endtime="7.0"/>\n'
            "</segments>"
        )
        (trans / "Words" / f"{meet}.B.words.xml").write_text(
            '<?xml version="1.0"?>\n<words>\n'
            '  <w starttime="5.2" endtime="6.0">yeah</w>\n'
            "</words>"
        )
    preambles.append("</Meetings>")
    (trans / "preambles.mrt").write_text("\n".join(preambles))

    manifests = prepare_icsi(audio, transcripts_dir=trans, output_dir=tmp_path / "out", mic="ihm")
    recs = manifests["train"]["recordings"]
    assert len(recs) == 1 and recs["Bdb001"].num_channels == 2
    sups = sorted(manifests["train"]["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2
    assert sups[0].text == "OKAY LET'S START" and sups[0].channel == 0
    assert sups[0].speaker == "me00" and sups[0].gender == "m"
    assert [w.symbol for w in sups[0].alignment["word"]] == ["OKAY", "LET'S", "START"]
    assert sups[1].channel == 1 and sups[1].text == "YEAH"
    assert len(manifests["dev"]["supervisions"]) == 2
    assert len(manifests["test"]["supervisions"]) == 2


def test_prepare_icsi_save_to_wav(tmp_path):
    from lhotse_tpu.recipes import prepare_icsi

    audio = tmp_path / "speech"
    trans = tmp_path / "transcripts"
    (trans / "Segments").mkdir(parents=True)
    (trans / "Words").mkdir()
    meetings = ["Bdb001", "Bmr021", "Bmr013"]  # one per partition
    preamble_blocks = []
    for mi, meet in enumerate(meetings):
        _wav(audio / meet / "chan6.sph", seconds=8.0, seed=5 + mi)
        preamble_blocks.append(
            f'  <Meeting Session="{meet}">\n    <Preamble>\n      <Channels>\n'
            '        <Channel Name="chan6"/>\n      </Channels>\n      <Participants>\n'
            f'        <Participant Name="me0{mi}" Channel="chan6"/>\n      </Participants>\n'
            "    </Preamble>\n  </Meeting>"
        )
        (trans / "Segments" / f"{meet}.A.segs.xml").write_text(
            '<?xml version="1.0"?>\n<segments>\n'
            f'  <segment participant="me0{mi}" starttime="1.0" endtime="3.0"/>\n</segments>'
        )
        (trans / "Words" / f"{meet}.A.words.xml").write_text(
            '<?xml version="1.0"?>\n<words>\n'
            '  <w starttime="1.0" endtime="2.0">hi</w>\n</words>'
        )
    (trans / "preambles.mrt").write_text(
        '<?xml version="1.0"?>\n<Meetings>\n' + "\n".join(preamble_blocks) + "\n</Meetings>"
    )
    meet = meetings[0]

    out = tmp_path / "out"
    manifests = prepare_icsi(
        audio, transcripts_dir=trans, output_dir=out, mic="sdm", save_to_wav=True)
    rec = manifests["train"]["recordings"][meet]
    # The manifest must point at the converted WAV copy, and it must decode.
    assert all(s.source.endswith(".wav") for s in rec.sources)
    assert str(out / "wavs" / meet) in rec.sources[0].source
    assert rec.load_audio().shape[1] == rec.num_samples

    # save_to_wav without output_dir is rejected.
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        prepare_icsi(audio, transcripts_dir=trans, mic="sdm", save_to_wav=True)
