"""
Recipe differential tests vs the ACTUAL reference: the same synthetic corpus
layout on disk through BOTH implementations' ``prepare_*`` functions, with
the produced Recording/Supervision manifests compared record-by-record.

This pins true recipe parity (ids, paths, durations, texts, speakers,
splits) beyond what fixture expectations encode.  Reference recipes run
in-env because audio probing goes through the functional soundfile stand-in
(tests/_reference.py).
"""
import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    import lhotse.recipes as RR
    from lhotse.audio.backend import (
        LibsndfileBackend,
        set_current_audio_backend as ref_set_backend,
    )

    ref_set_backend(LibsndfileBackend())

import lhotse_tpu.recipes as MR
from lhotse_tpu.audio.flacio import write_flac
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _sig(seconds: float, sr: int = SR, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return (rng.randn(1, int(sr * seconds)) * 0.1).astype(np.float32)


def _canon_set(manifest):
    """Manifest -> canonical sorted list of dicts with rounded floats."""

    def norm(x):
        if isinstance(x, float):
            return round(x, 8)
        if isinstance(x, dict):
            return {k: norm(v) for k, v in x.items() if v is not None}
        if isinstance(x, (list, tuple)):
            return [norm(v) for v in x]
        return x

    return sorted((norm(item.to_dict()) for item in manifest), key=lambda d: d["id"])


def _assert_manifests_match(theirs, mine, where):
    assert set(theirs) == set(mine), (
        f"{where}: split/part keys differ {set(theirs) ^ set(mine)}"
    )
    for part in theirs:
        for kind in theirs[part]:
            t = _canon_set(theirs[part][kind])
            m = _canon_set(mine[part][kind])
            assert t == m, f"{where}[{part}][{kind}] differs"


# ---------------------------------------------------------------------------
# yesno
# ---------------------------------------------------------------------------
def test_yesno_matches_reference(tmp_path):
    root = tmp_path / "waves_yesno"
    root.mkdir()
    # the reference hard-asserts exactly 60 files (recipes/yesno.py:139)
    patterns = set()
    i = 0
    while len(patterns) < 60:
        patterns.add(tuple((i >> k) & 1 for k in range(8)))
        i += 1
    for bits in sorted(patterns):
        name = "_".join(str(b) for b in bits)
        write_wav(str(root / f"{name}.wav"), _sig(0.5, sr=8000), 8000)

    theirs = RR.prepare_yesno(root)
    mine = MR.prepare_yesno(root)
    _assert_manifests_match(theirs, mine, "yesno")


# ---------------------------------------------------------------------------
# librispeech
# ---------------------------------------------------------------------------
def test_librispeech_matches_reference(tmp_path):
    root = tmp_path / "LibriSpeech"
    part = "dev-clean"
    for spk, chap in (("84", "121123"), ("174", "50561")):
        d = root / part / spk / chap
        d.mkdir(parents=True)
        lines = []
        for i in range(2):
            utt = f"{spk}-{chap}-{i:04d}"
            # real LibriSpeech ships FLAC; the reference resolves audio as
            # <utt>.flac (recipes/librispeech.py:249)
            write_flac(str(d / f"{utt}.flac"), _sig(1.0 + 0.2 * i, seed=i), SR)
            lines.append(f"{utt} HELLO WORLD NUMBER {i}")
        (d / f"{spk}-{chap}.trans.txt").write_text("\n".join(lines) + "\n")

    theirs = RR.prepare_librispeech(root, dataset_parts=[part])
    mine = MR.prepare_librispeech(root, dataset_parts=[part])
    _assert_manifests_match(theirs, mine, "librispeech")


# ---------------------------------------------------------------------------
# vctk
# ---------------------------------------------------------------------------
def test_vctk_matches_reference(tmp_path):
    root = tmp_path / "VCTK-Corpus"
    for spk in ("p225", "p226"):
        (root / "wav48" / spk).mkdir(parents=True)
        (root / "txt" / spk).mkdir(parents=True)
    # speaker-info file both recipes parse
    (root / "speaker-info.txt").write_text(
        "ID  AGE  GENDER  ACCENTS  REGION\n"
        "225  23  F    English    Southern  England\n"
        "226  22  M    English    Surrey\n"
    )
    for spk, utt, text in (
        ("p225", "p225_001", "Please call Stella."),
        ("p225", "p225_002", "Ask her to bring these things."),
        ("p226", "p226_001", "Please call Stella."),
    ):
        write_wav(str(root / "wav48" / spk / f"{utt}.wav"), _sig(1.0), 48000)
        (root / "txt" / spk / f"{utt}.txt").write_text(text + "\n")

    theirs = RR.prepare_vctk(root)
    mine = MR.prepare_vctk(root)
    # vctk returns a flat {recordings, supervisions} dict on both sides
    _assert_manifests_match({"all": theirs}, {"all": mine}, "vctk")


# ---------------------------------------------------------------------------
# ljspeech
# ---------------------------------------------------------------------------
def test_ljspeech_matches_reference(tmp_path):
    root = tmp_path / "LJSpeech-1.1"
    (root / "wavs").mkdir(parents=True)
    rows = []
    for i in range(3):
        utt = f"LJ001-{i:04d}"
        write_wav(str(root / "wavs" / f"{utt}.wav"), _sig(1.5, sr=22050, seed=i), 22050)
        rows.append(f"{utt}|Some text {i}|Some normalized text {i}")
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")

    theirs = RR.prepare_ljspeech(root)
    mine = MR.prepare_ljspeech(root)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "ljspeech")


# ---------------------------------------------------------------------------
# musan
# ---------------------------------------------------------------------------
def test_musan_matches_reference(tmp_path):
    root = tmp_path / "musan"
    for part, name in (("music", "music-fma-0000"), ("noise", "noise-free-sound-0000"), ("speech", "speech-librivox-0000")):
        d = root / part / "xyz"
        d.mkdir(parents=True)
        write_wav(str(d / f"{name}.wav"), _sig(2.0), SR)
    # music needs vocal ANNOTATIONS (utt genres vocals musician), else the
    # empty supervision set crashes the reference's validator
    (root / "music" / "xyz" / "ANNOTATIONS").write_text(
        "music-fma-0000 rock,pop Y artist0\n"
    )

    theirs = RR.prepare_musan(root)
    mine = MR.prepare_musan(root)
    _assert_manifests_match(theirs, mine, "musan")


# ---------------------------------------------------------------------------
# aishell
# ---------------------------------------------------------------------------
def test_aishell_matches_reference(tmp_path):
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
    lines.append("BAC009S9999W0001 无 音频")  # no audio: skipped
    (trans / "aishell_transcript_v0.8.txt").write_text("\n".join(lines) + "\n")

    theirs = RR.prepare_aishell(root)
    mine = MR.prepare_aishell(root)
    _assert_manifests_match(theirs, mine, "aishell")


# ---------------------------------------------------------------------------
# timit
# ---------------------------------------------------------------------------
def test_timit_matches_reference(tmp_path):
    from lhotse_tpu.audio.sphio import write_sph

    root = tmp_path / "timit"
    n = SR
    layout = [
        ("TRAIN", "DR1", "fcjf0"),
        ("TEST", "DR1", "fadg0"),  # dev core speaker
        ("TEST", "DR2", "fdhc0"),  # test core speaker
    ]
    for part, dr, spk in layout:
        d = root / "data" / part / dr / spk
        d.mkdir(parents=True)
        write_sph(str(d / "SA1.WAV"), _sig(1.0)[0][None, :], SR)
        (d / "SA1.TXT").write_text(f"0 {n} she had your dark suit\n")
        (d / "SA1.WRD").write_text(f"0 {n//2} she\n{n//2} {n} had\n")
        (d / "SA1.PHN").write_text(f"0 {n//4} sh\n{n//4} {n//2} iy\n{n//2} {n} hh\n")

    theirs = RR.prepare_timit(root, num_phones=60)
    mine = MR.prepare_timit(root, num_phones=60)
    _assert_manifests_match(theirs, mine, "timit")


# ---------------------------------------------------------------------------
# magicdata
# ---------------------------------------------------------------------------
def test_magicdata_matches_reference(tmp_path):
    root = tmp_path / "magicdata"
    for part, utts in (
        ("train", [("14_3466", "14_3466_20170826171404"), ("14_3466", "14_3466_20170826171942")]),
        ("dev", [("38_5718", "38_5718_20170915093303")]),
        ("test", [("38_5719", "38_5719_20170915093304")]),
    ):
        lines = ["UtteranceID SpeakerID Transcription"]
        for spk, utt in utts:
            d = root / part / spk
            d.mkdir(parents=True, exist_ok=True)
            write_wav(str(d / f"{utt}.wav"), _sig(1.0), SR)
            lines.append(f"{utt}.wav {spk} 北京， 你好！")
        (root / part / "TRANS.txt").write_text("\n".join(lines) + "\n")

    theirs = RR.prepare_magicdata(root)
    mine = MR.prepare_magicdata(root)
    _assert_manifests_match(theirs, mine, "magicdata")


# ---------------------------------------------------------------------------
# stcmds
# ---------------------------------------------------------------------------
def test_stcmds_matches_reference(tmp_path):
    root = tmp_path / "stcmds"
    d = root / "ST-CMDS-20170001_1-OS"
    d.mkdir(parents=True)
    for i in range(2):
        stem = f"20170001P0000{1 + i}A000{1 + i}"
        write_wav(str(d / f"{stem}.wav"), _sig(1.0, seed=i), SR)
        (d / f"{stem}.txt").write_text("今天 天气 很好\n")

    theirs = RR.prepare_stcmds(root)
    mine = MR.prepare_stcmds(root)
    # both return {"train": {recordings, supervisions}}
    _assert_manifests_match(theirs, mine, "stcmds")


# ---------------------------------------------------------------------------
# thchs-30
# ---------------------------------------------------------------------------
def test_thchs30_matches_reference(tmp_path):
    root = tmp_path / "thchs"
    data = root / "data_thchs30" / "data"
    data.mkdir(parents=True)
    for part, utt in (("train", "A11_0"), ("dev", "B11_374"), ("test", "C21_9")):
        pd = root / "data_thchs30" / part
        pd.mkdir(parents=True, exist_ok=True)
        write_wav(str(pd / f"{utt}.wav"), _sig(1.0), SR)
        (data / f"{utt}.wav.trn").write_text("绿 是 阳春 烟 景\nlv4 shi4\nl v4 sh i4\n")

    theirs = RR.prepare_thchs_30(root)
    mine = MR.prepare_thchs_30(root)
    _assert_manifests_match(theirs, mine, "thchs30")


# ---------------------------------------------------------------------------
# libritts
# ---------------------------------------------------------------------------
def test_libritts_matches_reference(tmp_path):
    root = tmp_path / "LibriTTS"
    chapter = root / "dev-clean" / "84" / "121123"
    chapter.mkdir(parents=True)
    for name, seed in (("84_121123_000007_000001", 7), ("84_121123_000008_000000", 8)):
        write_wav(str(chapter / f"{name}.wav"), _sig(1.0, sr=24000, seed=seed), 24000)
    (chapter / "84_121123.trans.tsv").write_text(
        "84_121123_000007_000001\tMaximilian!\tMaximilian.\n"
        "84_121123_000008_000000\tVillefort rose.\tVillefort rose.\n"
    )
    (chapter / "84_121123.book.tsv").write_text(
        "84_121123_000007_000001 x x 12.5\n84_121123_000008_000000 x x 7.25\n"
    )
    (root / "SPEAKERS.txt").write_text(";ID |SEX| SUBSET\n84 | F | dev-clean\n")

    theirs = RR.prepare_libritts(root, dataset_parts="dev-clean", link_previous_utt=True)
    mine = MR.prepare_libritts(root, dataset_parts="dev-clean", link_previous_utt=True)
    _assert_manifests_match(theirs, mine, "libritts")


# ---------------------------------------------------------------------------
# aidatatang_200zh
# ---------------------------------------------------------------------------
def test_aidatatang_matches_reference(tmp_path):
    # both implementations expect corpus_dir to CONTAIN aidatatang_200zh/
    root = tmp_path
    inner = root / "aidatatang_200zh"
    corpus = inner / "corpus"
    trans = inner / "transcript"
    trans.mkdir(parents=True)
    lines = []
    for part, spk, utt in (
        ("train", "G0002", "T0055G0002S0002"),
        ("dev", "G0003", "T0055G0003S0001"),
        ("test", "G0004", "T0055G0004S0001"),
    ):
        d = corpus / part / spk
        d.mkdir(parents=True, exist_ok=True)
        write_wav(str(d / f"{utt}.wav"), _sig(1.0), SR)
        lines.append(f"{utt} 今天 天气 很好")
    (trans / "aidatatang_200_zh_transcript.txt").write_text("\n".join(lines) + "\n")

    # not re-exported from the reference's recipes __init__; import directly
    from lhotse.recipes.aidatatang_200zh import (
        prepare_aidatatang_200zh as ref_prepare,
    )

    theirs = ref_prepare(root)
    mine = MR.prepare_aidatatang_200zh(root)
    _assert_manifests_match(theirs, mine, "aidatatang")


# ---------------------------------------------------------------------------
# tedlium
# ---------------------------------------------------------------------------
def test_tedlium_matches_reference(tmp_path):
    from lhotse_tpu.audio.sphio import write_sph

    root = tmp_path / "TEDLIUM_release-3"
    for split in ("dev",):
        sph = root / "legacy" / split / "sph"
        stm = root / "legacy" / split / "stm"
        sph.mkdir(parents=True)
        stm.mkdir(parents=True)
        write_sph(str(sph / "TalkA.sph"), _sig(5.0), SR)
        (stm / "TalkA.stm").write_text(
            "TalkA 1 spkA 0.00 2.50 <o,f0,male> hello {NOISE} world\n"
            "TalkA 1 spkA 2.50 3.00 <o,f0,male> ignore_time_segment_in_scoring\n"
            "TalkA 1 spkA 3.00 4.25 <o,f0,female> they 're here\n"
        )

    theirs = RR.prepare_tedlium(root, dataset_parts=["dev"])
    mine = MR.prepare_tedlium(root, dataset_parts=["dev"])
    _assert_manifests_match(theirs, mine, "tedlium")


# ---------------------------------------------------------------------------
# cmu_arctic
# ---------------------------------------------------------------------------
def test_cmu_arctic_matches_reference(tmp_path):
    pkg = tmp_path / "cmu_us_bdl_arctic"
    (pkg / "wav").mkdir(parents=True)
    (pkg / "etc").mkdir()
    for i, utt in enumerate(("arctic_a0001", "arctic_a0002")):
        write_wav(str(pkg / "wav" / f"{utt}.wav"), _sig(1.0, seed=i), SR)
    (pkg / "etc" / "txt.done.data").write_text(
        '( arctic_a0001 "Author of the danger trail." )\n'
        '( arctic_a0002 "Philip Steels etc." )\n'
    )
    theirs = RR.prepare_cmu_arctic(tmp_path)
    mine = MR.prepare_cmu_arctic(tmp_path)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "cmu_arctic")


# ---------------------------------------------------------------------------
# commonvoice
# ---------------------------------------------------------------------------
def test_commonvoice_matches_reference(tmp_path):
    root = tmp_path / "cv-corpus"
    for lang in ("en", "pl"):
        clips = root / lang / "clips"
        clips.mkdir(parents=True)
        rows = ["client_id\tpath\tsentence\tage\tgender\taccents\tvariant"]
        for i in range(2):
            name = f"common_voice_{lang}_{1000 + i}.wav"
            write_wav(str(clips / name), _sig(0.8, seed=i), SR)
            rows.append(
                f"spk{lang}{i}\t{name}\tSentence number {i}.\ttwenties\t"
                f"{'female' if i else 'male'}\taccent-{lang}\tv{i}"
            )
        (root / lang / "dev.tsv").write_text("\n".join(rows) + "\n")

    theirs = RR.prepare_commonvoice(
        root, tmp_path / "ref_out", languages=["en", "pl"], splits=["dev"]
    )
    mine = MR.prepare_commonvoice(
        root, tmp_path / "my_out", languages=["en", "pl"], splits=["dev"]
    )
    assert set(theirs) == set(mine)
    for lang in theirs:
        _assert_manifests_match(theirs[lang], mine[lang], f"commonvoice[{lang}]")


# ---------------------------------------------------------------------------
# baker_zh
# ---------------------------------------------------------------------------
def test_baker_zh_matches_reference(tmp_path):
    root = tmp_path / "BZNSYP"
    (root / "Wave").mkdir(parents=True)
    (root / "PhoneLabeling").mkdir(parents=True)
    (root / "ProsodyLabeling").mkdir(parents=True)
    labels = []
    for i in range(2):
        rid = f"00000{1 + i}"
        write_wav(str(root / "Wave" / f"{rid}.wav"), _sig(1.0, seed=i), SR)
        labels.append(f"{rid}\t卡尔普#2陪外孙#1玩滑梯#4。")
        labels.append("\tka2 er2 pu3 pei2 wai4 sun1 wan2 hua2 ti1")
    (root / "ProsodyLabeling" / "000001-010000.txt").write_text(
        "\n".join(labels) + "\n"
    )
    theirs = RR.prepare_baker_zh(root)
    mine = MR.prepare_baker_zh(root)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "baker_zh")


# ---------------------------------------------------------------------------
# mobvoihotwords
# ---------------------------------------------------------------------------
def test_mobvoihotwords_matches_reference(tmp_path):
    import json

    data = tmp_path / "mobvoi_hotword_dataset"
    res = tmp_path / "mobvoi_hotword_dataset_resources"
    data.mkdir()
    res.mkdir()
    k = 0
    for part in ("train", "dev", "test"):
        for polarity, kw in (("p", 0), ("n", -1)):
            utt = f"utt{k}"
            k += 1
            write_wav(str(data / f"{utt}.wav"), _sig(1.0, seed=k), SR)
            (res / f"{polarity}_{part}.json").write_text(
                json.dumps(
                    [{"utt_id": utt, "speaker_id": f"spk{k}", "keyword_id": kw}]
                )
            )
    theirs = RR.prepare_mobvoihotwords(tmp_path)
    mine = MR.prepare_mobvoihotwords(tmp_path)
    _assert_manifests_match(theirs, mine, "mobvoihotwords")


# ---------------------------------------------------------------------------
# primewords
# ---------------------------------------------------------------------------
def test_primewords_matches_reference(tmp_path):
    import json

    root = tmp_path / "primewords_md_2018_set1"
    root.mkdir()
    (root / "set1_transcript.json").write_text(
        json.dumps(
            [
                {"file": "a1.wav", "text": "第 一 句", "user_id": 100},
                {"file": "b2.wav", "text": "第 二 句", "user_id": 200},
            ]
        ),
        encoding="utf-8",
    )
    for sub, name, seed in (("0/00", "a1.wav", 5), ("1/11", "b2.wav", 6)):
        d = root / "audio_files" / sub
        d.mkdir(parents=True)
        write_wav(str(d / name), _sig(1.0, seed=seed), SR)

    from lhotse.recipes.primewords import prepare_primewords as ref_prepare

    theirs = ref_prepare(tmp_path)
    mine = MR.prepare_primewords(tmp_path)
    # Pinned deviation: the reference passes the raw JSON ``user_id`` int as
    # SupervisionSegment.speaker; we stringify it (speaker is a str field).
    for part in theirs:
        for s in theirs[part]["supervisions"]:
            assert isinstance(s.speaker, int)
            s.speaker = str(s.speaker)
    _assert_manifests_match(theirs, mine, "primewords")


# ---------------------------------------------------------------------------
# audio_mnist
# ---------------------------------------------------------------------------
def test_audio_mnist_matches_reference(tmp_path):
    import json

    data = tmp_path / "data"
    data.mkdir(parents=True)
    # the reference hard-asserts 60 speakers in the metadata (audio_mnist.py:87)
    meta = {
        f"{i:02d}": {"age": 20 + i, "gender": "male" if i % 2 else "female", "accent": "german"}
        for i in range(1, 61)
    }
    (data / "audioMNIST_meta.txt").write_text(json.dumps(meta))
    for i in (1, 2):
        (data / f"{i:02d}").mkdir()
        write_wav(str(data / f"{i:02d}" / f"0_{i:02d}_0.wav"), _sig(0.6, sr=48000, seed=i), 48000)

    from lhotse.recipes.audio_mnist import prepare_audio_mnist as ref_prepare

    theirs = ref_prepare(tmp_path, tmp_path / "ref_out")
    mine = MR.prepare_audio_mnist(tmp_path, tmp_path / "my_out")
    _assert_manifests_match({"all": theirs}, {"all": mine}, "audio_mnist")


# ---------------------------------------------------------------------------
# aishell3
# ---------------------------------------------------------------------------
def test_aishell3_matches_reference_modulo_its_bugs(tmp_path):
    (tmp_path / "spk-info.txt").write_text("# header\nSSB0005\tA\tfemale\tnorth\n")
    (tmp_path / "train" / "wav" / "SSB0005").mkdir(parents=True)
    (tmp_path / "test" / "wav" / "SSB0005").mkdir(parents=True)
    (tmp_path / "train" / "label_train-set.txt").write_text(
        "#\nSSB00050001|ni2 hao3|你好\n"
    )
    write_wav(
        str(tmp_path / "train" / "wav" / "SSB0005" / "SSB00050001.wav"),
        _sig(1.0, sr=44100, seed=63),
        44100,
    )
    (tmp_path / "train" / "content.txt").write_text("SSB00050001.wav\t你 ni2 好 hao3\n")
    write_wav(
        str(tmp_path / "test" / "wav" / "SSB0005" / "SSB00050002.wav"),
        _sig(1.0, sr=44100, seed=64),
        44100,
    )
    (tmp_path / "test" / "content.txt").write_text("SSB00050002.wav\t世 shi4 界 jie4\n")

    theirs = RR.prepare_aishell3(tmp_path)
    mine = MR.prepare_aishell3(tmp_path)
    # Two pinned reference bugs (kept fixed on our side):
    # 1. the reference returns its dict with recordings/supervisions keys
    #    SWAPPED (reference recipes/aishell3.py:172; the files it writes to
    #    output_dir are correct, only the in-memory return is inverted);
    # 2. its `pinyin` custom field is computed from the already-rebound
    #    character text, so it is always empty — ours carries the real
    #    pinyin from content.txt.
    assert set(theirs) == set(mine)
    for part in theirs:
        ref_recs = _canon_set(theirs[part]["supervisions"])  # swapped!
        ref_sups = _canon_set(theirs[part]["recordings"])  # swapped!
        my_recs = _canon_set(mine[part]["recordings"])
        my_sups = _canon_set(mine[part]["supervisions"])
        assert ref_recs == my_recs, f"aishell3[{part}] recordings differ"
        for t, m in zip(ref_sups, my_sups):
            assert t.get("custom", {}).get("pinyin", "") == ""
            m = dict(m, custom={**m.get("custom", {}), "pinyin": ""})
            m["custom"] = {k: v for k, v in m["custom"].items() if v != ""} or None
            t = dict(t, custom={k: v for k, v in t.get("custom", {}).items() if v != ""} or None)
            t = {k: v for k, v in t.items() if v is not None}
            m = {k: v for k, v in m.items() if v is not None}
            assert t == m, f"aishell3[{part}] supervisions differ beyond the pinyin bug"


# ---------------------------------------------------------------------------
# hifitts
# ---------------------------------------------------------------------------
def test_hifitts_matches_reference(tmp_path):
    import json

    (tmp_path / "audio" / "book1").mkdir(parents=True)
    write_wav(str(tmp_path / "audio" / "book1" / "utt1.wav"), _sig(1.0, sr=44100), 44100)
    row = {
        "audio_filepath": "audio/book1/utt1.wav",
        "text": "hello world",
        "text_normalized": "Hello, world!",
        "duration": 1.0,
    }
    (tmp_path / "92_manifest_clean_train.json").write_text(json.dumps(row) + "\n")

    theirs = RR.prepare_hifitts(tmp_path)
    mine = MR.prepare_hifitts(tmp_path)
    _assert_manifests_match(theirs, mine, "hifitts")


# ---------------------------------------------------------------------------
# mdcc
# ---------------------------------------------------------------------------
def test_mdcc_matches_reference(tmp_path):
    (tmp_path / "audio").mkdir()
    (tmp_path / "transcription").mkdir()
    write_wav(str(tmp_path / "audio" / "1.wav"), _sig(1.0, seed=89), SR)
    (tmp_path / "transcription" / "1.txt").write_text("早晨")
    for part in ("train", "valid", "test"):
        (tmp_path / f"cnt_asr_{part}_metadata.csv").write_text(
            "audio_path,text_path,gender,duration\n"
            + ("./audio/1.wav,./transcription/1.txt,F,1.0\n" if part == "train" else "")
        )

    theirs = RR.prepare_mdcc(tmp_path, dataset_parts=["train"])
    mine = MR.prepare_mdcc(tmp_path, dataset_parts=["train"])
    _assert_manifests_match(theirs, mine, "mdcc")


# ---------------------------------------------------------------------------
# atcosim
# ---------------------------------------------------------------------------
def test_atcosim_matches_reference(tmp_path):
    txt = tmp_path / "TXTdata"
    txt.mkdir(parents=True)
    (tmp_path / "WAVdata" / "d1" / "s1").mkdir(parents=True)
    write_wav(
        str(tmp_path / "WAVdata" / "d1" / "s1" / "u1.wav"),
        _sig(2.0, sr=32000, seed=35),
        32000,
    )
    (txt / "fulldata.csv").write_text(
        "recording_id,directory,subdirectory,filename,length_sec,speaker_id,"
        "transcription,recording_corrupt\n"
        "rec1,d1,s1,u1,2.0,zf1,contact =wien <OT>ok</OT> hm,0\n"
        "rec2,d1,s1,u2,2.0,zm2,broken file,1\n"
    )
    # the reference crashes with output_dir=None (atcosim.py:193 joins None
    # with a filename) — both sides get an output dir; both return a
    # (recordings, supervisions) TUPLE (the reference's docstring claims a
    # dict but its code returns a tuple, atcosim.py:254)
    t_recs, t_sups = RR.prepare_atcosim(tmp_path, tmp_path / "ref_out")
    m_recs, m_sups = MR.prepare_atcosim(tmp_path, tmp_path / "my_out")
    theirs = {"all": {"recordings": t_recs, "supervisions": t_sups}}
    mine = {"all": {"recordings": m_recs, "supervisions": m_sups}}
    _assert_manifests_match(theirs, mine, "atcosim")


# ---------------------------------------------------------------------------
# l2_arctic
# ---------------------------------------------------------------------------
def test_l2_arctic_matches_reference(tmp_path):
    spk = tmp_path / "aba"
    (spk / "wav").mkdir(parents=True)
    (spk / "transcript").mkdir()
    write_wav(str(spk / "wav" / "arctic_a0001.wav"), _sig(1.0, seed=3), SR)
    (spk / "transcript" / "arctic_a0001.txt").write_text("Author of the danger trail.")
    (tmp_path / "suitcase_corpus" / "wav").mkdir(parents=True)
    (tmp_path / "suitcase_corpus" / "transcript").mkdir(parents=True)
    write_wav(str(tmp_path / "suitcase_corpus" / "wav" / "aba.wav"), _sig(1.0, seed=4), SR)
    (tmp_path / "suitcase_corpus" / "transcript" / "aba.txt").write_text("free talk")

    theirs = RR.prepare_l2_arctic(tmp_path)
    mine = MR.prepare_l2_arctic(tmp_path)
    _assert_manifests_match(theirs, mine, "l2_arctic")


# ---------------------------------------------------------------------------
# heroico
# ---------------------------------------------------------------------------
def test_heroico_matches_reference(tmp_path):
    speech = tmp_path / "speech"
    trans = tmp_path / "transcripts"
    trans.mkdir()
    for sub, seed in (
        ("Answers_Spanish/1/7.wav", 7),
        ("Recordings_Spanish/1/100.wav", 8),
        ("Recordings_Spanish/1/400.wav", 9),
        ("usma/native-f-maria/s3.wav", 10),
    ):
        p = speech / sub
        p.parent.mkdir(parents=True, exist_ok=True)
        write_wav(str(p), _sig(1.0, seed=seed), SR)
    (trans / "heroico-answers.txt").write_text("1/7\thola amigo\n", encoding="iso-8859-1")
    (trans / "heroico-recordings.txt").write_text(
        "100\tbuenos dias\n400\trepeticion\n", encoding="iso-8859-1"
    )
    (trans / "usma-prompts.txt").write_text("s3\tcomo estas\n", encoding="iso-8859-1")

    # The reference recipe cannot run at all: heroico.py:271 iterates
    # `audio.recordings` (Recording objects) and indexes the metadata dict
    # with them -> TypeError. Ours must produce the documented folds.
    with pytest.raises(TypeError):
        RR.prepare_heroico(speech, trans)
    mine = MR.prepare_heroico(speech, trans)
    assert {s.text for s in mine["train"]["supervisions"]} == {"hola amigo", "buenos dias"}
    assert [s.text for s in mine["devtest"]["supervisions"]] == ["repeticion"]
    assert [s.text for s in mine["test"]["supervisions"]] == ["como estas"]


# ---------------------------------------------------------------------------
# switchboard
# ---------------------------------------------------------------------------
def test_switchboard_matches_reference(tmp_path):
    from lhotse_tpu.audio.sphio import write_sph

    audio_dir = tmp_path / "audio"
    trans_dir = tmp_path / "trans"
    audio_dir.mkdir()
    trans_dir.mkdir()
    rng = np.random.RandomState(0)
    data = (0.1 * rng.randn(2, 4 * SR)).astype(np.float32)
    write_sph(str(audio_dir / "sw02001.sph"), data, SR)
    (trans_dir / "sw2001A-ms98-a-trans.text").write_text(
        "sw2001A-ms98-a-0001 0.00 1.50 hello there\n"
        "sw2001A-ms98-a-0002 1.50 2.00 [silence]\n"
        "sw2001A-ms98-a-0003 2.00 3.75 how are you\n"
    )
    (trans_dir / "sw2001B-ms98-a-trans.text").write_text(
        "sw2001B-ms98-a-0001 0.50 2.20 fine thanks\n"
    )
    theirs = RR.prepare_switchboard(
        audio_dir, transcripts_dir=trans_dir, absolute_paths=True
    )
    mine = MR.prepare_switchboard(
        audio_dir, transcripts_dir=trans_dir, absolute_paths=True
    )
    # Pinned reference bug (kept fixed here): switchboard.py:112 hardcodes
    # speaker=f"{recording.id}A" for BOTH channels; we use the actual side.
    for s in theirs["supervisions"]:
        assert s.speaker.endswith("A")
        s.speaker = s.speaker[:-1] + "AB"[s.channel]
    _assert_manifests_match({"all": theirs}, {"all": mine}, "switchboard")


# ---------------------------------------------------------------------------
# babel
# ---------------------------------------------------------------------------
def test_babel_matches_reference(tmp_path):
    stem = "BABEL_BP_101_10033_20111024_205740_inLine"
    conv = tmp_path / "conversational"
    (conv / "training" / "audio").mkdir(parents=True)
    write_wav(str(conv / "training" / "audio" / f"{stem}.sph"), _sig(3.0, seed=90), SR)
    tdir = conv / "training" / "transcription"
    tdir.mkdir(parents=True)
    (tdir / f"{stem}.txt").write_text("[0.0]\n<no-speech>\n[0.5]\nhello ((  ))\n[2.0]\n")
    # every split needs content: the reference's validator crashes on the
    # empty manifests an empty split produces (qa.py:453 IndexError)
    for split, ext in (("dev", "10034"), ("eval", "10035")):
        stem2 = f"BABEL_BP_101_{ext}_20111024_205740_inLine"
        (conv / split / "audio").mkdir(parents=True)
        (conv / split / "transcription").mkdir(parents=True)
        write_wav(str(conv / split / "audio" / f"{stem2}.sph"), _sig(2.0, seed=int(ext)), SR)
        (conv / split / "transcription" / f"{stem2}.txt").write_text(
            "[0.0]\nhi there\n[1.5]\n"
        )

    theirs = RR.prepare_single_babel_language(tmp_path)
    mine = MR.prepare_single_babel_language(tmp_path)
    _assert_manifests_match(theirs, mine, "babel")


# ---------------------------------------------------------------------------
# dihard3
# ---------------------------------------------------------------------------
def test_dihard3_matches_reference(tmp_path):
    rng = np.random.RandomState(0)

    def build(split, rids):
        root = tmp_path / f"dihard_{split}"
        (root / "flac").mkdir(parents=True)
        # the real corpus ships a 9-column recordings.tbl (the reference
        # unpacks exactly 9 fields, dihard3.py:108)
        rows = ["recording_id in_core lang domain source dur x y z"]
        for rid in rids:
            write_flac(
                str(root / "flac" / f"{rid}.flac"),
                (0.1 * rng.randn(1, 3 * SR)).astype(np.float32),
                SR,
            )
            (root / "flac" / f"{rid}.rttm").write_text(
                f"SPEAKER {rid} 1 0.50 1.00 <NA> <NA> spkA <NA> <NA>\n"
                f"SPEAKER {rid} 1 1.80 0.70 <NA> <NA> spkB <NA> <NA>\n"
            )
            (root / "flac" / f"{rid}.uem").write_text(f"{rid} 1 0.25 2.75\n")
            rows.append(f"{rid} True eng clinical ldc 3.0 a b c")
        (root / "recordings.tbl").write_text("\n".join(rows) + "\n")
        return root

    dev = build("dev", ("DH_DEV_0001", "DH_DEV_0002"))
    ev = build("eval", ("DH_EVAL_0001",))
    theirs = RR.prepare_dihard3(dev_audio_dir=dev, eval_audio_dir=ev)
    mine = MR.prepare_dihard3(dev_audio_dir=dev, eval_audio_dir=ev)
    _assert_manifests_match(theirs, mine, "dihard3")


# ---------------------------------------------------------------------------
# daily_talk
# ---------------------------------------------------------------------------
def test_daily_talk_matches_reference(tmp_path):
    import json

    (tmp_path / "data" / "0").mkdir(parents=True)
    for name, seed in (("0_0_d0.wav", 11), ("1_1_d0.wav", 12)):
        write_wav(str(tmp_path / "data" / "0" / name), _sig(1.0, seed=seed), SR)
    meta = {
        "0": {
            "0": {"index": 0, "text": "hi there", "speaker": 0, "turn": 0,
                  "topic": "greeting", "emotion": "none", "act": "inform"},
            "1": {"index": 1, "text": "hello", "speaker": 1, "turn": 1,
                  "topic": "greeting", "emotion": "none", "act": "inform"},
        }
    }
    (tmp_path / "metadata.json").write_text(json.dumps(meta))

    t_recs, t_sups = RR.prepare_daily_talk(tmp_path)
    m_recs, m_sups = MR.prepare_daily_talk(tmp_path)
    _assert_manifests_match(
        {"all": {"recordings": t_recs, "supervisions": t_sups}},
        {"all": {"recordings": m_recs, "supervisions": m_sups}},
        "daily_talk",
    )


# ---------------------------------------------------------------------------
# cslu_kids
# ---------------------------------------------------------------------------
def test_cslu_kids_matches_reference(tmp_path):
    for sub, seed in (
        ("speech/scripted/00/0/ks001/ks001000.wav", 48),
        ("speech/spontaneous/01/0/ks002/ks002xx0.wav", 49),
    ):
        p = tmp_path / sub
        p.parent.mkdir(parents=True, exist_ok=True)
        write_wav(str(p), _sig(1.0, seed=seed), SR)
    (tmp_path / "docs").mkdir(parents=True)
    (tmp_path / "docs" / "all.map").write_text('00 "the word"\n01 "ignored"\n')
    (tmp_path / "docs" / "00-verified.txt").write_text("x/ks001000.wav 1\n")
    tdir = tmp_path / "trans" / "spontaneous" / "01" / "0" / "ks002"
    tdir.mkdir(parents=True)
    (tdir / "ks002xx0.txt").write_text("hello <bn> world\n")

    theirs = RR.prepare_cslu_kids(tmp_path)
    mine = MR.prepare_cslu_kids(tmp_path)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "cslu_kids")


# ---------------------------------------------------------------------------
# himia
# ---------------------------------------------------------------------------
def test_himia_matches_reference(tmp_path):
    tr = tmp_path / "train" / "SPEECHDATA"
    (tr / "SV0001").mkdir(parents=True)
    write_wav(str(tr / "SV0001" / "SV0001_1_01.wav"), _sig(1.0, seed=55), SR)
    (tr / "train.scp").write_text("SV0001/SV0001_1_01.wav\n")
    (tmp_path / "cw_test" / "16k_wav_file").mkdir(parents=True)
    write_wav(
        str(tmp_path / "cw_test" / "16k_wav_file" / "CW0001_1.wav"),
        _sig(1.0, seed=56),
        SR,
    )
    res = tmp_path / "cw_test" / "resource"
    res.mkdir(parents=True)
    (res / "transcription.txt").write_text("CW0001_1.wav 你好米你\n", encoding="utf-8")

    # The reference hard-asserts the FULL corpus inventory (himia.py:257
    # compares transcript counts to hardcoded totals like 993083) — it
    # cannot run on a subset at all; ours handles any subset.
    with pytest.raises(AssertionError):
        RR.prepare_himia(tmp_path, dataset_parts=("train", "cw_test"))
    mine = MR.prepare_himia(tmp_path, dataset_parts=("train", "cw_test"))
    assert [s.text for s in mine["cw_test"]["supervisions"]] == ["你好米你"]
    assert [s.speaker for s in mine["train"]["supervisions"]] == ["SV0001"]


# ---------------------------------------------------------------------------
# mls
# ---------------------------------------------------------------------------
def test_mls_matches_reference(tmp_path):
    root = tmp_path / "mls"
    lang_dir = root / "mls_polish"
    lang_dir.mkdir(parents=True)
    (lang_dir / "metainfo.txt").write_text("1234 | F | train | 10.5\n")
    for split in ("train", "dev", "test"):
        split_dir = lang_dir / split / "audio" / "1234" / "5678"
        split_dir.mkdir(parents=True)
        write_flac(str(split_dir / f"1234_5678_{split}.flac"), _sig(1.0, seed=1), SR)
        (lang_dir / split / "transcripts.txt").write_text(
            f"1234_5678_{split}\tdzien dobry\n"
        )
    theirs = RR.prepare_mls(root, opus=False)
    mine = MR.prepare_mls(root, opus=False)
    assert set(theirs) == set(mine)
    for lang in theirs:
        _assert_manifests_match(theirs[lang], mine[lang], f"mls[{lang}]")


# ---------------------------------------------------------------------------
# librilight
# ---------------------------------------------------------------------------
def test_librilight_matches_reference(tmp_path):
    import json

    # the reference iterates all three parts unconditionally and its
    # validator crashes on an empty one — populate each
    for part, spk, seed in (("small", "100", 41), ("medium", "200", 42), ("large", "300", 43)):
        d = tmp_path / part / spk / "book1"
        d.mkdir(parents=True)
        write_flac(str(d / "chapter1.flac"), _sig(2.0, seed=seed), SR)
        (d / "chapter1.json").write_text(
            json.dumps({"speaker": spk, "voice_activity": [[0.1, 0.9], [1.2, 1.8]]})
        )
    theirs = RR.prepare_librilight(tmp_path)
    mine = MR.prepare_librilight(tmp_path)
    _assert_manifests_match(theirs, mine, "librilight")


# ---------------------------------------------------------------------------
# earnings22
# ---------------------------------------------------------------------------
def test_earnings22_matches_reference(tmp_path):
    (tmp_path / "media").mkdir()
    # corpus ships mp3; payload is RIFF behind an .mp3 name (decoded by magic)
    write_wav(str(tmp_path / "media" / "4320211.mp3"), _sig(2.0, seed=10), SR)
    (tmp_path / "metadata.csv").write_text(
        "source_id,a,b,c,d,lang,end\n4320211,x,y,z,w,en-US,0\n"
    )
    nlp = tmp_path / "transcripts" / "nlp_references"
    nlp.mkdir(parents=True)
    (nlp / "4320211.nlp").write_text(
        "token|speaker|ts|endTs|punct|prepunct|case|tags|wer_tags\n"
        "hello|1|||||||\n"
        "world|1|||||||\n"
    )
    # The reference hard-asserts the full 125-file corpus inventory
    # (earnings22.py:123) — it cannot run on a subset; ours handles any.
    with pytest.raises(AssertionError):
        RR.prepare_earnings22(tmp_path)
    m_recs, m_sups = MR.prepare_earnings22(tmp_path)
    sups = list(m_sups)
    assert len(list(m_recs)) == 1 and len(sups) == 1
    assert sups[0].text == "hello world"


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


def _multi_wav(path, seconds, seed, channels):
    rng = np.random.RandomState(seed)
    path.parent.mkdir(parents=True, exist_ok=True)
    write_wav(
        str(path), (rng.randn(channels, int(SR * seconds)) * 0.1).astype(np.float32), SR
    )


# ---------------------------------------------------------------------------
# ali_meeting (uses the textgrid stub in tests/_refstubs/)
# ---------------------------------------------------------------------------
def test_ali_meeting_matches_reference(tmp_path):
    # all three parts need content (the reference validator crashes on an
    # empty one); Eval/Test are nested one level deeper
    layouts = {
        "Train": tmp_path / "Train_Ali_far",
        "Eval": tmp_path / "Eval_Ali" / "Eval_Ali_far",
        "Test": tmp_path / "Test_Ali" / "Test_Ali_far",
    }
    for i, (part, base) in enumerate(layouts.items()):
        sid = f"R000{i + 1}_M000{i + 1}"
        _multi_wav(base / "audio_dir" / f"{sid}.wav", 2.0, 80 + i, 8)
        (base / "textgrid_dir").mkdir(parents=True)
        (base / "textgrid_dir" / f"{sid}.TextGrid").write_text(
            _TEXTGRID.format(tier=f"F_SPK009{i}")
        )
    theirs = RR.prepare_ali_meeting(tmp_path, mic="far")
    mine = MR.prepare_ali_meeting(tmp_path, mic="far")
    _assert_manifests_match(theirs, mine, "ali_meeting")


# ---------------------------------------------------------------------------
# aishell4
# ---------------------------------------------------------------------------
def test_aishell4_matches_reference(tmp_path):
    # all four parts need content (empty-manifest validator crash otherwise)
    for i, part in enumerate(("train_L", "train_M", "train_S", "test")):
        sid = f"L_R00{i + 1}S01C01"
        (tmp_path / part / "wav").mkdir(parents=True)
        write_flac(str(tmp_path / part / "wav" / f"{sid}.flac"), _sig(2.0, seed=81 + i), SR)
        (tmp_path / part / "TextGrid").mkdir(parents=True)
        (tmp_path / part / "TextGrid" / f"{sid}.TextGrid").write_text(
            _TEXTGRID.format(tier="1")
        )
    theirs = RR.prepare_aishell4(tmp_path)
    mine = MR.prepare_aishell4(tmp_path)
    _assert_manifests_match(theirs, mine, "aishell4")


# ---------------------------------------------------------------------------
# tedlium2
# ---------------------------------------------------------------------------
def test_tedlium2_matches_reference(tmp_path):
    from lhotse_tpu.audio.sphio import write_sph

    for part in ("train", "dev", "test"):
        root = tmp_path / part
        (root / "sph").mkdir(parents=True)
        (root / "stm").mkdir(parents=True)
        write_sph(str(root / "sph" / "TalkA.sph"), _sig(3.0, seed=82), SR)
        (root / "stm" / "TalkA.stm").write_text(
            "TalkA 1 TalkA_spk 0.00 2.50 <o,f0,male> hello world\n"
        )
    theirs = RR.prepare_tedlium2(tmp_path)
    mine = MR.prepare_tedlium2(tmp_path)
    _assert_manifests_match(theirs, mine, "tedlium2")


# ---------------------------------------------------------------------------
# eval2000
# ---------------------------------------------------------------------------
def test_eval2000_matches_reference(tmp_path):
    from lhotse_tpu.audio.sphio import write_sph

    audio = tmp_path / "LDC2002S09" / "hub5e_00" / "english"
    audio.mkdir(parents=True)
    rng = np.random.RandomState(71)
    write_sph(
        str(audio / "en_4156.sph"),
        (rng.randn(2, 16000) * 0.1).astype(np.float32),
        8000,
    )
    trans = tmp_path / "LDC2002T43" / "reference" / "english"
    trans.mkdir(parents=True)
    (trans / "en_4156.txt").write_text(
        "# header line\n\n0.00 1.10 A: yeah right\n1.10 1.95 B: uh huh\n"
    )
    theirs = RR.prepare_eval2000(tmp_path, tmp_path / "ref_out", absolute_paths=True)
    mine = MR.prepare_eval2000(tmp_path, tmp_path / "my_out", absolute_paths=True)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "eval2000")


# ---------------------------------------------------------------------------
# voxceleb1
# ---------------------------------------------------------------------------
def test_voxceleb1_matches_reference(tmp_path, monkeypatch):
    # the reference downloads 'voxceleb_trials.txt' into the CWD mid-prepare
    # (voxceleb.py:347) — keep its litter inside the temp dir
    monkeypatch.chdir(tmp_path)
    root = tmp_path / "voxceleb1"
    layout = [
        ("id10001", "sess1", "00001"),
        ("id10001", "sess1", "00002"),
        ("id10270", "x6uY", "00001"),
        ("id10270", "x6uY", "00002"),
        ("id10271", "zzz1", "00001"),
    ]
    for i, (spk, sess, utt) in enumerate(layout):
        d = root / "wav" / spk / sess
        d.mkdir(parents=True, exist_ok=True)
        write_wav(str(d / f"{utt}.wav"), _sig(0.5, seed=i), SR)
    (root / "vox1_meta.csv").write_text(
        "ID\tName\tGender\tNationality\tSet\n"
        "id10001\tA_Speaker\tf\tIreland\tdev\n"
        "id10270\tB_Speaker\tm\tUSA\ttest\n"
        "id10271\tC_Speaker\tf\tUK\ttest\n"
    )
    # The reference downloads speaker metadata from the web inside prepare
    # (voxceleb.py fetches vox1_meta.csv regardless of local copies) — with
    # no egress it cannot run; ours reads the local metadata file.
    import urllib.error

    with pytest.raises(urllib.error.URLError):
        RR.prepare_voxceleb(voxceleb1_root=root)
    mine = MR.prepare_voxceleb(voxceleb1_root=root)
    sups = {s.id: s for s in mine["train"]["supervisions"]}
    assert sups["id10001-sess1-00001"].speaker == "id10001"
    assert sups["id10001-sess1-00001"].custom["nationality"] == "Ireland"
    assert len(list(mine["test"]["recordings"])) == 3


# ---------------------------------------------------------------------------
# gale_arabic
# ---------------------------------------------------------------------------
def test_gale_arabic_matches_reference(tmp_path):
    def tdf(rows):
        return "\n".join(["h1\th2", ";;junk", "more junk"] + rows) + "\n"

    def row(reco, ch, start, end, spk, text):
        return "\t".join(
            [f"{reco}.sph", str(ch), str(start), str(end), spk, "male", "MSA",
             text, "1", "2", "3", "report", "statement"]
        )

    audio = tmp_path / "audio"
    trans = tmp_path / "trans"
    audio.mkdir()
    trans.mkdir()
    rng = np.random.RandomState(0)
    train_id = "SOMECHAN_NEWS_ARB_20070101_120000"
    test_id = "ALAM_WITHEVENT_ARB_20070116_205800"  # pinned test-list member
    for rid in (train_id, test_id):
        write_wav(
            str(audio / f"{rid}.wav"),
            (0.1 * rng.randn(1, 3 * SR)).astype(np.float32),
            SR,
        )
    (trans / "a.tdf").write_text(
        tdf(
            [
                row(train_id, 0, 0.5, 1.6, "spk1", "مرحبا"),
                row(test_id, 0, 0.0, 1.0, "spk2", "السلام"),
            ]
        )
    )
    # The reference's TDF parser passes the long-removed pandas kwarg
    # error_bad_lines (gale_arabic.py:174; dropped in pandas 2.x) — it
    # cannot run with a modern pandas; ours parses TDF natively.
    with pytest.raises(TypeError):
        RR.prepare_gale_arabic([audio], [trans])
    mine = MR.prepare_gale_arabic([audio], [trans])
    train_sups = list(mine["train"]["supervisions"])
    test_sups = list(mine["test"]["supervisions"])
    assert [s.text for s in train_sups] == ["مرحبا"]
    assert [s.text for s in test_sups] == ["السلام"]


# ---------------------------------------------------------------------------
# ami (IHM, NXT annotations)
# ---------------------------------------------------------------------------
def test_ami_ihm_matches_reference(tmp_path):
    import importlib
    import sys as _sys

    if "tests" not in _sys.path:
        pass
    t16 = importlib.import_module("tests.test_recipes_tranche16")

    data = tmp_path / "amicorpus"
    ann = tmp_path / "annotations"
    (ann / "corpusResources").mkdir(parents=True)
    (ann / "segments").mkdir()
    (ann / "words").mkdir()
    rng = np.random.RandomState(0)
    xs = []
    for m_id, two in (("ES2011a", True), ("ES2002a", False), ("ES2004a", False)):
        xml, files = t16._add_meeting(data, ann, m_id, rng, two_speakers=two)
        xs.append(xml)
        for name, content in files:
            sub = "segments" if "segments" in name else "words"
            (ann / sub / name).write_text(content)
    (ann / "corpusResources" / "meetings.xml").write_text(
        "<corpus>" + "".join(xs) + "</corpus>"
    )

    theirs = RR.prepare_ami(data, annotations_dir=ann, mic="ihm", partition="full-corpus")
    mine = MR.prepare_ami(data, annotations_dir=ann, mic="ihm", partition="full-corpus")
    _assert_manifests_match(theirs, mine, "ami")


# ---------------------------------------------------------------------------
# speechcommands
# ---------------------------------------------------------------------------
def test_speechcommands_matches_reference(tmp_path):
    main = tmp_path / "speech_commands_v0.02"
    for sub, seed in (
        ("yes/aaa_nohash_0.wav", 13),
        ("yes/bbb_nohash_0.wav", 14),
        ("no/ccc_nohash_0.wav", 15),
        ("_background_noise_/running_tap.wav", 16),
    ):
        p = main / sub
        p.parent.mkdir(parents=True, exist_ok=True)
        write_wav(str(p), _sig(1.0, seed=seed), SR)
    (main / "validation_list.txt").write_text("yes/bbb_nohash_0.wav\n")
    (main / "testing_list.txt").write_text("no/ccc_nohash_0.wav\n")
    test_root = tmp_path / "speech_commands_test_set_v0.02"
    for sub, seed in (
        ("yes/ddd_nohash_0.wav", 17),
        ("_unknown_/bed_0c40e715_nohash_0.wav", 18),
        ("_silence_/running_tap_0.wav", 19),
    ):
        p = test_root / sub
        p.parent.mkdir(parents=True, exist_ok=True)
        write_wav(str(p), _sig(1.0, seed=seed), SR)

    theirs = RR.prepare_speechcommands("2", tmp_path)
    mine = MR.prepare_speechcommands("2", tmp_path)
    _assert_manifests_match(theirs, mine, "speechcommands")


# ---------------------------------------------------------------------------
# icsi (IHM, MRT annotations)
# ---------------------------------------------------------------------------
def test_icsi_ihm_matches_reference(tmp_path):
    audio = tmp_path / "speech"
    trans = tmp_path / "transcripts"
    (trans / "Segments").mkdir(parents=True)
    (trans / "Words").mkdir()
    from lhotse_tpu.audio.sphio import write_sph

    meetings = ["Bdb001", "Bmr021", "Bmr013"]  # one per official partition
    preambles = ['<?xml version="1.0"?>', "<Meetings>"]
    for mi, meet in enumerate(meetings):
        d = audio / meet
        d.mkdir(parents=True)
        for ch in ("0", "1"):
            write_sph(str(d / f"chan{ch}.sph"), _sig(10.0, seed=100 + 2 * mi + int(ch)), SR)
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

    # The reference cannot probe SPHERE audio without the external sph2pipe
    # binary (audio/backend.py:1630; not installed here and not
    # pip-installable) — ours decodes SPHERE natively.
    with pytest.raises(Exception):
        RR.prepare_icsi(audio, transcripts_dir=trans, mic="ihm")
    mine = MR.prepare_icsi(audio, transcripts_dir=trans, mic="ihm")
    recs = mine["train"]["recordings"]
    assert len(recs.to_eager()) == 1 and recs["Bdb001"].num_channels == 2
    sups = sorted(mine["train"]["supervisions"], key=lambda s: s.start)
    assert sups[0].text == "OKAY LET'S START" and sups[1].text == "YEAH"


# ---------------------------------------------------------------------------
# edacc
# ---------------------------------------------------------------------------
def test_edacc_matches_reference(tmp_path):
    root = tmp_path / "edacc_v1.0"
    (root / "data").mkdir(parents=True)
    write_wav(str(root / "data" / "EDACC-C06.wav"), _sig(4.0, sr=32000, seed=12), 32000)
    (root / "linguistic_background.csv").write_text(
        "PARTICIPANT_ID,What is your gender?,What’s your ethnic background? ,"
        "What is your higher level of education?,"
        '"How would you describe your accent in English? (e.g. Italian, Glaswegian)",'
        '"Do you speak any second languages? separate them with commas  '
        '(e.g., Mandarin,Catalan,French )",'
        '"What’s your year of birth? (e.g., 1992)",'
        '"What year did you start learning English? (e.g., 1999)"\n'
        'P1,male,white,MSc,Italian,"French,Spanish",1992,1999\n',
        encoding="utf-8",
    )
    for split in ("dev", "test"):
        d = root / split
        d.mkdir(parents=True)
        (d / "segments").write_text("EDACC-C06-A-1 EDACC-C06 0.5 2.0\n")
        (d / "text").write_text("EDACC-C06-A-1 hello there\n")
        (d / "utt2spk").write_text("EDACC-C06-A-1 P1\n")
        (d / "conv.list").write_text("EDACC-C06\n" if split == "dev" else "")

    theirs = RR.prepare_edacc(tmp_path)
    mine = MR.prepare_edacc(tmp_path)
    _assert_manifests_match(theirs, mine, "edacc")


# ---------------------------------------------------------------------------
# rir_noise
# ---------------------------------------------------------------------------
def test_rir_noise_matches_reference(tmp_path):
    root = tmp_path / "RIRS_NOISES"
    for sub, seed in (
        ("pointsource_noises/noise-1.wav", 42),
        ("real_rirs_isotropic_noises/RWCP_type4_rir_cirline.wav", 43),
        ("real_rirs_isotropic_noises/RVB2014_type1_noise_largeroom1_1.wav", 44),
        ("simulated_rirs/smallroom/Room001/Room001-00001.wav", 45),
    ):
        p = root / sub
        p.parent.mkdir(parents=True, exist_ok=True)
        write_wav(str(p), _sig(1.0, seed=seed), SR)
    theirs = RR.prepare_rir_noise(root)
    mine = MR.prepare_rir_noise(root)
    _assert_manifests_match(theirs, mine, "rir_noise")


# ---------------------------------------------------------------------------
# voxconverse
# ---------------------------------------------------------------------------
def test_voxconverse_matches_reference(tmp_path):
    for split, name, seed in (("dev", "abc", 50), ("test", "xyz", 51)):
        d = tmp_path / split
        d.mkdir(parents=True)
        write_wav(str(d / f"{name}.wav"), _sig(2.0, seed=seed), SR)
        (d / f"{name}.rttm").write_text(
            f"SPEAKER {name} 1 0.20 1.00 <NA> <NA> spk00 <NA> <NA>\n"
        )
    theirs = RR.prepare_voxconverse(tmp_path)
    mine = MR.prepare_voxconverse(tmp_path)
    _assert_manifests_match(theirs, mine, "voxconverse")


# ---------------------------------------------------------------------------
# but_reverb_db
# ---------------------------------------------------------------------------
def test_but_reverb_db_matches_reference(tmp_path):
    base = tmp_path / "Q301" / "MicID01" / "SpkID1" / "01"
    (base / "RIR").mkdir(parents=True)
    (base / "silence").mkdir(parents=True)
    write_wav(str(base / "RIR" / "IR_sweep.v00.wav"), _sig(1.0, seed=53), SR)
    write_wav(str(base / "silence" / "sil.v00.wav"), _sig(2.0, seed=54), SR)
    theirs = RR.prepare_but_reverb_db(tmp_path)
    mine = MR.prepare_but_reverb_db(tmp_path)
    _assert_manifests_match(theirs, mine, "but_reverb_db")


# ---------------------------------------------------------------------------
# aishell2
# ---------------------------------------------------------------------------
def test_aishell2_matches_reference(tmp_path):
    ios = tmp_path / "AISHELL-2" / "iOS"
    for part, root_name, seed in (("train", "data", 60), ("dev", "dev", 61), ("test", "test", 62)):
        root = ios / root_name
        utt = f"I{part}0001W0001"
        (root / "wav" / f"S{seed}").mkdir(parents=True)
        write_wav(str(root / "wav" / f"S{seed}" / f"{utt}.wav"), _sig(1.0, seed=seed), SR)
        (root / "trans.txt").write_text(f"{utt}\t你好 世界\n")
    # not re-exported from the reference's recipes __init__; import directly
    from lhotse.recipes.aishell2 import prepare_aishell2 as ref_prepare

    theirs = ref_prepare(tmp_path)
    mine = MR.prepare_aishell2(tmp_path)
    _assert_manifests_match(theirs, mine, "aishell2")


# ---------------------------------------------------------------------------
# chime6 (mdm, no array sync)
# ---------------------------------------------------------------------------
def test_chime6_matches_reference(tmp_path):
    import json

    for session, seed in (("S02", 20), ("S09", 21)):
        for ch in (1, 2):
            p = tmp_path / "audio" / "dev" / f"{session}_U01.CH{ch}.wav"
            p.parent.mkdir(parents=True, exist_ok=True)
            write_wav(str(p), _sig(2.0, seed=seed + ch), SR)
        segs = [
            {
                "start_time": "00:00:00.200",
                "end_time": "00:00:01.000",
                "speaker": "P05",
                "words": "hello there",
                "location": "kitchen",
            },
        ]
        tdir = tmp_path / "transcriptions" / "dev"
        tdir.mkdir(parents=True, exist_ok=True)
        (tdir / f"{session}.json").write_text(json.dumps(segs))

    theirs = RR.prepare_chime6(
        tmp_path, dataset_parts="dev", mic="mdm", normalize_text="upper"
    )
    mine = MR.prepare_chime6(
        tmp_path, dataset_parts="dev", mic="mdm", normalize_text="upper"
    )
    _assert_manifests_match(theirs, mine, "chime6")


# ---------------------------------------------------------------------------
# libricss (sdm)
# ---------------------------------------------------------------------------
def test_libricss_matches_reference(tmp_path):
    from lhotse_tpu.recipes.libricss import OVERLAP_RATIOS

    root = tmp_path / "for_release"
    for ov in OVERLAP_RATIOS:
        (root / ov).mkdir(parents=True)
    session = root / "0L" / "overlap_ratio_0.0_sil0.1_0.5_session0_actual0.0"
    (session / "record").mkdir(parents=True)
    write_wav(str(session / "record" / "raw_recording.wav"), _sig(3.0, seed=94), SR)
    (session / "transcription").mkdir(parents=True)
    (session / "transcription" / "meeting_info.txt").write_text(
        "start\tend\tspeaker\tutt_id\ttext\n"
        "0.5\t2.0\t103\t103-1240-0000\tCHAPTER ONE\n"
    )
    theirs = RR.prepare_libricss(tmp_path, type="sdm")
    mine = MR.prepare_libricss(tmp_path, type="sdm")
    # Pinned reference bug (kept fixed here): its meeting_info.txt parser
    # keeps the trailing newline INSIDE the supervision text ("CHAPTER
    # ONE\n"); we strip line endings.
    for s in theirs["supervisions"]:
        assert s.text.endswith("\n")
        s.text = s.text.rstrip("\n")
    _assert_manifests_match({"all": theirs}, {"all": mine}, "libricss")


# ---------------------------------------------------------------------------
# dipco (ihm)
# ---------------------------------------------------------------------------
def test_dipco_matches_reference(tmp_path):
    import json

    from lhotse_tpu.recipes.dipco import SESSIONS

    seed = 30
    for part, sessions in SESSIONS.items():
        for session in sessions:
            seed += 1
            p = tmp_path / "audio" / part / f"{session}_P01.wav"
            p.parent.mkdir(parents=True, exist_ok=True)
            write_wav(str(p), _sig(2.0, seed=seed), SR)
            segs = [
                {
                    "speaker_id": "P01",
                    "start_time": {"close-talk": "00:00:00.25"},
                    "end_time": {"close-talk": "00:00:01.25"},
                    "words": "pass the salt",
                    "gender": "female",
                    "nativeness": "native",
                    "mother_tongue": "English",
                }
            ]
            tdir = tmp_path / "transcriptions" / part
            tdir.mkdir(parents=True, exist_ok=True)
            (tdir / f"{session}.json").write_text(json.dumps(segs))
    theirs = RR.prepare_dipco(tmp_path, mic="ihm")
    mine = MR.prepare_dipco(tmp_path, mic="ihm")
    _assert_manifests_match(theirs, mine, "dipco")


# ---------------------------------------------------------------------------
# adept
# ---------------------------------------------------------------------------
def test_adept_matches_reference(tmp_path):
    import json

    (tmp_path / "wav_44khz" / "emphasis" / "marked").mkdir(parents=True)
    write_wav(
        str(tmp_path / "wav_44khz" / "emphasis" / "marked" / "prompt_1.wav"),
        _sig(1.0, sr=44100, seed=92),
        44100,
    )
    txt = tmp_path / "txt" / "emphasis" / "marked"
    txt.mkdir(parents=True)
    (txt / "prompt_1.txt").write_text("I never said she stole my money.")
    (tmp_path / "adept_prompts.json").write_text(
        json.dumps({"emphasis": {"prompt_1": {"marked": "stress on never"}}})
    )
    theirs = RR.prepare_adept(tmp_path)
    mine = MR.prepare_adept(tmp_path)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "adept")


# ---------------------------------------------------------------------------
# cmu_kids
# ---------------------------------------------------------------------------
def test_cmu_kids_matches_reference(tmp_path):
    from lhotse_tpu.audio.sphio import write_sph

    tables = tmp_path / "cmu_kids" / "tables"
    tables.mkdir(parents=True)
    (tables / "sentence.tbl").write_text("ab1\t5\tThe dog ran away.\n")
    (tables / "speaker.tbl").write_text("header1\nheader2\nfabc\tSUM96\t3/9\tx\ty\n")
    (tables / "transcrp.tbl").write_text("fabcab11 the dog ran away\n")
    sig_dir = tmp_path / "cmu_kids" / "kids" / "fabc" / "signal"
    sig_dir.mkdir(parents=True)
    write_sph(str(sig_dir / "fabcab11.sph"), _sig(1.0, seed=5), SR)

    try:
        theirs = RR.prepare_cmu_kids(tmp_path)
    except Exception:
        # the reference probes SPHERE via the external sph2pipe binary
        # (absent in this env); ours decodes SPHERE natively
        mine = MR.prepare_cmu_kids(tmp_path)
        (sup,) = list(mine["supervisions"])
        assert sup.text == "The dog ran away." and sup.speaker == "fabc"
        return
    mine = MR.prepare_cmu_kids(tmp_path)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "cmu_kids")


# ---------------------------------------------------------------------------
# kespeech
# ---------------------------------------------------------------------------
def test_kespeech_matches_reference(tmp_path):
    (tmp_path / "Audio").mkdir()
    write_wav(str(tmp_path / "Audio" / "u1.wav"), _sig(1.0, seed=11), SR)
    task = tmp_path / "Tasks" / "ASR" / "test"
    task.mkdir(parents=True)
    (task / "wav.scp").write_text("u1 Audio/u1.wav\n")
    (task / "text").write_text("u1 <SPOKEN_NOISE>你好\n", encoding="utf-8")
    (task / "utt2subdialect").write_text("u1 Mandarin\n")
    (task / "utt2spk").write_text("u1 spk1\n")

    from lhotse.recipes.kespeech import prepare_kespeech as ref_prepare

    theirs = ref_prepare(tmp_path, tmp_path / "ref_out", dataset_parts=["test"])
    mine = MR.prepare_kespeech(tmp_path, dataset_parts=["test"])
    _assert_manifests_match(theirs, mine, "kespeech")


# ---------------------------------------------------------------------------
# ears
# ---------------------------------------------------------------------------
def test_ears_matches_reference(tmp_path):
    import json

    (tmp_path / "p001").mkdir()
    write_wav(
        str(tmp_path / "p001" / "emo_adoration_sentences.wav"),
        _sig(1.0, sr=48000, seed=93),
        48000,
    )
    (tmp_path / "speaker_statistics.json").write_text(
        json.dumps({"p001": {"gender": "female", "age": "18-25"}})
    )
    (tmp_path / "transcripts.json").write_text(
        json.dumps({"emo_adoration_sentences": "You're just the sweetest."})
    )
    theirs = RR.prepare_ears(tmp_path)
    mine = MR.prepare_ears(tmp_path)
    # Pinned reference bug (kept fixed here): ears.py:195 derives the
    # transcript key as rec.id.split("_")[1] — "emo" for
    # "p001_emo_adoration_sentences" — so any multi-underscore filename
    # (virtually all of EARS) loses its transcript (text=None). Ours keys
    # by the full file stem.
    (t_sup,) = list(theirs["supervisions"])
    (m_sup,) = list(mine["supervisions"])
    assert t_sup.text is None
    assert m_sup.text == "You're just the sweetest."
    t_sup.text = m_sup.text
    _assert_manifests_match({"all": theirs}, {"all": mine}, "ears")


# ---------------------------------------------------------------------------
# medical
# ---------------------------------------------------------------------------
def test_medical_matches_reference(tmp_path):
    (tmp_path / "audio").mkdir()
    # corpus ships mp3; RIFF payload behind the name (decoded by magic)
    write_wav(str(tmp_path / "audio" / "RES0001.mp3"), _sig(10.0, seed=37), SR)
    for part in ("test", "dev", "train"):
        (tmp_path / f"medical_{part}.info").write_text(
            "audio/RES0001.mp3,0.5[2.5,doctor hello patient]\n"
        )
    theirs = RR.prepare_medical(tmp_path)
    mine = MR.prepare_medical(tmp_path)
    _assert_manifests_match(theirs, mine, "medical")


# ---------------------------------------------------------------------------
# iwslt22_ta
# ---------------------------------------------------------------------------
def test_iwslt22_ta_matches_reference(tmp_path):
    corpus = tmp_path / "ldc"
    splits = tmp_path / "splits"
    splits.mkdir()
    fname = "20170101_120000_12345_A"
    d = corpus / "data" / "audio" / "ta"
    d.mkdir(parents=True)
    write_wav(str(d / f"{fname}.sph"), _sig(30.0, sr=8000, seed=62), 8000)
    tdir = corpus / "data" / "transcripts" / "ta"
    tdir.mkdir(parents=True)
    (tdir / f"{fname}.ta.tsv").write_text(
        "1.0\t2.5\tspkA\tO/ kalam tounsi?\n3.0\t4.0\tspkA\texcluded line\n"
    )
    xdir = corpus / "data" / "translations" / "ta"
    xdir.mkdir(parents=True)
    (xdir / f"{fname}.eng.tsv").write_text(
        "1.0\t2.5\tspkA\tTunisian Words!\n3.0\t4.0\tspkA\tdropped.\n"
    )
    (splits / "train.file_id.txt").write_text(f"{fname}\n")
    (splits / "dev.file_id.txt").write_text("")
    (splits / "test1.file_id.txt").write_text("")
    (splits / "exclude-utterance.txt").write_text(f"{fname} 3.0 4.0\n")

    from lhotse.recipes.iwslt22_ta import prepare_iwslt22_ta as ref_prepare

    try:
        theirs = ref_prepare(corpus, splits)
    except Exception:
        # empty dev/test splits crash the reference's validator; our side
        # must still produce the filtered train split
        mine = MR.prepare_iwslt22_ta(corpus, splits)
        sups = list(mine["train"]["supervisions"])
        assert len(sups) == 1 and sups[0].custom["translated_text"]["eng"] == "tunisian words"
        return
    mine = MR.prepare_iwslt22_ta(corpus, splits)
    _assert_manifests_match(theirs, mine, "iwslt22_ta")


# ---------------------------------------------------------------------------
# earnings21
# ---------------------------------------------------------------------------
def test_earnings21_matches_reference(tmp_path):
    (tmp_path / "media").mkdir()
    write_wav(str(tmp_path / "media" / "4320211.mp3"), _sig(2.0, seed=83), SR)
    nlp = tmp_path / "transcripts" / "nlp_references"
    nlp.mkdir(parents=True)
    (nlp / "4320211.nlp").write_text(
        "token|speaker|ts|endTs\ngood|1|0.0|0.3\nmorning|1|0.3|0.8\n"
    )
    try:
        out = RR.prepare_earnings21(tmp_path)
    except Exception:
        # full-corpus inventory assert, like earnings22
        m_recs, m_sups = MR.prepare_earnings21(tmp_path)
        (sup,) = list(m_sups)
        assert sup.text == "good morning"
        return
    t_recs, t_sups = out
    m_recs, m_sups = MR.prepare_earnings21(tmp_path)
    _assert_manifests_match(
        {"all": {"recordings": t_recs, "supervisions": t_sups}},
        {"all": {"recordings": m_recs, "supervisions": m_sups}},
        "earnings21",
    )


# ---------------------------------------------------------------------------
# cmu_indic
# ---------------------------------------------------------------------------
def test_cmu_indic_matches_reference(tmp_path):
    pkg = tmp_path / "cmu_indic_ben_rm"
    (pkg / "wav").mkdir(parents=True)
    (pkg / "etc").mkdir()
    write_wav(str(pkg / "wav" / "ben_0001.wav"), _sig(1.0, seed=46), SR)
    write_wav(str(pkg / "wav" / "arctic_a0001.wav"), _sig(1.0, seed=47), SR)
    (pkg / "etc" / "txt.done.data").write_text(
        '( ben_0001 "বাংলা বাক্য" )\n( arctic_a0001 "An English prompt." )\n'
    )
    (pkg / "etc" / "voice.feats").write_text("name x\nage 34\n")
    theirs = RR.prepare_cmu_indic(tmp_path)
    mine = MR.prepare_cmu_indic(tmp_path)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "cmu_indic")


# ---------------------------------------------------------------------------
# bvcc
# ---------------------------------------------------------------------------
def test_bvcc_matches_reference(tmp_path):
    for track in ("main", "ood"):
        root = tmp_path / f"phase1-{track}" / "DATA"
        (root / "wav").mkdir(parents=True)
        write_wav(str(root / "wav" / f"sys1-utt_{track}.wav"), _sig(1.0, seed=65), SR)
        write_wav(str(root / "wav" / f"sys1-test_{track}.wav"), _sig(1.0, seed=66), SR)
        sets = root / "sets"
        sets.mkdir(parents=True)
        info = "{}_20-29_L001_Male_x_x_No" if track == "main" else "{}_na_L001_na_na_na_EE"
        row = f"sys1,sys1-utt_{track}.wav,4,0,{info}\n"
        (sets / "TRAINSET").write_text(row)
        (sets / "DEVSET").write_text(row)
        (sets / "test.scp").write_text(f"sys1-test_{track}.wav\n")
        if track == "ood":
            (sets / "unlabeled_mos_list.txt").write_text(f"sys1-test_{track}.wav\n")
    theirs = RR.prepare_bvcc(tmp_path)
    mine = MR.prepare_bvcc(tmp_path)
    # Pinned reference bug (kept fixed here): bvcc.py:292 stores
    # ``LISTENERsd[listenerid] = listenerid`` — the ID string — instead of
    # the listener metadata dict it just parsed (M_F/impairment/age are
    # discarded). Ours stores the metadata.
    for part in theirs:
        for s in theirs[part].get("supervisions", []):
            fixed = {}
            for lid, v in s.custom["listeners"].items():
                assert v == lid, "reference started storing real metadata?"
                mine_sup = next(
                    ms
                    for ms in mine[part]["supervisions"]
                    if ms.id == s.id
                )
                fixed[lid] = mine_sup.custom["listeners"][lid]
            s.custom["listeners"] = fixed
    _assert_manifests_match(theirs, mine, "bvcc")


# ---------------------------------------------------------------------------
# wham
# ---------------------------------------------------------------------------
def test_wham_matches_reference(tmp_path):
    for split, seed in (("tr", 84), ("cv", 85), ("tt", 86)):
        (tmp_path / split).mkdir()
        write_wav(str(tmp_path / split / f"noise_{split}.wav"), _sig(1.0, seed=seed), SR)
    theirs = RR.prepare_wham(tmp_path)
    mine = MR.prepare_wham(tmp_path)
    _assert_manifests_match(theirs, mine, "wham")


# ---------------------------------------------------------------------------
# voxpopuli (asr)
# ---------------------------------------------------------------------------
def test_voxpopuli_matches_reference(tmp_path):
    import gzip

    d = tmp_path / "raw_audios" / "en" / "2020"
    d.mkdir(parents=True)
    # corpus ships ogg; RIFF payload behind the name (decoded by magic)
    write_wav(str(d / "20200101-0900-PLENARY_en.ogg"), _sig(3.0, seed=87), SR)
    out = tmp_path / "out"
    out.mkdir()
    header = "id|session_id|start_time|end_time|speaker_id|gender|normed_text|original_text|split"
    # every split needs rows: the reference iterates train/dev/test and its
    # validator crashes on an empty one
    rows = [
        "x|20200101-0900-PLENARY|0.5|2.0|spk1|female|good morning|Good morning.|train",
        "y|20200101-0900-PLENARY|2.0|2.5|spk1|female|dev words|Dev words.|dev",
        "z|20200101-0900-PLENARY|2.5|2.9|spk2|male|test words|Test words.|test",
    ]
    my_out = tmp_path / "my_out"
    my_out.mkdir()
    for o in (out, my_out):
        with gzip.open(o / "asr_en.tsv.gz", "wt") as f:
            f.write(header + "\n" + "\n".join(rows) + "\n")
    theirs = RR.prepare_voxpopuli(tmp_path, output_dir=out, lang="en")
    mine = MR.prepare_voxpopuli(tmp_path, output_dir=my_out, lang="en")
    _assert_manifests_match(theirs, mine, "voxpopuli")


# ---------------------------------------------------------------------------
# mtedx
# ---------------------------------------------------------------------------
def test_mtedx_matches_reference(tmp_path):
    root = tmp_path / "mtedx"
    base = root / "es-es" / "data"
    for split in ("train", "valid", "test"):
        wav_dir = base / split / "wav"
        vtt_dir = base / split / "vtt"
        wav_dir.mkdir(parents=True)
        vtt_dir.mkdir(parents=True)
        write_flac(str(wav_dir / f"talk_{split}.flac"), _sig(5.0), SR)
        vtt_dir.joinpath(f"talk_{split}.es.vtt").write_text(
            "WEBVTT\n\n00:00:00.500 --> 00:00:02.000\nhola mundo\n\n"
            "00:00:02.500 --> 00:00:04.000\nbuenos dias\n"
        )
    from lhotse.recipes.mtedx import prepare_mtedx as ref_prepare
    from lhotse_tpu.recipes.mtedx import prepare_mtedx as my_prepare

    # the reference requires output_dir (mtedx.py:155 joins None / lang)
    theirs = ref_prepare(root, output_dir=tmp_path / "ref_out", languages="es")
    mine = my_prepare(root, output_dir=tmp_path / "my_out", languages="es")
    assert set(theirs) == set(mine)
    # Pinned reference bug (kept fixed here): its VTT parser enumerates
    # blocks from -1 and keeps only i > 0 (mtedx.py:347-349), so the FIRST
    # cue of every talk is silently dropped. We keep all cues; compare the
    # reference's output against ours minus each talk's first cue.
    for lang in theirs:
        for split in theirs[lang]:
            t_sups = sorted(
                theirs[lang][split]["supervisions"], key=lambda s: (s.recording_id, s.start)
            )
            m_sups = sorted(
                mine[lang][split]["supervisions"], key=lambda s: (s.recording_id, s.start)
            )
            assert len(m_sups) == len(t_sups) + 1  # one talk -> one dropped cue
            first, rest = m_sups[0], m_sups[1:]
            assert first.text == "hola mundo"  # the cue the reference loses
            assert [s.to_dict() for s in rest] == [s.to_dict() for s in t_sups]
            _assert_manifests_match(
                {"recs": {"recordings": theirs[lang][split]["recordings"]}},
                {"recs": {"recordings": mine[lang][split]["recordings"]}},
                f"mtedx[{lang}][{split}]",
            )


# ---------------------------------------------------------------------------
# tal_csasr
# ---------------------------------------------------------------------------
def test_tal_csasr_matches_reference(tmp_path):
    root = tmp_path / "TALCS_corpus"
    for part, seed in (("train_set", 5), ("dev_set", 6), ("test_set", 7)):
        (root / part / "wav").mkdir(parents=True)
        write_wav(str(root / part / "wav" / f"u{seed}.wav"), _sig(1.0, seed=seed), SR)
        (root / part / "label.txt").write_text(
            f"u{seed} 上面是 ＨＩ world！\n", encoding="utf-8"
        )
    from lhotse.recipes.tal_csasr import prepare_tal_csasr as ref_prepare

    theirs = ref_prepare(tmp_path)
    mine = MR.prepare_tal_csasr(tmp_path)
    _assert_manifests_match(theirs, mine, "tal_csasr")


# ---------------------------------------------------------------------------
# xbmu_amdo31
# ---------------------------------------------------------------------------
def test_xbmu_amdo31_matches_reference(tmp_path):
    d = tmp_path / "data" / "wav" / "train" / "spk1"
    d.mkdir(parents=True)
    write_wav(str(d / "spk1-u001.wav"), _sig(1.0, seed=13), SR)
    tr = tmp_path / "data" / "transcript"
    tr.mkdir(parents=True)
    (tr / "transcript_clean.txt").write_text("u001 tibetan words here\n")

    from lhotse.recipes.xbmu_amdo31 import prepare_xbmu_amdo31 as ref_prepare

    try:
        theirs = ref_prepare(tmp_path)
    except Exception:
        # subset-blocked or validator crash on empty dev/test splits
        mine = MR.prepare_xbmu_amdo31(tmp_path)
        sups = list(mine["train"]["supervisions"])
        assert len(sups) == 1 and sups[0].speaker == "spk1"
        return
    mine = MR.prepare_xbmu_amdo31(tmp_path)
    _assert_manifests_match(theirs, mine, "xbmu_amdo31")


# ---------------------------------------------------------------------------
# uwb_atcc
# ---------------------------------------------------------------------------
def test_uwb_atcc_matches_reference(tmp_path):
    write_wav(str(tmp_path / "TWR-test1.wav"), _sig(10.0, sr=8000, seed=34), 8000)
    (tmp_path / "TWR-test1.trs").write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<Trans audio_filename="e2_TWR-test1.wav">\n'
        '<Episode><Section type="report" startTime="0" endTime="10">\n'
        '<Turn startTime="0" endTime="10">\n'
        '<Sync time="0.5"/> [ground] contact praha\n'
        '<Sync time="3.0"/> [air] roger contact\n'
        "</Turn></Section></Episode></Trans>\n"
    )
    # The reference hard-asserts the full 2657-file corpus inventory
    # (uwb_atcc.py:518) — it cannot run on a subset; ours handles any.
    with pytest.raises(AssertionError):
        RR.prepare_uwb_atcc(tmp_path)
    mine = MR.prepare_uwb_atcc(tmp_path)
    sups = sorted(mine["supervisions"], key=lambda s: s.start)
    assert len(sups) == 2 and sups[0].speaker == "ground"
    assert "CONTACT PRAHA" in sups[0].text


# ---------------------------------------------------------------------------
# this_american_life
# ---------------------------------------------------------------------------
def test_this_american_life_matches_reference(tmp_path):
    import json

    (tmp_path / "audio").mkdir()
    write_wav(str(tmp_path / "audio" / "ep-1.mp3"), _sig(10.0, seed=11), SR)
    transcript = {
        "ep-1": [
            {
                "utterance": "hello world",
                "n_words": 2,
                "utterance_start": 1.0,
                "utterance_end": 3.0,
                "speaker": "host",
                "alignments": [[1.0, 1.5, 0], [1.6, 2.4, 1]],
            }
        ]
    }
    for split in ("train", "valid", "test"):
        (tmp_path / f"{split}-transcripts-aligned.json").write_text(
            json.dumps(transcript)
        )
    from lhotse.recipes.this_american_life import (
        prepare_this_american_life as ref_prepare,
    )

    try:
        theirs = ref_prepare(tmp_path)
    except Exception:
        # reference may require nltk downloads / full corpus
        m = MR.prepare_this_american_life(tmp_path)
        (s,) = list(m["train"]["supervisions"])
        assert s.speaker == "host"
        return
    mine = MR.prepare_this_american_life(tmp_path)
    # reference uses subset key 'dev'/'valid'? align keys by sorted values
    assert sorted(len(list(v["supervisions"])) for v in theirs.values()) == sorted(
        len(list(v["supervisions"])) for v in mine.values()
    )
    for part in theirs:
        my_part = part if part in mine else {"dev": "valid", "valid": "dev"}.get(part, part)
        _assert_manifests_match(
            {part: theirs[part]}, {part: mine[my_part]}, f"tal[{part}]"
        )


# ---------------------------------------------------------------------------
# wenetspeech4tts
# ---------------------------------------------------------------------------
def test_wenetspeech4tts_matches_reference(tmp_path):
    pack = tmp_path / "Premium" / "WenetSpeech4TTS_Premium_1"
    (pack / "wavs").mkdir(parents=True)
    write_wav(str(pack / "wavs" / "X001_S1.wav"), _sig(1.0, seed=12), SR)
    (pack / "txts").mkdir(parents=True)
    (pack / "txts" / "X001_S1.txt").write_text(
        "X001_S1\t你好世界\n[0.0,1.0]\n", encoding="utf-8"
    )
    (tmp_path / "filelists").mkdir()
    (tmp_path / "filelists" / "Basic_filelist.lst").write_text(
        "X001_S1 ../Premium/WenetSpeech4TTS_Premium_1/wavs/X001_S1.wav\n"
    )
    mos_dir = tmp_path / "DNSMOS_P808Scores"
    mos_dir.mkdir()
    for tier in ("Basic", "Premium", "Standard"):
        (mos_dir / f"{tier}_DNSMOS.lst").write_text("X001_S1 4.01\n")

    from lhotse.recipes.wenetspeech4tts import prepare_wenetspeech4tts as ref_prepare

    theirs = ref_prepare(tmp_path, dataset_parts="Basic")
    mine = MR.prepare_wenetspeech4tts(tmp_path, dataset_parts="Basic")
    _assert_manifests_match(theirs, mine, "wenetspeech4tts")


# ---------------------------------------------------------------------------
# csj
# ---------------------------------------------------------------------------
def test_csj_matches_reference(tmp_path):
    vol = tmp_path / "MORPH" / "SDB" / "core"
    vol.mkdir(parents=True)
    wav_dir = tmp_path / "WAV" / "core"
    wav_dir.mkdir(parents=True)
    write_wav(str(wav_dir / "A01M0007.wav"), _sig(10.0, seed=71), SR)

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
        encoding="shift_jis",
    )
    from lhotse.recipes.csj import prepare_csj as ref_prepare

    try:
        theirs = ref_prepare(tmp_path, dataset_parts=["core"])
    except Exception:
        # reference may require the full-volume layout or extra assets
        mine = MR.prepare_csj(tmp_path, dataset_parts=["core"])
        sups = sorted(mine["core"]["supervisions"], key=lambda s: s.start)
        assert [s.text for s in sups] == ["えーそれ", "はい"]
        return
    mine = MR.prepare_csj(tmp_path, dataset_parts=["core"])
    _assert_manifests_match(theirs, mine, "csj")


# ---------------------------------------------------------------------------
# spgispeech
# ---------------------------------------------------------------------------
def test_spgispeech_matches_reference(tmp_path):
    root = tmp_path / "spgi"
    for part in ("train", "val"):
        d = root / part / "07a785e9"
        d.mkdir(parents=True)
        write_wav(str(d / "1.wav"), _sig(1.0, seed=90), SR)
        (root / f"{part}.csv").write_text(
            "wav_filename|wav_filesize|transcript\n"
            "07a785e9/1.wav|32044|Hello, World!\n"
        )
    theirs = RR.prepare_spgispeech(root, tmp_path / "ref_out")
    mine = MR.prepare_spgispeech(root, output_dir=tmp_path / "my_out")
    _assert_manifests_match(theirs, mine, "spgispeech")


# ---------------------------------------------------------------------------
# speechio
# ---------------------------------------------------------------------------
def test_speechio_matches_reference(tmp_path):
    part = "SPEECHIO_ASR_ZH00000"
    pdir = tmp_path / part
    (pdir / "wavs").mkdir(parents=True)
    write_wav(str(pdir / "wavs" / "a_0001.wav"), _sig(1.0, seed=10), SR)
    (pdir / "metadata.tsv").write_text(
        "ID\tAUDIO\tTEXT\na_0001\twavs/a_0001.wav\t测试文本\n", encoding="utf-8"
    )
    from lhotse.recipes.speechio import prepare_speechio as ref_prepare

    # The reference iterates all 27 hardcoded SPEECHIO parts and crashes on
    # the first missing metadata.tsv — it cannot run on a subset; ours
    # prepares whatever parts exist.
    with pytest.raises(FileNotFoundError):
        ref_prepare(tmp_path)
    mine = MR.prepare_speechio(tmp_path)
    (sup,) = list(mine[part]["supervisions"])
    assert sup.text == "测试文本" and sup.speaker == "a"


# ---------------------------------------------------------------------------
# peoples_speech
# ---------------------------------------------------------------------------
def test_peoples_speech_matches_reference(tmp_path):
    import json

    root = tmp_path / "ps"
    audio_dir = root / "train" / "clean" / "some" / "session"
    audio_dir.mkdir(parents=True)
    write_wav(str(audio_dir / "utt0.wav"), _sig(1.0, seed=96), SR)
    manifest = {
        "identifier": "session-xyz",
        "training_data": {
            "name": ["utt0"],
            "label": ["hello people"],
            "audio_document_id": ["some/session/utt0.wav"],
        },
    }
    (root / "train" / "clean.json").write_text(json.dumps(manifest) + "\n")
    from lhotse.recipes.peoples_speech import prepare_peoples_speech as ref_prepare

    try:
        theirs = ref_prepare(root)
    except Exception:
        mine = MR.prepare_peoples_speech(root)
        (sup,) = list(mine["train/clean"]["supervisions"])
        assert sup.text == "hello people"
        return
    mine = MR.prepare_peoples_speech(root)
    _assert_manifests_match(theirs, mine, "peoples_speech")


# ---------------------------------------------------------------------------
# aspire (single mic)
# ---------------------------------------------------------------------------
def test_aspire_matches_reference(tmp_path):
    data = tmp_path / "IARPA-ASpIRE-Dev-Sets-v2.0" / "data"
    for part in ("dev", "dev_test"):
        d = data / "dev_and_dev_test_audio" / f"ASpIRE_single_{part}"
        d.mkdir(parents=True)
        write_wav(str(d / f"{part}_rec1.wav"), _sig(10.0, seed=30), SR)
    stm = data / "dev_and_dev_test_STM_files"
    stm.mkdir(parents=True)
    (stm / "dev.stm").write_text(
        "dev_rec1 1 spkA 0.50 2.00 hello aspire\ndev_rec1 1 spkA 2.00 3.00 second utt\n"
    )
    (stm / "dev_test.stm").write_text("dev_test_rec1 1 spkB 0.00 1.00 test utt\n")
    theirs = RR.prepare_aspire(tmp_path, mic="single")
    mine = MR.prepare_aspire(tmp_path, mic="single")
    _assert_manifests_match(theirs, mine, "aspire")


# ---------------------------------------------------------------------------
# cdsd
# ---------------------------------------------------------------------------
def test_cdsd_matches_reference(tmp_path):
    root = tmp_path / "after_catting"
    for part, spk, utt, text, seed in (
        ("1h", "S01", "utt1", "你 好 ｔest", 8),
        ("10h", "S02", "utt2", "再 见", 9),
    ):
        (root / part / "Audio" / spk).mkdir(parents=True)
        write_wav(str(root / part / "Audio" / spk / f"{utt}.wav"), _sig(1.0, seed=seed), SR)
        (root / part / "Text").mkdir(parents=True)
        (root / part / "Text" / f"{spk}.txt").write_text(f"{utt} {text}\n", encoding="utf-8")

    from lhotse.recipes.cdsd import prepare_cdsd as ref_prepare

    theirs = ref_prepare(tmp_path)
    mine = MR.prepare_cdsd(tmp_path)
    _assert_manifests_match(theirs, mine, "cdsd")


# ---------------------------------------------------------------------------
# gale_mandarin
# ---------------------------------------------------------------------------
def test_gale_mandarin_pins_reference_pandas_crash(tmp_path, monkeypatch):
    """Same TDF parser family as gale_arabic: the reference passes the
    removed pandas kwarg error_bad_lines and cannot run with modern pandas."""
    import lhotse_tpu.recipes.gale_mandarin as gm

    header = (
        "file;unicode\tchannel;int\tstart;float\tend;float\tspeaker;unicode\t"
        "speakerType;unicode\tspeakerDialect;unicode\ttranscript;unicode\t"
        "section;int\tturn;int\tsegment;int\tsectionType;unicode\tsuType;unicode\n"
        ";;MM sectionTypes\n;;MM sectionBoundaries\n"
    )
    adir, tdir = tmp_path / "audio", tmp_path / "trans"
    adir.mkdir()
    tdir.mkdir()
    write_wav(str(adir / "CCTV_TRAIN_20070102.wav"), _sig(10.0, seed=14), SR)
    (tdir / "x.tdf").write_text(
        header
        + "CCTV_TRAIN_20070102\t0\t1.0\t3.0\tspkB\tmale\tdialect\t世界\t0\t1\t2\treport\tstatement\n"
    )
    monkeypatch.setattr(gm, "_fetch_dev_ids", lambda: [])

    from lhotse.recipes.gale_mandarin import prepare_gale_mandarin as ref_prepare

    with pytest.raises(Exception):
        ref_prepare([adir], [tdir])
    mine = gm.prepare_gale_mandarin([adir], [tdir])
    train = list(mine["train"]["supervisions"])
    assert len(train) == 1 and train[0].text == "世界"


# ---------------------------------------------------------------------------
# sph2pipe-gated LDC conversational corpora (reference cannot probe SPHERE
# without the external sph2pipe binary; ours decodes SPHERE natively)
# ---------------------------------------------------------------------------
def test_sphere_gated_ldc_recipes_run_here(tmp_path):
    from lhotse_tpu.audio.sphio import write_sph

    # broadcast_news
    bn = tmp_path / "bn"
    (bn / "audio").mkdir(parents=True)
    (bn / "trans").mkdir()
    write_sph(str(bn / "audio" / "prog1.sph"), _sig(30.0, seed=33), SR)
    (bn / "trans" / "prog1.sgml").write_text(
        '<episode program="NPR News" language="English">\n'
        '<section type="report" starttime="0.0" endtime="10.0">\n'
        '<turn speaker="Alice Smith" spkrtype="female" starttime="0.0" endtime="10.0">\n'
        '<time sec="0.5">\nfirst segment text\n'
        '<time sec="4.0">\nsecond segment text\n'
        "</turn>\n</section>\n</episode>\n"
    )
    with pytest.raises(Exception):
        RR.prepare_broadcast_news(bn / "audio", bn / "trans")
    mine = MR.prepare_broadcast_news(bn / "audio", bn / "trans")
    assert len(list(mine["segments"])) == 2

    # callhome_english (asr variant)
    ch = tmp_path / "ch"
    rng = np.random.RandomState(20)
    for split, adir in (("train", "train"), ("devtest", "devtest"), ("evaltest", "evltest")):
        d = ch / "audio" / "data" / adir
        d.mkdir(parents=True)
        write_sph(
            str(d / f"en_{split}.sph"),
            (0.1 * rng.randn(2, 30 * SR)).astype(np.float32),
            SR,
        )
        tdir = ch / "trans" / "transcrpt" / split
        tdir.mkdir(parents=True)
        (tdir / f"en_{split}.txt").write_text(
            "# comment line\n1.00 2.50 A: hello there\n2.50 4.00 B: hi there\n"
        )
    # callhome probes SPHERE through the reference's own pure reader, so a
    # full differential works here
    theirs = RR.prepare_callhome_english(ch / "audio", transcript_dir=ch / "trans")
    mine = MR.prepare_callhome_english(ch / "audio", transcript_dir=ch / "trans")
    _assert_manifests_match(theirs, mine, "callhome_english")


# ---------------------------------------------------------------------------
# nsc (PART3, textgrids stub)
# ---------------------------------------------------------------------------
def test_nsc_part3_matches_reference(tmp_path):
    root = tmp_path / "IMDA - National Speech Corpus" / "PART3"
    (root / "Audio Same CloseMic").mkdir(parents=True)
    write_wav(
        str(root / "Audio Same CloseMic" / "conf_0001.wav"), _sig(10.0, seed=72), SR
    )
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
        '            text = "<Z>"\n'
    )
    from lhotse.recipes.nsc import prepare_nsc as ref_prepare

    try:
        theirs = ref_prepare(tmp_path, dataset_part="PART3_SameCloseMic")
    except Exception:
        mine = MR.prepare_nsc(tmp_path, dataset_part="PART3_SameCloseMic")
        (sup,) = list(mine["supervisions"])
        assert sup.text == "lah okay can"
        return
    mine = MR.prepare_nsc(tmp_path, dataset_part="PART3_SameCloseMic")
    _assert_manifests_match({"all": theirs}, {"all": mine}, "nsc")


# ---------------------------------------------------------------------------
# bengaliai_speech
# ---------------------------------------------------------------------------
def test_bengaliai_speech_matches_reference(tmp_path):
    (tmp_path / "train_mp3s").mkdir()
    (tmp_path / "test_mp3s").mkdir()
    write_wav(str(tmp_path / "train_mp3s" / "u1.mp3"), _sig(1.0, seed=50), SR)
    write_wav(str(tmp_path / "train_mp3s" / "u2.mp3"), _sig(1.0, seed=51), SR)
    write_wav(str(tmp_path / "test_mp3s" / "t1.mp3"), _sig(1.0, seed=52), SR)
    (tmp_path / "train.csv").write_text(
        "id,sentence,split\nu1,বাংলা বাক্য,train\nu2,অন্য বাক্য,valid\n"
    )
    from lhotse.recipes.bengaliai_speech import (
        prepare_bengaliai_speech as ref_prepare,
    )

    try:
        theirs = ref_prepare(tmp_path)
    except Exception:
        mine = MR.prepare_bengaliai_speech(tmp_path)
        assert [s.text for s in mine["train"]["supervisions"]] == ["বাংলা বাক্য"]
        return
    mine = MR.prepare_bengaliai_speech(tmp_path)
    _assert_manifests_match(theirs, mine, "bengaliai")


# ---------------------------------------------------------------------------
# gigaspeech2
# ---------------------------------------------------------------------------
def test_gigaspeech2_matches_reference(tmp_path):
    lang_dir = tmp_path / "data" / "th"
    (lang_dir / "dev" / "0" / "12").mkdir(parents=True)
    write_wav(str(lang_dir / "dev" / "0" / "12" / "0-12-3.wav"), _sig(1.0, seed=64), SR)
    (lang_dir / "dev.tsv").write_text("0-12-3\tสวัสดี\n")
    from lhotse.recipes.gigaspeech2 import prepare_gigaspeech2 as ref_prepare

    try:
        theirs = ref_prepare(tmp_path, output_dir=tmp_path / "ref_out")
    except Exception:
        mine = MR.prepare_gigaspeech2(tmp_path, output_dir=tmp_path / "my_out")
        sups = list(mine["th"]["dev"]["supervisions"])
        assert len(sups) == 1 and sups[0].text == "สวัสดี"
        return
    mine = MR.prepare_gigaspeech2(tmp_path, output_dir=tmp_path / "my_out")
    assert set(theirs) == set(mine)
    for lang in theirs:
        _assert_manifests_match(theirs[lang], mine[lang], f"gigaspeech2[{lang}]")


# ---------------------------------------------------------------------------
# reazonspeech
# ---------------------------------------------------------------------------
def test_reazonspeech_matches_reference(tmp_path):
    import json

    corpus = tmp_path / "corpus"
    (corpus / "audio").mkdir(parents=True)
    items = []
    for i in range(5):
        p = corpus / "audio" / f"u{i}.flac"
        write_flac(str(p), _sig(1.0, seed=20 + i), SR)
        items.append(
            {"id": f"u{i}", "audio_filepath": str(p), "duration": 1.0, "text": f"こんにちは{i}"}
        )
    (corpus / "dataset.json").write_text(json.dumps(items), encoding="utf-8")
    from lhotse.recipes.reazonspeech import prepare_reazonspeech as ref_prepare

    try:
        theirs = ref_prepare(corpus, output_dir=tmp_path / "ref_out")
    except Exception:
        mine = MR.prepare_reazonspeech(corpus, output_dir=tmp_path / "my_out")
        assert len(list(mine["dev"]["supervisions"])) == 5
        return
    mine = MR.prepare_reazonspeech(corpus, output_dir=tmp_path / "my_out")
    assert set(theirs) == set(mine)
    for part in theirs:
        for kind in set(theirs[part]) & {"recordings", "supervisions"}:
            t = _canon_set(theirs[part][kind])
            m = _canon_set(mine[part][kind])
            assert t == m, f"reazonspeech[{part}][{kind}]"


# ---------------------------------------------------------------------------
# sbcsae
# ---------------------------------------------------------------------------
def test_sbcsae_matches_reference(tmp_path):
    rng = np.random.RandomState(73)
    corpus = tmp_path / "SBCSAE"
    (corpus / "WAV").mkdir(parents=True)
    write_wav(
        str(corpus / "WAV" / "SBC001.wav"),
        (0.1 * rng.randn(2, 30 * SR)).astype(np.float32),
        SR,
    )
    trn = corpus / "TRN"
    trn.mkdir(parents=True)
    (trn / "SBC001.trn").write_text(
        "1.00 3.50\tLENORE:\t... So you don't need to go borrow equipment,\n"
        "3.50 4.20\t\t.. from anybody.\n"
        "4.20 5.00\t>ENV:\t((DOOR))\n"
    )
    for part in ("Part_1", "Part_2", "Part_3", "Part_4"):
        d = corpus / "docs" / part
        d.mkdir(parents=True)
        if part == "Part_1":
            (d / "segment.tbl").write_text("sbc001 speaker:\t0001 LENORE\n")
            (d / "speaker.tbl").write_text("0001,Lenore,F,x,Walnut Cre CA,CA\n")
        else:
            (d / "segment.tbl").write_text("")
            (d / "speaker.tbl").write_text("")

    from lhotse.recipes.sbcsae import prepare_sbcsae as ref_prepare

    try:
        theirs = ref_prepare(corpus, omit_realignments=True)
    except Exception:
        mine = MR.prepare_sbcsae(corpus, omit_realignments=True)
        sups = sorted(mine["supervisions"], key=lambda s: s.start)
        assert len(sups) == 2 and sups[0].speaker == "0001_LENORE"
        return
    mine = MR.prepare_sbcsae(corpus, omit_realignments=True)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "sbcsae")


# ---------------------------------------------------------------------------
# gigast
# ---------------------------------------------------------------------------
def test_gigast_matches_reference(tmp_path):
    import json

    from lhotse_tpu import RecordingSet, SupervisionSegment, SupervisionSet
    from lhotse_tpu.testing.dummies import dummy_recording

    manifests_dir = tmp_path / "manifests"
    manifests_dir.mkdir()
    SupervisionSet.from_segments(
        [
            SupervisionSegment(
                id=f"POD1_S{i:07d}", recording_id="POD1", start=float(i),
                duration=1.0, channel=0, text=f"segment {i}",
            )
            for i in range(3)
        ]
    ).to_file(manifests_dir / "gigaspeech_supervisions_TEST.jsonl.gz")
    RecordingSet([dummy_recording(0)]).to_file(
        manifests_dir / "gigaspeech_recordings_TEST.jsonl.gz"
    )
    (tmp_path / "GigaST.de.json").write_text(
        json.dumps(
            {
                "audios": [
                    {"segments": [{"sid": "POD1_S0000001", "text_raw": "Segment eins", "extra": {}}]}
                ]
            }
        ),
        encoding="utf-8",
    )
    from lhotse.recipes.gigast import prepare_gigast as ref_prepare

    # the reference RETURNS None despite its docstring (gigast.py:105) —
    # its output exists only as the files it writes; compare those
    ret = ref_prepare(
        tmp_path, manifests_dir, output_dir=tmp_path / "ref_out",
        languages="de", dataset_parts="TEST",
    )
    assert ret is None
    mine = MR.prepare_gigast(
        tmp_path, manifests_dir, output_dir=tmp_path / "my_out",
        languages="de", dataset_parts="TEST",
    )
    from lhotse import load_manifest as ref_load_manifest

    theirs = {
        "de-TEST": {
            "supervisions": ref_load_manifest(
                tmp_path / "ref_out" / "gigast-de_supervisions_TEST.jsonl.gz"
            )
        }
    }
    mine_view = {"de-TEST": {"supervisions": mine["de-TEST"]["supervisions"]}}
    _assert_manifests_match(theirs, mine_view, "gigast")


# ---------------------------------------------------------------------------
# callhome_egyptian
# ---------------------------------------------------------------------------
def test_callhome_egyptian_matches_reference(tmp_path):
    from lhotse_tpu.audio.sphio import write_sph

    audio = tmp_path / "audio"
    trans = tmp_path / "trans"
    for split, tdirname, rid, seed in (
        ("train", "train", "ar_1", 21),
        ("devtest", "devtest", "ar_2", 22),
        ("evltest", "evaltest", "ar_3", 23),
    ):
        d = audio / "callhome" / "arabic" / split
        d.mkdir(parents=True)
        write_sph(str(d / f"{rid}.sph"), _sig(10.0, seed=seed), SR)
        tdir = trans / "callhome_arabic_trans_970711" / "transcrp" / tdirname / "roman"
        tdir.mkdir(parents=True)
        (tdir / f"{rid}.txt").write_text("0.50 2.00 B: %ah Tayyib\n")

    theirs = RR.prepare_callhome_egyptian(audio, trans)
    mine = MR.prepare_callhome_egyptian(audio, trans)
    _assert_manifests_match(theirs, mine, "callhome_egyptian")


# ---------------------------------------------------------------------------
# mgb2 parser helpers
# ---------------------------------------------------------------------------
def test_mgb2_parsers_match_reference(tmp_path):
    from lhotse.recipes.mgb2 import (
        cleaning as ref_cleaning,
        make_supervisions as ref_make_supervisions,
    )
    from lhotse_tpu.recipes.mgb2 import (
        cleaning as my_cleaning,
        make_supervisions as my_make_supervisions,
    )

    xml = tmp_path / "p.xml"
    xml.write_text(
        '<?xml version="1.0"?><transcript><segments annotation_id="x">'
        '<segment id="PROG_utt1" starttime="1.0" endtime="2.5" WMER="10.0" '
        'who="TRSspeaker3overlap"><element>ahlan</element><element>bik</element>'
        "</segment>"
        '<segment id="PROG_utt2" starttime="3.0" endtime="4.0" WMER="95.0" '
        'who="TRSspeaker4overlap"><element>dropped</element></segment>'
        "</segments></transcript>"
    )
    t = ref_make_supervisions(xml, mer_thresh=80)
    m = my_make_supervisions(xml, mer_thresh=80)
    assert [s.to_dict() for s in t] == [s.to_dict() for s in m]
    for s in ("مَرْحَبا ب العالم!!", "أهلاً وسهلاً", "abc 123"):
        assert ref_cleaning(s) == my_cleaning(s), s


# ---------------------------------------------------------------------------
# fisher_english
# ---------------------------------------------------------------------------
def test_fisher_english_matches_reference(tmp_path):
    from lhotse_tpu.audio.sphio import write_sph

    rng = np.random.RandomState(91)
    stem = "fe_03_00001"
    d = tmp_path / "LDC2004S13" / "audio" / "000"
    d.mkdir(parents=True)
    write_sph(str(d / f"{stem}.sph"), (0.1 * rng.randn(2, 3 * SR)).astype(np.float32), SR)
    tdir = tmp_path / "LDC2004T19" / "fe_03_p1_tran" / "data" / "trans" / "000"
    tdir.mkdir(parents=True)
    (tdir / f"{stem}.txt").write_text(
        "# header\n#\n#\n0.00 1.20 A: hello there\n1.20 2.40 B: hi how are you\n"
    )
    doc = tmp_path / "LDC2004T19" / "doc"
    doc.mkdir(parents=True)
    (doc / "fe_03_p1_calldata.tbl").write_text(
        "CALL_ID,h1,h2,h3,h4,APIN,h6,h7,h8,h9,BPIN\n00001,x,x,x,x,9001,x,x,x,x,9002\n"
    )
    kw = dict(
        audio_dirs=["LDC2004S13"], transcript_dirs=["LDC2004T19"], absolute_paths=True
    )
    try:
        theirs = RR.prepare_fisher_english(tmp_path, output_dir=tmp_path / "ref_out", **kw)
    except Exception:
        # sph2pipe-gated audio probing in the reference
        mine = MR.prepare_fisher_english(tmp_path, output_dir=tmp_path / "my_out", **kw)
        sups = sorted(mine["supervisions"], key=lambda s: s.start)
        assert [s.speaker for s in sups] == ["9001", "9002"]
        return
    mine = MR.prepare_fisher_english(tmp_path, output_dir=tmp_path / "my_out", **kw)
    _assert_manifests_match({"all": theirs}, {"all": mine}, "fisher_english")
