"""
Recipe fixture tests, tranche 13: heroico/USMA — three prompt tables,
path-based subcorpus classification, recitation-number fold routing, and
untranscribed-answer skipping.
"""
import numpy as np

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _w(path, seed=0):
    rng = np.random.RandomState(seed)
    path.parent.mkdir(parents=True, exist_ok=True)
    write_wav(str(path), (0.1 * rng.randn(SR // 2)).astype(np.float32), SR)


def test_prepare_heroico(tmp_path):
    from lhotse_tpu.recipes import prepare_heroico

    speech = tmp_path / "speech"
    trans = tmp_path / "transcripts"
    trans.mkdir()

    # Answers (train): spk 1, prompts 10 + an untranscribed 11.
    _w(speech / "Answers_Spanish" / "1" / "10.wav", 0)
    _w(speech / "Answers_Spanish" / "1" / "11.wav", 1)
    (trans / "heroico-answers.txt").write_text("1/10\thola mundo\n")

    # Recitations: 100 -> train, 400 -> devtest repeat band (354 < n < 562).
    _w(speech / "Recordings_Spanish" / "2" / "100.wav", 2)
    _w(speech / "Recordings_Spanish" / "2" / "400.wav", 3)
    (trans / "heroico-recordings.txt").write_text(
        "100\tbuenos dias\n400\tfrase repetida\n"
    )

    # USMA (test): one native speaker + a malformed speaker dir (skipped).
    _w(speech / "usma" / "native-f-ana" / "s1.wav", 4)
    _w(speech / "usma" / "other-speaker" / "s1.wav", 5)
    (trans / "usma-prompts.txt").write_text("s1\tgood morning\n")

    m = prepare_heroico(speech, trans, output_dir=tmp_path / "out")
    assert set(m) == {"train", "devtest", "test"}

    train_sups = m["train"]["supervisions"].to_eager()
    assert sorted(s.id for s in train_sups) == [
        "answers-1-10", "heroico-recitations-2-100",
    ]
    assert train_sups["answers-1-10"].text == "hola mundo"
    validate_recordings_and_supervisions(
        m["train"]["recordings"].to_eager(), train_sups)

    dev_sups = m["devtest"]["supervisions"].to_eager()
    assert [s.id for s in dev_sups] == ["heroico-recitations-repeats-2-400"]

    test_sups = m["test"]["supervisions"].to_eager()
    assert [s.id for s in test_sups] == ["usma-native-f-ana-s1"]
    assert test_sups["usma-native-f-ana-s1"].text == "good morning"
