"""
Recipe fixture tests, tranche 15: gale_arabic and the shared LDC TDF
parser — three header rows, 13-column payload, malformed/no-speaker/zero-
duration row skipping, section metadata in custom, and pinned test-id
splitting.
"""
import numpy as np

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _tdf(rows):
    header = ["h1\th2", ";;junk", "more junk"]
    return "\n".join(header + rows) + "\n"


def _row(reco, ch, start, end, spk, text):
    return "\t".join(
        [f"{reco}.sph", str(ch), str(start), str(end), spk, "male", "MSA",
         text, "1", "2", "3", "report", "statement"]
    )


def test_prepare_gale_arabic(tmp_path):
    from lhotse_tpu.recipes import prepare_gale_arabic

    audio = tmp_path / "audio"
    trans = tmp_path / "trans"
    audio.mkdir()
    trans.mkdir()
    rng = np.random.RandomState(0)
    train_id = "SOMECHAN_NEWS_ARB_20070101_120000"
    test_id = "ALAM_WITHEVENT_ARB_20070116_205800"  # pinned test list member
    for rid in (train_id, test_id):
        write_wav(str(audio / f"{rid}.wav"), (0.1 * rng.randn(3 * SR)).astype(np.float32), SR)

    (trans / "a.tdf").write_text(
        _tdf(
            [
                _row(train_id, 0, 0.5, 1.6, "spk1", "مرحبا"),
                _row(train_id, 0, 1.6, 1.6, "spk1", "zero duration"),  # dropped
                _row(train_id, 0, 2.0, 2.5, "no speaker", "x"),  # dropped
                "short\trow",  # malformed: dropped
                _row(test_id, 0, 0.0, 1.0, "spk2", "السلام"),
            ]
        )
    )

    m = prepare_gale_arabic(
        [audio], [trans], output_dir=tmp_path / "out")
    train = m["train"]
    test = m["test"]
    train_sups = train["supervisions"].to_eager()
    assert len(train["recordings"].to_eager()) == 1
    assert len(train_sups) == 1
    sup = list(train_sups)[0]
    assert sup.recording_id == train_id  # .sph suffix stripped
    assert sup.text == "مرحبا"
    assert sup.language == "Arabic"
    assert sup.custom["section_type"] == "report"
    validate_recordings_and_supervisions(
        train["recordings"].to_eager(), train_sups)

    test_sups = test["supervisions"].to_eager()
    assert [s.recording_id for s in test_sups] == [test_id]
    assert len(test["recordings"].to_eager()) == 1
