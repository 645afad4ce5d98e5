"""
Recipe fixture tests, tranche 10: voxceleb1 — speaker metadata table,
dev/test split by speaker, flattened speaker-session-utt ids, and
positive/negative trial CutSet pairs for CutPairsSampler.
"""
import numpy as np

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _sig(seconds=0.5, seed=0):
    rng = np.random.RandomState(seed)
    return (0.1 * rng.randn(int(SR * seconds))).astype(np.float32)


def _vox1_root(tmp_path):
    root = tmp_path / "voxceleb1"
    layout = [
        ("id10001", "sess1", "00001", "dev"),
        ("id10001", "sess1", "00002", "dev"),
        ("id10270", "x6uY", "00001", "test"),
        ("id10270", "x6uY", "00002", "test"),
        ("id10271", "zzz1", "00001", "test"),
    ]
    for spk, sess, utt, _ in layout:
        d = root / "wav" / spk / sess
        d.mkdir(parents=True, exist_ok=True)
        write_wav(str(d / f"{utt}.wav"), _sig(seed=hash((spk, utt)) % 100), SR)
    (root / "vox1_meta.csv").write_text(
        "ID\tName\tGender\tNationality\tSet\n"
        "id10001\tA_Speaker\tf\tIreland\tdev\n"
        "id10270\tB_Speaker\tm\tUSA\ttest\n"
        "id10271\tC_Speaker\tf\tUK\ttest\n"
    )
    trials = tmp_path / "trials.txt"
    trials.write_text(
        "1 id10270/x6uY/00001.wav id10270/x6uY/00002.wav\n"
        "0 id10270/x6uY/00001.wav id10271/zzz1/00001.wav\n"
        "1 id99999/none/00001.wav id10270/x6uY/00001.wav\n"  # unknown: skipped
    )
    return root, trials


def test_prepare_voxceleb1(tmp_path):
    from lhotse_tpu.recipes import prepare_voxceleb

    root, trials = _vox1_root(tmp_path)
    m = prepare_voxceleb(
        voxceleb1_root=root, output_dir=tmp_path / "out", trials_path=trials
    )
    # Kaldi-style: vox1 dev speakers -> train.
    recs, sups = m["train"]["recordings"], m["train"]["supervisions"]
    assert sorted(r.id for r in recs) == [
        "id10001-sess1-00001", "id10001-sess1-00002",
    ]
    validate_recordings_and_supervisions(
        recs.to_eager(), sups.to_eager()
    )
    sup = sups.to_eager()["id10001-sess1-00001"]
    assert sup.speaker == "id10001"
    assert sup.gender == "f"
    assert sup.custom["nationality"] == "Ireland"

    assert len(m["test"]["recordings"].to_eager()) == 3

    # Trials: aligned positive/negative CutSet pairs.
    pos1, pos2 = m["pos_trials"]
    neg1, neg2 = m["neg_trials"]
    assert len(pos1) == len(pos2) == 1
    assert len(neg1) == len(neg2) == 1
    p1, p2 = list(pos1)[0], list(pos2)[0]
    assert p1.id == p2.id  # CutPairsSampler alignment contract
    assert p1.recording.id == "id10270-x6uY-00001"
    assert p2.recording.id == "id10270-x6uY-00002"
    n1, n2 = list(neg1)[0], list(neg2)[0]
    assert n1.recording.id.startswith("id10270")
    assert n2.recording.id.startswith("id10271")
