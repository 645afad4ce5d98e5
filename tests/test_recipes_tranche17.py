"""
Recipe fixture tests, tranche 17: chime6 — JSON transcript arrays with
HH:MM:SS.mmm stamps, array vs binaural-headset recording assembly,
reference-array channel restriction, and kaldi text normalization.
"""
import json

import numpy as np

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _build_corpus(tmp_path):
    root = tmp_path / "chime6"
    (root / "audio" / "dev").mkdir(parents=True)
    (root / "transcriptions" / "dev").mkdir(parents=True)
    rng = np.random.RandomState(0)
    n = 10 * SR
    # Two arrays x two channels (mdm) + two binaural headsets (ihm).
    for name in ("S02_U01.CH1", "S02_U01.CH2", "S02_U06.CH1"):
        write_wav(
            str(root / "audio" / "dev" / f"{name}.wav"),
            (0.05 * rng.randn(n)).astype(np.float32), SR)
    for spk in ("P05", "P06"):
        write_wav(
            str(root / "audio" / "dev" / f"S02_{spk}.wav"),
            (0.05 * rng.randn(2, n)).astype(np.float32), SR)
    # The dev split also requires session S09: minimal array + headset.
    for name in ("S09_U01.CH1", "S09_P52"):
        data = (0.05 * rng.randn(*(2, n) if "P" in name else (n,))).astype(np.float32)
        write_wav(str(root / "audio" / "dev" / f"{name}.wav"), data, SR)
    (root / "transcriptions" / "dev" / "S09.json").write_text(
        json.dumps(
            [{"start_time": "0:00:00.50", "end_time": "0:00:01.00",
              "words": "ok", "speaker": "P52"}]
        )
    )
    (root / "transcriptions" / "dev" / "S02.json").write_text(
        json.dumps(
            [
                {
                    "start_time": "0:00:01.50", "end_time": "0:00:03.00",
                    "words": "Hello, there!", "speaker": "P05",
                    "location": "kitchen", "ref": "U06",
                },
                {
                    "start_time": "0:00:05.00", "end_time": "0:00:05.00",  # zero dur
                    "words": "dropped", "speaker": "P06",
                },
            ]
        )
    )
    return root


def test_prepare_chime6_mdm(tmp_path):
    from lhotse_tpu.recipes import prepare_chime6

    root = _build_corpus(tmp_path)
    m = prepare_chime6(
        root, output_dir=tmp_path / "out", dataset_parts=["dev"], mic="mdm",
        normalize_text="kaldi")
    recs, sups = m["dev"]["recordings"], m["dev"]["supervisions"]
    rec = recs["S02"]
    assert rec.num_channels == 3  # U01.CH1, U01.CH2, U06.CH1
    eager = sups.to_eager()
    assert sorted(s_.recording_id for s_ in eager) == ["S02", "S09"]
    assert sum(1 for s_ in eager if s_.recording_id == "S02") == 1  # zero-duration row dropped
    s = eager["S02-0"]
    assert s.start == 1.5 and s.duration == 1.5
    assert s.channel == [0, 1, 2]  # all array channels by default
    assert s.text == "hello there"  # kaldi normalization
    assert s.custom["location"] == "kitchen"
    validate_recordings_and_supervisions(recs, eager)


def test_prepare_chime6_mdm_reference_array(tmp_path):
    from lhotse_tpu.recipes import prepare_chime6

    root = _build_corpus(tmp_path)
    m = prepare_chime6(
        root, dataset_parts=["dev"], mic="mdm", use_reference_array=True)
    s = m["dev"]["supervisions"].to_eager()["S02-0"]
    assert s.channel == [2]  # only the annotated U06 reference array


def test_prepare_chime6_ihm(tmp_path):
    from lhotse_tpu.recipes import prepare_chime6

    root = _build_corpus(tmp_path)
    m = prepare_chime6(root, dataset_parts=["dev"], mic="ihm")
    rec = m["dev"]["recordings"]["S02"]
    # Two binaural headsets -> one 4-channel virtual recording.
    assert rec.num_channels == 4
    s = m["dev"]["supervisions"].to_eager()["S02-0"]
    assert s.channel == [0, 1]  # P05's stereo pair
    assert s.speaker == "P05"
