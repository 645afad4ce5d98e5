"""
Recipe fixture tests, tranche 14: dihard3 — FLAC audio + RTTM speaker
turns with recordings.tbl domain metadata and UEM scoring regions.
"""
import numpy as np

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.flacio import write_flac

SR = 16000


def test_prepare_dihard3(tmp_path):
    from lhotse_tpu.recipes import prepare_dihard3

    dev = tmp_path / "dihard_dev"
    (dev / "flac").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for rid in ("DH_DEV_0001", "DH_DEV_0002"):
        write_flac(
            str(dev / "flac" / f"{rid}.flac"),
            (0.1 * rng.randn(3 * SR)).astype(np.float32), SR)
        (dev / "flac" / f"{rid}.rttm").write_text(
            f"SPEAKER {rid} 1 0.50 1.00 <NA> <NA> spkA <NA> <NA>\n"
            f"SPEAKER {rid} 1 1.80 0.70 <NA> <NA> spkB <NA> <NA>\n"
        )
        (dev / "flac" / f"{rid}.uem").write_text(f"{rid} 1 0.25 2.75\n")
    (dev / "recordings.tbl").write_text(
        "recording_id in_core lang domain source\n"
        "DH_DEV_0001 True eng clinical ldc\n"
        "DH_DEV_0002 False eng broadcast ldc\n"
    )

    m = prepare_dihard3(dev_audio_dir=dev, output_dir=tmp_path / "out")
    assert set(m) == {"dev"}
    recs, sups = m["dev"]["recordings"], m["dev"]["supervisions"]
    assert len(recs) == 2
    validate_recordings_and_supervisions(recs, sups)

    eager = sups.to_eager()
    s = eager["DH_DEV_0001-spkA-000050-000150"]
    assert s.start == 0.5 and s.duration == 1.0
    assert s.speaker == "spkA"
    assert s.language == "eng"
    assert s.custom["domain"] == "clinical"
    assert s.custom["in_core"] is True
    assert eager["DH_DEV_0002-spkB-000180-000250"].custom["domain"] == "broadcast"

    uem = m["dev"]["uem"].to_eager()
    u = uem["DH_DEV_0001-000025-000275"]
    assert u.start == 0.25 and u.duration == 2.5

    # uem_manifest=False drops the scoring regions.
    m2 = prepare_dihard3(dev_audio_dir=dev, uem_manifest=False)
    assert "uem" not in m2["dev"]
