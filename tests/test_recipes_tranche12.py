"""
Recipe fixture tests, tranche 12: switchboard — 2-channel SPHERE
conversations with per-side trans.text files, [silence] filtering, and
per-side speaker labels.
"""
import numpy as np

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.sphio import write_sph

SR = 8000


def test_prepare_switchboard(tmp_path):
    from lhotse_tpu.recipes import prepare_switchboard

    audio_dir = tmp_path / "audio"
    trans_dir = tmp_path / "trans"
    audio_dir.mkdir()
    trans_dir.mkdir()
    rng = np.random.RandomState(0)
    data = (0.1 * rng.randn(2, 4 * SR)).astype(np.float32)  # stereo telephone
    write_sph(str(audio_dir / "sw02001.sph"), data, SR)
    (trans_dir / "sw2001A-ms98-a-trans.text").write_text(
        "sw2001A-ms98-a-0001 0.00 1.50 hello there\n"
        "sw2001A-ms98-a-0002 1.50 2.00 [silence]\n"
        "sw2001A-ms98-a-0003 2.00 3.75 how are you\n"
    )
    (trans_dir / "sw2001B-ms98-a-trans.text").write_text(
        "sw2001B-ms98-a-0001 0.50 2.20 fine thanks\n"
    )

    m = prepare_switchboard(
        audio_dir, transcripts_dir=trans_dir, output_dir=tmp_path / "out",
        absolute_paths=True)
    recs, sups = m["recordings"], m["supervisions"]
    assert len(recs) == 1
    rec = recs["sw02001"]
    assert rec.num_channels == 2
    np.testing.assert_allclose(rec.load_audio(), data, atol=2 / 32768)

    eager = sups.to_eager()
    # [silence] filtered by default.
    assert sorted(s.id for s in eager) == [
        "sw2001A-ms98-a-0001", "sw2001A-ms98-a-0003", "sw2001B-ms98-a-0001",
    ]
    a = eager["sw2001A-ms98-a-0001"]
    assert a.channel == 0 and a.speaker == "sw02001A"
    assert a.text == "hello there"
    b = eager["sw2001B-ms98-a-0001"]
    assert b.channel == 1 and b.speaker == "sw02001B"
    assert b.start == 0.5 and b.duration == 1.7
    validate_recordings_and_supervisions(recs, eager)

    # omit_silence=False keeps the silence rows.
    m2 = prepare_switchboard(
        audio_dir, transcripts_dir=trans_dir, omit_silence=False,
        absolute_paths=True)
    assert len(m2["supervisions"].to_eager()) == 4
