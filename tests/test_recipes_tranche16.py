"""
Recipe fixture tests, tranche 16: AMI IHM — NXT XML annotations
(meetings/segments/words) joined with per-headset wav groups into
multi-source recordings, word alignments, and the official partition.
"""
import numpy as np

from lhotse_tpu import validate_recordings_and_supervisions
from lhotse_tpu.audio.wavio import write_wav

SR = 16000


def _add_meeting(data, ann, meet, rng, two_speakers=True):
    audio_dir = data / meet / "audio"
    audio_dir.mkdir(parents=True)
    n_ch = 2 if two_speakers else 1
    for ch in range(n_ch):
        write_wav(
            str(audio_dir / f"{meet}.Headset-{ch}.wav"),
            (0.1 * rng.randn(5 * SR)).astype(np.float32), SR)
    speakers = '<speaker nxt_agent="A" global_name="FEE001" channel="0"/>'
    if two_speakers:
        speakers += '<speaker nxt_agent="B" global_name="MEE002" channel="1"/>'
    return (
        f'<meeting observation="{meet}">{speakers}</meeting>',
        [
            (f"{meet}.A.segments.xml",
             '<segments><segment transcriber_start="0.5" transcriber_end="2.0"/></segments>'),
            (f"{meet}.A.words.xml",
             '<words><w starttime="0.5" endtime="1.0">HELLO</w>'
             '<w starttime="1.1" endtime="1.9">WORLD</w></words>'),
        ]
        + (
            [
                (f"{meet}.B.segments.xml",
                 '<segments><segment transcriber_start="2.5" transcriber_end="3.5"/></segments>'),
                (f"{meet}.B.words.xml",
                 '<words><w starttime="2.6" endtime="3.4">OKAY</w></words>'),
            ]
            if two_speakers
            else []
        ),
    )


def test_prepare_ami_ihm(tmp_path):
    from lhotse_tpu.recipes import prepare_ami

    meet = "ES2011a"  # ES2011 is in the full-corpus dev list
    data = tmp_path / "amicorpus"
    ann = tmp_path / "annotations"
    (ann / "corpusResources").mkdir(parents=True)
    (ann / "segments").mkdir()
    (ann / "words").mkdir()
    rng = np.random.RandomState(0)
    meeting_xml = []
    # One meeting per official partition so every split is non-empty.
    for m_id, two in ((meet, True), ("ES2002a", False), ("ES2004a", False)):
        xml, files = _add_meeting(data, ann, m_id, rng, two_speakers=two)
        meeting_xml.append(xml)
        for name, content in files:
            sub = "segments" if "segments" in name else "words"
            (ann / sub / name).write_text(content)
    (ann / "corpusResources" / "meetings.xml").write_text(
        "<corpus>" + "".join(meeting_xml) + "</corpus>"
    )

    m = prepare_ami(
        data, annotations_dir=ann, output_dir=tmp_path / "out", mic="ihm",
        partition="full-corpus")
    dev = m["dev"]
    recs, sups = dev["recordings"], dev["supervisions"]
    assert len(recs.to_eager()) == 1
    rec = recs.to_eager()[meet]
    # Two headsets grouped into one 2-channel virtual recording.
    assert [s.channels for s in rec.sources] == [[0], [1]]
    assert rec.load_audio().shape == (2, 5 * SR)

    eager = sups.to_eager()
    assert len(eager) == 2
    a = eager[f"{meet}-0-0"]
    assert a.speaker == "FEE001"
    assert a.channel == 0
    assert a.start == 0.5
    assert a.text and "HELLO" in a.text.upper()
    words = a.alignment["word"]
    assert [w.symbol.upper() for w in words] == ["HELLO", "WORLD"]
    b = eager[f"{meet}-1-0"]
    assert b.speaker == "MEE002" and b.channel == 1
    validate_recordings_and_supervisions(recs.to_eager(), eager)

    # One meeting routed to each official partition.
    assert [r.id for r in m["train"]["recordings"].to_eager()] == ["ES2002a"]
    assert [r.id for r in m["test"]["recordings"].to_eager()] == ["ES2004a"]
