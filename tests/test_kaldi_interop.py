"""Kaldi data-dir export → import roundtrip tests."""
import numpy as np
import pytest

from lhotse_tpu import Recording, RecordingSet, SupervisionSegment, SupervisionSet
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.kaldi import export_to_kaldi, load_kaldi_data_dir

SR = 16000


@pytest.fixture
def manifests(tmp_path):
    rng = np.random.RandomState(0)
    recs, sups = [], []
    for i in range(3):
        n = SR * 2
        p = tmp_path / f"rec{i}.wav"
        write_wav(str(p), (rng.randn(n) * 0.1).astype(np.float32), SR)
        r = Recording.from_file(p, recording_id=f"rec{i}")
        recs.append(r)
        sups.append(
            SupervisionSegment(
                id=f"utt{i}", recording_id=r.id, start=0.25, duration=1.5,
                channel=0, text=f"hello {i}", speaker=f"spk{i % 2}",
                language="English", gender="male",
            )
        )
    return RecordingSet.from_recordings(recs), SupervisionSet.from_segments(sups)


def test_export_import_roundtrip(manifests, tmp_path):
    recs, sups = manifests
    data_dir = tmp_path / "kaldi_data"
    export_to_kaldi(recs, sups, data_dir)

    for name in (
        "wav.scp", "segments", "text", "utt2spk", "utt2dur", "reco2dur", "utt2lang", "utt2gender"):
        assert (data_dir / name).is_file(), f"missing {name}"

    recs2, sups2, feats2 = load_kaldi_data_dir(data_dir, sampling_rate=SR)
    assert feats2 is None
    assert sorted(r.id for r in recs2) == sorted(r.id for r in recs)
    assert len(sups2) == len(sups)
    for orig in sups:
        back = sups2[orig.id]
        assert back.recording_id == orig.recording_id
        assert back.start == pytest.approx(orig.start, abs=1e-3)
        assert back.duration == pytest.approx(orig.duration, abs=1e-3)
        assert back.text == orig.text
        assert back.speaker == orig.speaker

    # The imported recordings load actual audio.
    audio = list(recs2)[0].load_audio()
    assert audio.shape == (1, SR * 2)


def test_import_without_segments(manifests, tmp_path):
    recs, sups = manifests
    data_dir = tmp_path / "kaldi_data2"
    export_to_kaldi(recs, sups, data_dir)
    # Remove segments: utt2spk then implies whole-recording supervisions.
    (data_dir / "segments").unlink()
    # Rewrite text/utt2spk keyed by recording IDs to match that mode.
    (data_dir / "text").write_text("".join(f"rec{i} hi {i}\n" for i in range(3)))
    (data_dir / "utt2spk").write_text("".join(f"rec{i} spk{i % 2}\n" for i in range(3)))
    recs2, sups2, _ = load_kaldi_data_dir(data_dir, sampling_rate=SR)
    assert len(sups2) == 3
    assert all(s.start == 0.0 for s in sups2)


def test_cli_kaldi_roundtrip(manifests, tmp_path):
    from click.testing import CliRunner

    from lhotse_tpu.bin.modes import cli

    recs, sups = manifests
    recs.to_file(tmp_path / "recordings.jsonl.gz")
    sups.to_file(tmp_path / "supervisions.jsonl.gz")
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [ "kaldi", "export", str(tmp_path / "recordings.jsonl.gz"), str(tmp_path / "supervisions.jsonl.gz"), str(tmp_path / "kdir"), ],
    )
    assert res.exit_code == 0, res.output
    res = runner.invoke(
        cli, ["kaldi", "import", str(tmp_path / "kdir"), str(SR), str(tmp_path / "mdir")])
    assert res.exit_code == 0, res.output
    assert (tmp_path / "mdir" / "recordings.jsonl.gz").is_file()
    assert (tmp_path / "mdir" / "supervisions.jsonl.gz").is_file()


def test_wav_scp_pipe_entries_become_command_sources(tmp_path):
    """Kaldi wav.scp lines ending in '|' are unix pipes: imported as
    type=command AudioSources and actually decodable."""
    n = SR
    wav = tmp_path / "p0.wav"
    write_wav(str(wav), (0.05 * np.ones(n)).astype(np.float32), SR)
    data_dir = tmp_path / "kdir"
    data_dir.mkdir()
    (data_dir / "wav.scp").write_text(f"p0 cat {wav} |\n")
    (data_dir / "utt2spk").write_text("p0 spkA\n")
    (data_dir / "text").write_text("p0 hello\n")
    (data_dir / "reco2dur").write_text("p0 1.0\n")

    recs, sups, feats = load_kaldi_data_dir(data_dir, sampling_rate=SR)
    rec = recs["p0"]
    assert rec.sources[0].type == "command"
    assert rec.sources[0].source.strip() == f"cat {wav}"
    audio = rec.load_audio()
    assert audio.shape == (1, n)
    assert sups["p0"].speaker == "spkA"


def test_durations_read_from_reco2dur_without_decoding(tmp_path):
    """With reco2dur present, durations come from the file (no audio probe
    needed for pipe sources)."""
    data_dir = tmp_path / "kdir2"
    data_dir.mkdir()
    (data_dir / "wav.scp").write_text("u0 sox -n -t wav - synth 2 sine 300 |\n")
    (data_dir / "utt2spk").write_text("u0 spk\n")
    (data_dir / "reco2dur").write_text("u0 2.5\n")
    recs, sups, _ = load_kaldi_data_dir(data_dir, sampling_rate=SR)
    assert recs["u0"].duration == pytest.approx(2.5)


def test_segments_end_minus_one_runs_to_recording_end(tmp_path):
    n = 2 * SR
    wav = tmp_path / "e0.wav"
    write_wav(str(wav), (0.05 * np.ones(n)).astype(np.float32), SR)
    data_dir = tmp_path / "kdir3"
    data_dir.mkdir()
    (data_dir / "wav.scp").write_text(f"e0 {wav}\n")
    (data_dir / "segments").write_text("e0-utt e0 0.5 -1\n")
    (data_dir / "utt2spk").write_text("e0-utt spk\n")
    (data_dir / "text").write_text("e0-utt words\n")
    (data_dir / "reco2dur").write_text("e0 2.0\n")
    recs, sups, _ = load_kaldi_data_dir(data_dir, sampling_rate=SR)
    seg = sups["e0-utt"]
    assert seg.start == pytest.approx(0.5)
    assert seg.duration == pytest.approx(1.5)


def test_load_kaldi_text_mapping_and_text_file(tmp_path):
    from lhotse_tpu.kaldi import load_kaldi_text_file, load_kaldi_text_mapping

    p = tmp_path / "utt2spk"
    p.write_text("a spk1\nb spk2\n\n")
    assert load_kaldi_text_mapping(p) == {"a": "spk1", "b": "spk2"}
    missing = load_kaldi_text_mapping(tmp_path / "nope")
    assert missing == {} or all(v is None for v in missing.values())

    t = tmp_path / "text"
    t.write_text("a hello world\nb\n")
    texts = load_kaldi_text_file(t, allow_empty_ref=True)
    assert texts["a"] == "hello world"
    assert texts.get("b", "") == ""


def test_export_multichannel_recording_splits_channels(tmp_path):
    """Kaldi has no native multi-channel wav.scp entry: export writes one
    line per channel with a channel-extraction command."""
    n = SR
    data = np.stack([0.05 * np.ones(n), -0.05 * np.ones(n)]).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(str(p), data, SR)
    rec = Recording.from_file(p, recording_id="st")
    sups = SupervisionSet.from_segments(
        [
            SupervisionSegment(
                id="st-utt", recording_id="st", start=0.0, duration=1.0,
                channel=0, text="x", speaker="s")
        ]
    )
    out = tmp_path / "kout"
    export_to_kaldi(
        RecordingSet.from_recordings([rec]), sups, out, map_underscores_to=None
    )
    scp = (out / "wav.scp").read_text()
    assert len(scp.strip().splitlines()) == 2  # one entry per channel


def test_cli_import_compute_durations_flag(tmp_path):
    """`kaldi import -d` ignores a (wrong) reco2dur and derives durations
    from the audio itself (reference flag: bin/modes/kaldi.py import -d)."""
    from click.testing import CliRunner

    from lhotse_tpu.audio import RecordingSet
    from lhotse_tpu.bin.modes import cli

    wav = tmp_path / "u0.wav"
    write_wav(str(wav), (0.05 * np.ones(SR)).astype(np.float32), SR)  # 1.0 s
    kdir = tmp_path / "kdir"
    kdir.mkdir()
    (kdir / "wav.scp").write_text(f"u0 {wav}\n")
    (kdir / "utt2spk").write_text("u0 spkA\n")
    (kdir / "reco2dur").write_text("u0 7.5\n")  # deliberately wrong

    runner = CliRunner()
    res = runner.invoke(
        cli, ["kaldi", "import", str(kdir), str(SR), str(tmp_path / "trusting")])
    assert res.exit_code == 0, res.output
    trusting = RecordingSet.from_file(tmp_path / "trusting" / "recordings.jsonl.gz")
    assert trusting["u0"].duration == 7.5  # reco2dur taken at face value

    res = runner.invoke(
        cli, ["kaldi", "import", "-d", str(kdir), str(SR), str(tmp_path / "measured")])
    assert res.exit_code == 0, res.output
    measured = RecordingSet.from_file(tmp_path / "measured" / "recordings.jsonl.gz")
    assert abs(measured["u0"].duration - 1.0) < 1e-6
