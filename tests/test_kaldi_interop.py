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
