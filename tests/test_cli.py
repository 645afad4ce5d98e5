"""CLI tests driven through click's CliRunner."""
import numpy as np
import pytest
from click.testing import CliRunner

from lhotse_tpu import Recording, RecordingSet, SupervisionSegment, SupervisionSet
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.bin.modes import cli

SR = 16000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_corpus")
    rng = np.random.RandomState(0)
    recs, sups = [], []
    for i in range(4):
        n = SR + i * 4000
        p = d / f"r{i}.wav"
        write_wav(str(p), (rng.randn(n) * 0.1).astype(np.float32), SR)
        r = Recording.from_file(p)
        recs.append(r)
        sups.append(
            SupervisionSegment(
                id=f"s{i}", recording_id=r.id, start=0.1,
                duration=round(r.duration - 0.2, 2), text=f"utt {i}",
                speaker=f"spk{i % 2}",
            )
        )
    RecordingSet.from_recordings(recs).to_file(d / "recordings.jsonl.gz")
    SupervisionSet.from_segments(sups).to_file(d / "supervisions.jsonl.gz")
    return d


@pytest.fixture(scope="module")
def cuts_path(corpus):
    runner = CliRunner()
    out = corpus / "cuts.jsonl.gz"
    res = runner.invoke(
        cli,
        [ "cut", "simple", "-r", str(corpus / "recordings.jsonl.gz"), "-s", str(corpus / "supervisions.jsonl.gz"), "--force-eager", str(out), ],
    )
    assert res.exit_code == 0, res.output
    return out


def test_validate(corpus):
    res = CliRunner().invoke(cli, ["validate", str(corpus / "recordings.jsonl.gz")])
    assert res.exit_code == 0, res.output


def test_validate_pair(corpus):
    res = CliRunner().invoke(
        cli,
        [ "validate-pair", str(corpus / "recordings.jsonl.gz"), str(corpus / "supervisions.jsonl.gz"), ],
    )
    assert res.exit_code == 0, res.output


def test_fix(corpus, tmp_path):
    res = CliRunner().invoke(
        cli,
        [ "fix", str(corpus / "recordings.jsonl.gz"), str(corpus / "supervisions.jsonl.gz"), str(tmp_path), ],
    )
    assert res.exit_code == 0, res.output
    assert (tmp_path / "recordings.jsonl.gz").exists()


def test_cut_simple_and_describe(cuts_path):
    res = CliRunner().invoke(cli, ["cut", "describe", str(cuts_path)])
    assert res.exit_code == 0, res.output
    assert "Cuts count:" in res.output


def test_subset_split_combine_filter(cuts_path, tmp_path):
    runner = CliRunner()
    sub = tmp_path / "sub.jsonl.gz"
    res = runner.invoke(cli, ["subset", "--first", "2", str(cuts_path), str(sub)])
    assert res.exit_code == 0, res.output

    res = runner.invoke(cli, ["split", "2", str(cuts_path), str(tmp_path / "splits")])
    assert res.exit_code == 0, res.output

    parts = sorted((tmp_path / "splits").glob("*.jsonl.gz"))
    assert len(parts) == 2
    res = runner.invoke(cli, ["combine", *[str(p) for p in parts], str(tmp_path / "rec.jsonl.gz")])
    assert res.exit_code == 0, res.output

    res = runner.invoke(
        cli, ["filter", "duration>1.2", str(cuts_path), str(tmp_path / "f.jsonl.gz")])
    assert res.exit_code == 0, res.output
    from lhotse_tpu import CutSet

    filtered = CutSet.from_file(tmp_path / "f.jsonl.gz")
    assert all(c.duration > 1.2 for c in filtered)


def test_feat_extract_cuts(cuts_path, tmp_path):
    res = CliRunner().invoke(
        cli,
        [ "feat", "extract-cuts", str(cuts_path), str(tmp_path / "cuts_feats.jsonl.gz"), str(tmp_path / "storage"), ],
    )
    assert res.exit_code == 0, res.output
    from lhotse_tpu import CutSet

    cuts = CutSet.from_file(tmp_path / "cuts_feats.jsonl.gz")
    assert all(c.has_features for c in cuts)


def test_shar_export_and_index(cuts_path, tmp_path):
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [ "shar", "export", "-a", "wav", "--no-compress-jsonl", str(cuts_path), str(tmp_path / "shar"), ],
    )
    assert res.exit_code == 0, res.output
    from lhotse_tpu import CutSet

    back = CutSet.from_shar(in_dir=tmp_path / "shar")
    assert back.has_constant_time_access
    assert len(back) == 4


def test_workflows_simulate_meetings(cuts_path, tmp_path):
    res = CliRunner().invoke(
        cli,
        [ "workflows", "simulate-meetings", "-m", "independent", "-n", "2", "-s", "2", str(cuts_path), str(tmp_path / "meetings.jsonl.gz"), ],
    )
    assert res.exit_code == 0, res.output
    from lhotse_tpu import CutSet

    meetings = CutSet.from_file(tmp_path / "meetings.jsonl.gz")
    assert len(meetings) == 2
    assert all(len(c.tracks) == 2 for c in meetings)
    # The meetings are loadable audio mixtures.
    audio = list(meetings)[0].load_audio()
    assert audio.ndim == 2 and audio.shape[1] > 0


def test_workflows_activity_detection(corpus, tmp_path):
    res = CliRunner().invoke(
        cli,
        [ "workflows", "activity-detection", "-r", str(corpus / "recordings.jsonl.gz"), "-o", str(tmp_path / "vad.jsonl.gz"), ],
    )
    assert res.exit_code == 0, res.output
    from lhotse_tpu import SupervisionSet

    sups = SupervisionSet.from_file(tmp_path / "vad.jsonl.gz")
    assert len(sups) >= 4  # white noise: everything is "active"


def test_conversational_simulator(cuts_path):
    from lhotse_tpu import CutSet
    from lhotse_tpu.workflows import ConversationalMeetingSimulator

    cuts = CutSet.from_file(cuts_path)
    sim = ConversationalMeetingSimulator()
    meetings = sim.simulate(cuts, num_meetings=2, num_speakers_per_meeting=2, seed=0)
    assert len(meetings) == 2
    for m in meetings:
        assert len(m.tracks) >= 1
        assert m.load_audio().shape[1] > 0


def test_feat_upload_rewrites_manifest(tmp_path):
    """`lhotse-tpu feat upload` copies matrices to URL-backed storage and
    rewrites the manifest (reference: bin/modes/features.py:255)."""
    import numpy as np

    from lhotse_tpu import FeatureSet
    from lhotse_tpu.features.io import LilcomChunkyWriter
    from lhotse_tpu.testing.dummies import dummy_features
    from lhotse_tpu.utils import fastcopy

    feats = []
    with LilcomChunkyWriter(tmp_path / "store") as w:
        for i in range(3):
            mat = np.random.RandomState(i).randn(50, 8).astype(np.float32)
            key = w.write(f"k{i}", mat)
            feats.append(
                fastcopy(
                    dummy_features(i), storage_type=w.name,
                    storage_path=str(w.storage_path), storage_key=key,
                    num_frames=50, num_features=8))
    FeatureSet.from_features(feats).to_file(tmp_path / "feats.jsonl.gz")

    res = CliRunner().invoke(
        cli,
        [
            "feat", "upload", str(tmp_path / "feats.jsonl.gz"),
            str(tmp_path / "remote"), str(tmp_path / "out.jsonl.gz"),
        ],
    )
    assert res.exit_code == 0, res.output
    out = FeatureSet.from_file(tmp_path / "out.jsonl.gz")
    for orig, new in zip(FeatureSet.from_file(tmp_path / "feats.jsonl.gz"), out):
        assert new.storage_type == "lilcom_url"
        assert np.abs(orig.load() - new.load()).max() < 2**-4


def test_list_resampling_backends():
    res = CliRunner().invoke(cli, ["list-resampling-backends"])
    assert res.exit_code == 0
    assert "default" in res.output
