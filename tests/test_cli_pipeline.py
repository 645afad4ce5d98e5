"""
End-to-end CLI pipeline: the full data-prep chain a user would run, each
stage feeding the next (fix -> cut -> trim -> feat -> shar/kaldi/split/...).
Pins the CLI drive that exposed the unsorted-lazy-join supervision loss.
"""
import numpy as np
import pytest
from click.testing import CliRunner

from lhotse_tpu import CutSet, RecordingSet, SupervisionSegment, SupervisionSet
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.bin.modes import cli
from lhotse_tpu.cut import MixedCut

SR = 16000


def invoke(*args):
    res = CliRunner().invoke(cli, [str(a) for a in args], catch_exceptions=False)
    assert res.exit_code == 0, f"{args} -> {res.output}"
    return res


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipeline")
    rng = np.random.RandomState(0)
    for i in range(6):
        t = np.arange(int(SR * (1.5 + 0.3 * i))) / SR
        sig = 0.2 * np.sin(2 * np.pi * (180 + 30 * i) * t) + 0.01 * rng.randn(t.size)
        write_wav(d / f"utt{i}.wav", sig.astype(np.float32), SR)
    RecordingSet.from_dir(d, "*.wav").to_file(d / "recordings.jsonl.gz")
    SupervisionSet.from_segments([
        SupervisionSegment(
            id=f"s{i}", recording_id=f"utt{i}", start=0.1, duration=1.0,
            channel=0, text=f"word{i}", speaker=f"spk{i % 2}")
        for i in range(6)
    ]).to_file(d / "supervisions.jsonl.gz")
    return d


@pytest.fixture(scope="module")
def trimmed(workdir):
    d = workdir
    invoke("fix", d / "recordings.jsonl.gz", d / "supervisions.jsonl.gz", d / "fixed")
    invoke("cut", "simple",
           "-r", d / "fixed" / "recordings.jsonl.gz",
           "-s", d / "fixed" / "supervisions.jsonl.gz",
           d / "cuts.jsonl.gz")
    invoke("cut", "trim-to-supervisions", d / "cuts.jsonl.gz", d / "trimmed.jsonl")
    return d / "trimmed.jsonl"


def test_cut_simple_keeps_every_supervision(trimmed):
    cuts = list(CutSet.from_file(trimmed))
    # Regression: the lazy sorted-merge join must attach all 6 supervisions.
    assert len(cuts) == 6
    assert all(len(c.supervisions) == 1 for c in cuts)


def test_feat_extract_then_shar_roundtrip(workdir, trimmed):
    d = workdir
    invoke("feat", "extract-cuts", trimmed, d / "cuts_feats.jsonl.gz", d / "feats")
    invoke("shar", "export", "-a", "flac", "-f", "lilcom",
           "--no-compress-jsonl", d / "cuts_feats.jsonl.gz", d / "shar")
    n = 0
    for c in CutSet.from_shar(in_dir=d / "shar"):
        assert c.load_features().shape[1] == 80
        assert c.load_audio().shape[0] == 1
        assert c.supervisions
        n += 1
    assert n == 6
    # --no-compress-jsonl + create_index: exact indexed restore works.
    from lhotse_tpu.shar.readers.indexed import LazyIndexedSharIterator

    idx = LazyIndexedSharIterator(in_dir=d / "shar")
    assert len(idx) == 6
    assert idx[3].load_features().shape[1] == 80


def test_kaldi_export_import_roundtrip(workdir):
    d = workdir
    invoke("kaldi", "export", d / "fixed" / "recordings.jsonl.gz",
           d / "fixed" / "supervisions.jsonl.gz", d / "kaldi_dir")
    invoke("kaldi", "import", d / "kaldi_dir", SR, d / "kaldi_back")
    back = RecordingSet.from_file(d / "kaldi_back" / "recordings.jsonl.gz")
    assert len(list(back)) == 6
    sups = SupervisionSet.from_file(d / "kaldi_back" / "supervisions.jsonl.gz")
    assert sorted(s.recording_id for s in sups) == [f"utt{i}" for i in range(6)]


def test_split_combine_subset_filter(workdir, trimmed):
    d = workdir
    invoke("split", 2, trimmed, d / "splits")
    invoke("combine", *sorted((d / "splits").glob("*")), d / "recombined.jsonl.gz")
    assert len(list(CutSet.from_file(d / "recombined.jsonl.gz"))) == 6
    invoke("subset", "--first", 3, trimmed, d / "subset3.jsonl.gz")
    assert len(list(CutSet.from_file(d / "subset3.jsonl.gz"))) == 3
    invoke("filter", "duration>0.9", trimmed, d / "filtered.jsonl.gz")
    filtered = list(CutSet.from_file(d / "filtered.jsonl.gz"))
    assert all(c.duration > 0.9 for c in filtered) and filtered


def test_cut_manipulation_chain(workdir):
    d = workdir
    invoke("cut", "truncate", "--max-duration", 1.5, d / "cuts.jsonl.gz",
           d / "truncated.jsonl.gz")
    assert all(c.duration <= 1.5 + 1e-6 for c in CutSet.from_file(d / "truncated.jsonl.gz"))
    invoke("cut", "pad", "--duration", 5.0, d / "truncated.jsonl.gz", d / "padded.jsonl.gz")
    for c in CutSet.from_file(d / "padded.jsonl.gz"):
        assert abs(c.duration - 5.0) < 1e-6
        assert c.load_audio().shape[1] == 5 * SR
    invoke("cut", "mix-sequential", d / "cuts.jsonl.gz", d / "cuts.jsonl.gz",
           d / "mixed.jsonl.gz")
    mixed = list(CutSet.from_file(d / "mixed.jsonl.gz"))
    assert all(isinstance(c, MixedCut) and len(c.tracks) == 2 for c in mixed)
    invoke("cut", "decompose", d / "cuts.jsonl.gz", d / "decomposed")
    assert (d / "decomposed" / "recordings.jsonl.gz").exists()


def test_index_jsonl_enables_o1_access(workdir, trimmed):
    invoke("index", "jsonl", trimmed)
    assert trimmed.with_suffix(".jsonl.idx").exists()


def test_workflows_vad_and_meetings(workdir):
    d = workdir
    invoke("workflows", "activity-detection",
           "-r", d / "fixed" / "recordings.jsonl.gz", "-o", d / "vad.jsonl.gz")
    vad = list(SupervisionSet.from_file(d / "vad.jsonl.gz"))
    assert vad  # tone bursts are active speech for the energy detector
    invoke("workflows", "simulate-meetings", "--num-meetings", 2,
           "--num-speakers-per-meeting", 2, d / "cuts.jsonl.gz",
           d / "meetings.jsonl.gz")
    meetings = list(CutSet.from_file(d / "meetings.jsonl.gz"))
    assert len(meetings) == 2
    assert all(len({s.speaker for s in c.supervisions}) == 2 for c in meetings)
    # Conversational method with distribution flags + synthetic reverberation.
    invoke("workflows", "simulate-meetings", "--method", "conversational",
           "--same-spk-pause", 0.5, "--diff-spk-overlap", 1.0,
           "--num-meetings", 1, "--reverberate",
           d / "cuts.jsonl.gz", d / "meetings_rev.jsonl.gz")
    rev = list(CutSet.from_file(d / "meetings_rev.jsonl.gz"))
    assert len(rev) == 1
    assert np.isfinite(rev[0].load_audio()).all()


def test_export_to_webdataset_cli(workdir, trimmed):
    d = workdir
    invoke("cut", "export-to-webdataset", trimmed, d / "wds.tar", "--no-features")
    back = list(CutSet.from_webdataset(str(d / "wds.tar")))
    assert len(back) == 6
    assert back[0].load_audio().shape[0] == 1


def test_trim_keep_all_channels_flag(workdir):
    d = workdir
    invoke("cut", "trim-to-supervisions", d / "cuts.jsonl.gz",
           d / "trimmed_kac.jsonl.gz", "--keep-all-channels")
    assert len(list(CutSet.from_file(d / "trimmed_kac.jsonl.gz"))) == 6
