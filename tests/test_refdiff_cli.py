"""
CLI pipeline differential vs the ACTUAL reference: the same on-disk
manifests through both command-line tools (fix -> cut simple ->
cut trim-to-supervisions), with the output manifest files compared.

Reference: lhotse/bin/modes/{manipulation,cut}.py via click's CliRunner.
"""
import gzip
import json

import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    from click.testing import CliRunner

    from lhotse.audio.backend import (
        LibsndfileBackend,
        set_current_audio_backend as ref_set_backend,
    )
    from lhotse.bin.lhotse import cli as ref_cli

    ref_set_backend(LibsndfileBackend())

from lhotse_tpu import Recording, RecordingSet, SupervisionSegment, SupervisionSet
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.bin.lhotse_tpu import cli as my_cli

SR = 16000


def _read_jsonl(path):
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rt") as f:
        return [json.loads(line) for line in f if line.strip()]


def _canon(rows, drop_random_ids=False):
    out = []
    for r in rows:
        r = json.loads(json.dumps(r))  # deep copy
        if drop_random_ids:
            r.pop("id", None)
        out.append(r)
    key = lambda d: (
        d.get("recording", {}).get("id", d.get("recording_id", "")),
        d.get("start", 0),
        d.get("duration", 0),
    )
    return sorted(out, key=key)


@pytest.fixture()
def manifests(tmp_path):
    rng = np.random.RandomState(5)
    audio = tmp_path / "audio"
    audio.mkdir()
    recs, sups = [], []
    for i in range(4):
        n = int(SR * (1.5 + 0.25 * i))
        write_wav(str(audio / f"r{i}.wav"), (rng.randn(1, n) * 0.1).astype(np.float32), SR)
        rec = Recording.from_file(audio / f"r{i}.wav")
        recs.append(rec)
        for j in range(2):
            sups.append(
                SupervisionSegment(
                    f"s{i}-{j}", rec.id, start=0.3 * j, duration=0.6,
                    channel=0, text=f"w{i}{j}", speaker=f"spk{j}",
                )
            )
    rpath = tmp_path / "recordings.jsonl.gz"
    spath = tmp_path / "supervisions.jsonl.gz"
    RecordingSet.from_recordings(recs).to_file(rpath)
    SupervisionSet.from_segments(sups).to_file(spath)
    return rpath, spath


def _run(cli, args):
    res = CliRunner().invoke(cli, [str(a) for a in args], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    return res


def test_cli_cut_simple_and_trim_match(tmp_path, manifests):
    rpath, spath = manifests
    outputs = {}
    for side, cli in (("ref", ref_cli), ("mine", my_cli)):
        d = tmp_path / side
        d.mkdir()
        cuts = d / "cuts.jsonl.gz"
        trimmed = d / "trimmed.jsonl.gz"
        _run(cli, ["cut", "simple", "-r", rpath, "-s", spath, cuts])
        _run(cli, ["cut", "trim-to-supervisions", cuts, trimmed])
        outputs[side] = (_read_jsonl(cuts), _read_jsonl(trimmed))

    ref_cuts, ref_trimmed = outputs["ref"]
    my_cuts, my_trimmed = outputs["mine"]
    # `cut simple` mints random cut ids on both sides — compare modulo id
    assert _canon(ref_cuts, drop_random_ids=True) == _canon(
        my_cuts, drop_random_ids=True
    )
    # trim-to-supervisions derives ids deterministically from content order
    assert _canon(ref_trimmed, drop_random_ids=True) == _canon(
        my_trimmed, drop_random_ids=True
    )


def test_cli_fix_matches(tmp_path, manifests):
    rpath, spath = manifests
    # corrupt the supervisions: one beyond the recording end, one unknown rec
    rows = _read_jsonl(spath)
    rows.append(dict(rows[0], id="beyond", start=100.0))
    rows.append(dict(rows[0], id="ghost", recording_id="nope"))
    bad = tmp_path / "bad_sups.jsonl"
    with bad.open("w") as f:
        for r in rows:
            print(json.dumps(r), file=f)

    outputs = {}
    for side, cli in (("ref", ref_cli), ("mine", my_cli)):
        d = tmp_path / side
        d.mkdir()
        _run(cli, ["fix", rpath, bad, d])
        # fix stores outputs under the same names as the inputs
        outputs[side] = _read_jsonl(d / bad.name)

    assert _canon(outputs["ref"]) == _canon(outputs["mine"])
    ids = {r["id"] for r in outputs["mine"]}
    assert "ghost" not in ids  # unknown recording dropped by both
