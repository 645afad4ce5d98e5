"""
Shar-format differential tests vs the ACTUAL reference: identical cuts
exported with both implementations' ``to_shar`` must produce the same
archive layout (shard file names, tar member names and payload sizes, jsonl
manifest contents), and each side's archives must load in the other.

Reference: lhotse/shar/writers/{shar,tar}.py, lhotse/cut/set.py (to_shar /
from_shar).
"""
import json
import tarfile

import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    from lhotse import CutSet as RefCutSet, Recording as RefRecording
    from lhotse.audio.backend import (
        LibsndfileBackend,
        set_current_audio_backend as ref_set_backend,
    )

    ref_set_backend(LibsndfileBackend())

from lhotse_tpu import CutSet as MyCutSet, Recording as MyRecording
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.serialization import open_best

SR = 16000
N = 5


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(3)
    audio = tmp_path / "audio"
    audio.mkdir()
    for i in range(N):
        n = int(SR * (1.0 + 0.2 * i))
        write_wav(str(audio / f"r{i}.wav"), (rng.randn(1, n) * 0.1).astype(np.float32), SR)
    theirs = RefCutSet.from_cuts(
        RefRecording.from_file(audio / f"r{i}.wav").to_cut() for i in range(N)
    )
    mine = MyCutSet.from_cuts(
        MyRecording.from_file(audio / f"r{i}.wav").to_cut() for i in range(N)
    )
    return theirs, mine


def _layout(shar_dir):
    """{filename: [(member_name, size), ...] for tars; [json lines] for jsonl}."""
    out = {}
    for p in sorted(shar_dir.iterdir()):
        if p.name.endswith(".tar"):
            with tarfile.open(p) as tf:
                out[p.name] = [(m.name, m.size) for m in tf.getmembers()]
        elif ".jsonl" in p.name:
            with open_best(p) as f:
                out[p.name] = [json.loads(line) for line in f if line.strip()]
    return out


def test_shar_layout_matches(tmp_path, corpus):
    theirs, mine = corpus
    ref_dir, my_dir = tmp_path / "ref_shar", tmp_path / "my_shar"
    ref_dir.mkdir()
    my_dir.mkdir()
    theirs.to_shar(ref_dir, fields={"recording": "wav"}, shard_size=2)
    mine.to_shar(my_dir, fields={"recording": "wav"}, shard_size=2, create_index=False)

    t_layout = _layout(ref_dir)
    m_layout = _layout(my_dir)
    assert set(t_layout) == set(m_layout), (
        f"shard files differ: {set(t_layout) ^ set(m_layout)}"
    )
    for name in t_layout:
        if name.endswith(".tar"):
            assert t_layout[name] == m_layout[name], f"tar members differ in {name}"
        else:
            t_rows, m_rows = t_layout[name], m_layout[name]
            assert len(t_rows) == len(m_rows), name
            for t, m in zip(t_rows, m_rows):
                # the recording became an in-tar pointer on both sides
                assert t["id"] == m["id"], name
                assert t.get("recording", {}).get("sources") == m.get(
                    "recording", {}
                ).get("sources"), (name, t["id"])


def test_cross_reading(tmp_path, corpus):
    theirs, mine = corpus
    ref_dir, my_dir = tmp_path / "ref_shar", tmp_path / "my_shar"
    ref_dir.mkdir()
    my_dir.mkdir()
    theirs.to_shar(ref_dir, fields={"recording": "wav"}, shard_size=2)
    mine.to_shar(my_dir, fields={"recording": "wav"}, shard_size=2, create_index=False)

    # reference reads ours
    ref_read = {c.id: c for c in RefCutSet.from_shar(in_dir=my_dir)}
    # we read the reference's
    my_read = {c.id: c for c in MyCutSet.from_shar(in_dir=ref_dir)}
    assert set(ref_read) == set(my_read) == {c.id for c in mine}
    for c in mine:
        a = ref_read[c.id].load_audio()
        b = my_read[c.id].load_audio()
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c.load_audio())
