"""
Deep coverage of the indexed (O(1) random access) Shar reader: auto-detect
rules, getitem/graph tokens, state restore within and across shards,
shuffled iteration with saved seeds, index_path/indexes_root forms, and
the from_shar argument-validation matrix.

Behavioral model: /root/reference/test/shar/test_indexed_read.py.
"""
import pickle

import numpy as np
import pytest

from lhotse_tpu import CutSet, Recording
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.shar import LazyIndexedSharIterator
from lhotse_tpu.supervision import SupervisionSegment

SR = 16000
N = 7


@pytest.fixture(scope="module")
def cuts(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    rng = np.random.RandomState(5)
    out = []
    for i in range(N):
        p = d / f"r{i}.wav"
        write_wav(str(p), (rng.randn(SR // 2) * 0.1).astype(np.float32), SR)
        c = Recording.from_file(p, recording_id=f"r{i}").to_cut()
        c.supervisions = [
            SupervisionSegment(
                id=f"s{i}", recording_id=f"r{i}", start=0, duration=c.duration)
        ]
        out.append(c)
    return CutSet.from_cuts(out)


@pytest.fixture(scope="module")
def idx_dir(cuts, tmp_path_factory):
    d = tmp_path_factory.mktemp("shar_idx")
    cuts.to_shar(
        d, fields={"recording": "wav"}, shard_size=3, compress_jsonl=False,
        create_index=True, verbose=False)
    return d


@pytest.fixture(scope="module")
def gz_dir(cuts, tmp_path_factory):
    d = tmp_path_factory.mktemp("shar_gz")
    cuts.to_shar(d, fields={"recording": "wav"}, shard_size=3, verbose=False)
    return d


@pytest.fixture(scope="module")
def noidx_dir(cuts, tmp_path_factory):
    d = tmp_path_factory.mktemp("shar_noidx")
    cuts.to_shar(
        d, fields={"recording": "wav"}, shard_size=3, compress_jsonl=False,
        create_index=False, verbose=False)
    return d


def _ids(it):
    return [c.id for c in it]


# ---------------------------------------------------------------------------
# Auto-detection
# ---------------------------------------------------------------------------
def test_auto_detect_uses_indexed_reader(idx_dir):
    cs = CutSet.from_shar(in_dir=idx_dir)
    assert isinstance(cs.data, LazyIndexedSharIterator)


def test_auto_detect_compressed_falls_back_to_streaming(gz_dir):
    cs = CutSet.from_shar(in_dir=gz_dir)
    assert not isinstance(cs.data, LazyIndexedSharIterator)


def test_auto_detect_missing_indexes_falls_back(noidx_dir):
    cs = CutSet.from_shar(in_dir=noidx_dir)
    assert not isinstance(cs.data, LazyIndexedSharIterator)


def _fresh_noidx(cuts, where):
    cuts.to_shar(
        where, fields={"recording": "wav"}, shard_size=3, compress_jsonl=False,
        create_index=False, verbose=False)
    return where


def test_indexed_true_without_indexes_creates_them(cuts, tmp_path):
    # Explicit indexed=True builds the missing sidecars on the fly (a fresh
    # export: the shared fixture must stay index-free for other tests).
    d = _fresh_noidx(cuts, tmp_path / "shar")
    cs = CutSet.from_shar(in_dir=d, indexed=True)
    assert isinstance(cs.data, LazyIndexedSharIterator)
    assert len(_ids(cs)) == N
    assert list(d.glob("*.idx"))  # sidecars created next to the shards


def test_indexed_false_forces_streaming(idx_dir):
    cs = CutSet.from_shar(in_dir=idx_dir, indexed=False)
    assert not isinstance(cs.data, LazyIndexedSharIterator)
    assert len(_ids(cs)) == N


# ---------------------------------------------------------------------------
# Access semantics
# ---------------------------------------------------------------------------
def test_indexed_matches_sequential(cuts, idx_dir, gz_dir):
    indexed = _ids(CutSet.from_shar(in_dir=idx_dir))
    streaming = _ids(CutSet.from_shar(in_dir=gz_dir))
    assert indexed == streaming == _ids(cuts)


def test_len_and_constant_time_access(idx_dir):
    it = LazyIndexedSharIterator(in_dir=idx_dir)
    assert len(it) == N
    assert it.is_indexed and it.has_constant_time_access


def test_getitem_random_access_with_data(cuts, idx_dir):
    it = LazyIndexedSharIterator(in_dir=idx_dir)
    for k in (6, 0, 3, 5, 3):
        c = it[k]
        assert c.id == cuts[k].id
        np.testing.assert_allclose(
            c.load_audio(), cuts[k].load_audio(), atol=2 / 32768
        )


def test_getitem_out_of_range(idx_dir):
    it = LazyIndexedSharIterator(in_dir=idx_dir)
    with pytest.raises(IndexError):
        it[N]
    assert it[-1].id == it[N - 1].id  # negative indexing from the end


def test_pickle_roundtrip(idx_dir):
    it = LazyIndexedSharIterator(in_dir=idx_dir)
    _ = it[2]
    clone = pickle.loads(pickle.dumps(it))
    assert _ids(clone) == _ids(LazyIndexedSharIterator(in_dir=idx_dir))
    assert clone[4].id == it[4].id


# ---------------------------------------------------------------------------
# State restore
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("take", [1, 3, 4, 6])  # within + across shard edges
def test_state_dict_restore(idx_dir, take):
    base = _ids(LazyIndexedSharIterator(in_dir=idx_dir))
    it = LazyIndexedSharIterator(in_dir=idx_dir)
    s = iter(it)
    head = [next(s).id for _ in range(take)]
    sd = it.state_dict()

    fresh = LazyIndexedSharIterator(in_dir=idx_dir)
    fresh.load_state_dict(sd)
    assert head + _ids(fresh) == base


def test_shuffled_iteration_covers_and_resumes(idx_dir):
    it = LazyIndexedSharIterator(in_dir=idx_dir, shuffle=True, seed=3)
    order = _ids(it)
    assert sorted(order) == sorted(f"r{i}" for i in range(N))
    assert order != [f"r{i}" for i in range(N)]

    it2 = LazyIndexedSharIterator(in_dir=idx_dir, shuffle=True, seed=3)
    s = iter(it2)
    head = [next(s).id for _ in range(3)]
    sd = it2.state_dict()
    # Restore into a reader constructed with a DIFFERENT seed: the saved
    # iteration state governs, not the constructor argument.
    it3 = LazyIndexedSharIterator(in_dir=idx_dir, shuffle=True, seed=999)
    it3.load_state_dict(sd)
    tail = _ids(it3)
    assert head + tail == order


# ---------------------------------------------------------------------------
# Fields-based construction and index_path forms
# ---------------------------------------------------------------------------
def _field_lists(idx_dir):
    cuts_files = sorted(str(p) for p in idx_dir.glob("cuts.*.jsonl"))
    rec_files = sorted(str(p) for p in idx_dir.glob("recording.*.tar"))
    return {"cuts": cuts_files, "recording": rec_files}


def test_fields_based_indexed_reader(cuts, idx_dir):
    it = LazyIndexedSharIterator(fields=_field_lists(idx_dir))
    assert _ids(it) == _ids(cuts)
    c = it[2]
    np.testing.assert_allclose(c.load_audio(), cuts[2].load_audio(), atol=2 / 32768)


def test_fields_requires_cuts_key(idx_dir):
    fields = _field_lists(idx_dir)
    fields.pop("cuts")
    with pytest.raises(AssertionError, match="cuts"):
        LazyIndexedSharIterator(fields=fields)


def test_indexes_root_mirror(cuts, tmp_path):
    # Indexes created under a separate root, shar dir untouched.
    d = _fresh_noidx(cuts, tmp_path / "shar")
    root = tmp_path / "idxroot"
    it = LazyIndexedSharIterator(in_dir=d, indexes_root=root)
    assert _ids(it) == _ids(cuts)
    assert not list(d.glob("*.idx"))
    created = list(root.rglob("*.idx"))
    assert len(created) == 6  # 3 shards x (cuts + recording)


def test_index_path_and_indexes_root_mutually_exclusive(idx_dir, tmp_path):
    with pytest.raises(ValueError, match="not both"):
        LazyIndexedSharIterator(
            in_dir=idx_dir, index_path=tmp_path, indexes_root=tmp_path / "x"
        )


def test_from_shar_index_path_with_indexed_false_raises(idx_dir, tmp_path):
    with pytest.raises(ValueError, match="contradictory"):
        CutSet.from_shar(in_dir=idx_dir, indexed=False, index_path=tmp_path)


# ---------------------------------------------------------------------------
# Argument validation in from_shar
# ---------------------------------------------------------------------------
def test_indexed_rejects_cut_map_fns(idx_dir):
    with pytest.raises(ValueError, match="cut_map_fns"):
        CutSet.from_shar(in_dir=idx_dir, indexed=True, cut_map_fns=[lambda c: c])


def test_indexed_rejects_slice_length(idx_dir):
    with pytest.raises(ValueError, match="slice_length"):
        CutSet.from_shar(in_dir=idx_dir, indexed=True, slice_length=2)


# ---------------------------------------------------------------------------
# Distributed split with the indexed reader
# ---------------------------------------------------------------------------
def test_indexed_split_for_dataloading_grid(idx_dir, monkeypatch):
    from collections import Counter

    seen = Counter()
    for rank in range(2):
        for worker in range(2):
            monkeypatch.setenv("RANK", str(rank))
            monkeypatch.setenv("WORLD_SIZE", "2")
            monkeypatch.setenv("WORKER", str(worker))
            monkeypatch.setenv("NUM_WORKERS", "2")
            part = CutSet.from_shar(
                in_dir=idx_dir, indexed=True, split_for_dataloading=True
            )
            assert isinstance(part.data, LazyIndexedSharIterator)
            for c in part:
                seen[c.id] += 1
    assert set(seen) == {f"r{i}" for i in range(N)}
    assert all(v == 1 for v in seen.values())
