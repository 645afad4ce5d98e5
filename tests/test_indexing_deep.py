"""
Deep coverage of the ``.idx`` sidecar indexing subsystem.

Behavioral model: /root/reference/test/test_indexing.py — offset-file layout,
indexed JSONL/tar readers, the Feistel-shuffled seekable range, and the
indexed lazy manifest leaf.
"""
import io
import json
import pickle
import tarfile

import numpy as np
import pytest

from lhotse_tpu.indexing import (
    IndexedJsonlReader,
    IndexedTarReader,
    LazyShuffledRange,
    create_jsonl_index,
    create_shar_index,
    create_tar_index,
    index_exists,
    index_file_path,
    read_index,
    supports_indexed_access,
)
from lhotse_tpu.lazy import LazyIndexedManifestIterator
from lhotse_tpu.testing.dummies import dummy_supervision


@pytest.fixture
def jsonl_path(tmp_path):
    path = tmp_path / "sups.jsonl"
    with path.open("w") as f:
        for i in range(10):
            print(json.dumps(dummy_supervision(i).to_dict()), file=f)
    return path


# ---------------------------------------------------------------------------
# Offset files
# ---------------------------------------------------------------------------
def test_jsonl_index_offsets_match_line_starts(jsonl_path):
    idx_path = create_jsonl_index(jsonl_path)
    offsets = read_index(idx_path)
    raw = jsonl_path.read_bytes()
    starts = [0]
    for k, b in enumerate(raw):
        if b == ord("\n") and k + 1 < len(raw):
            starts.append(k + 1)
    assert offsets[:-1].tolist() == starts
    # Sentinel entry = total file size, so entry i's span is [off[i], off[i+1]).
    assert offsets[-1] == len(raw)
    assert offsets.dtype == np.uint64


def test_index_file_path_conventions(tmp_path):
    assert index_file_path("/data/x.jsonl") == (
        index_file_path("/data/x.jsonl", indexes_root=None)
    )
    assert str(index_file_path("/data/x.jsonl")).endswith("x.jsonl.idx")
    mirrored = index_file_path("s3://bucket/dir/x.jsonl", indexes_root=tmp_path)
    assert mirrored == tmp_path / "bucket" / "dir" / "x.jsonl.idx"


def test_index_exists_validates_alignment(tmp_path, jsonl_path):
    assert not index_exists(jsonl_path)
    idx = create_jsonl_index(jsonl_path)
    assert index_exists(jsonl_path)
    # Empty and non-8-byte-aligned files are unusable indexes.
    empty = tmp_path / "empty.idx"
    empty.write_bytes(b"")
    assert not index_exists(jsonl_path, index_path=empty)
    torn = tmp_path / "torn.idx"
    torn.write_bytes(idx.read_bytes()[:-3])
    assert not index_exists(jsonl_path, index_path=torn)


def test_compressed_inputs_are_rejected(tmp_path):
    gz = tmp_path / "x.jsonl.gz"
    gz.write_bytes(b"\x1f\x8b")
    with pytest.raises(RuntimeError, match="compressed"):
        create_jsonl_index(gz)
    tgz = tmp_path / "x.tar.gz"
    tgz.write_bytes(b"\x1f\x8b")
    with pytest.raises(RuntimeError, match="compressed"):
        create_tar_index(tgz)


def test_supports_indexed_access(jsonl_path, tmp_path):
    # A path-KIND check (uncompressed .jsonl/.tar, not a pipe) — the .idx
    # existence question is index_exists().
    assert supports_indexed_access(jsonl_path) is True
    assert supports_indexed_access(jsonl_path, kind="jsonl") is True
    assert supports_indexed_access(jsonl_path, kind="tar") is False
    assert supports_indexed_access(tmp_path / "x.jsonl.gz") is False
    assert supports_indexed_access(tmp_path / "x.txt") is False
    assert supports_indexed_access("pipe:cat x.jsonl") is False


# ---------------------------------------------------------------------------
# IndexedJsonlReader
# ---------------------------------------------------------------------------
def test_indexed_jsonl_reader_random_access(jsonl_path):
    create_jsonl_index(jsonl_path)
    reader = IndexedJsonlReader(jsonl_path)
    lines = [json.loads(l) for l in jsonl_path.read_text().splitlines()]
    assert len(reader) == len(lines)
    for i in (0, 3, 9, 5, 0):  # out-of-order access
        assert reader[i] == lines[i]
    assert list(reader) == lines


def test_indexed_jsonl_reader_survives_pickling(jsonl_path):
    create_jsonl_index(jsonl_path)
    reader = IndexedJsonlReader(jsonl_path)
    _ = reader[2]  # force the file handle open before pickling
    clone = pickle.loads(pickle.dumps(reader))
    assert clone[7] == reader[7]
    assert len(clone) == len(reader)


def test_indexed_jsonl_reader_reopens_after_close(jsonl_path):
    create_jsonl_index(jsonl_path)
    reader = IndexedJsonlReader(jsonl_path)
    before = reader[4]
    reader.close()
    assert reader[4] == before


# ---------------------------------------------------------------------------
# IndexedTarReader (Shar pair convention)
# ---------------------------------------------------------------------------
@pytest.fixture
def shar_tar(tmp_path):
    """A tar with alternating (data, meta) members, Shar-style."""
    path = tmp_path / "recording.000000.tar"
    with tarfile.open(path, "w") as tf:
        for i in range(6):
            payload = bytes([i]) * (100 + 37 * i)
            for name in (f"cut-{i}.wav", f"cut-{i}.json"):
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    return path


def test_tar_index_pairs(shar_tar):
    idx_path = create_tar_index(shar_tar)
    offsets = read_index(idx_path)
    assert len(offsets) == 6 + 1  # one entry per pair + sentinel
    with tarfile.open(shar_tar) as tf:
        members = tf.getmembers()
    assert offsets[:-1].tolist() == [m.offset for m in members[::2]]


def test_tar_index_rejects_odd_member_count(tmp_path):
    path = tmp_path / "odd.tar"
    with tarfile.open(path, "w") as tf:
        info = tarfile.TarInfo("only.wav")
        info.size = 3
        tf.addfile(info, io.BytesIO(b"abc"))
    with pytest.raises(RuntimeError, match="even number"):
        create_tar_index(path)


def test_indexed_tar_reader_member_ranges(shar_tar):
    create_tar_index(shar_tar)
    reader = IndexedTarReader(shar_tar)
    assert len(reader) == 6
    raw = shar_tar.read_bytes()
    for i in range(6):
        start, end = reader.member_byte_range(i)
        assert 0 <= start < end <= len(raw)
    # Ranges of consecutive pairs must tile without overlap.
    ranges = [reader.member_byte_range(i) for i in range(6)]
    for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
        assert e0 <= s1


# ---------------------------------------------------------------------------
# LazyShuffledRange
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("n", [0, 1, 2, 7, 64, 1000])
def test_shuffled_range_is_a_permutation(n):
    r = LazyShuffledRange(n, seed=17)
    assert sorted(r) == list(range(n))
    # getitem agrees with iteration order
    assert [r[i] for i in range(n)] == list(LazyShuffledRange(n, seed=17))


@pytest.mark.parametrize("n,shards", [(10, 2), (11, 3), (7, 8), (100, 4)])
def test_shuffled_range_shards_partition(n, shards):
    pieces = [
        list(LazyShuffledRange(n, seed=5, shard_id=s, num_shards=shards))
        for s in range(shards)
    ]
    flat = [x for p in pieces for x in p]
    assert sorted(flat) == list(range(n))
    sizes = sorted(len(p) for p in pieces)
    assert sizes[-1] - sizes[0] <= 1  # balanced split


def test_shuffled_range_seeds_differ():
    a = list(LazyShuffledRange(50, seed=1))
    b = list(LazyShuffledRange(50, seed=2))
    assert a != b
    assert a == list(LazyShuffledRange(50, seed=1))  # deterministic


def test_shuffled_range_resume_mid_iteration():
    r = LazyShuffledRange(30, seed=9)
    it = iter(r)
    head = [next(it) for _ in range(11)]
    state = r.state_dict()
    rest_direct = list(it)

    fresh = LazyShuffledRange(30, seed=9)
    fresh.load_state_dict(state)
    assert list(fresh) == rest_direct
    assert head + rest_direct == [r[i] for i in range(30)]


def test_shuffled_range_is_one_shot_until_reset():
    # __iter__ returns self WITHOUT rewinding (checkpoint-friendly one-shot
    # semantics): after exhaustion a new for-loop yields nothing; reset()
    # rewinds to the start of the same permutation.
    r = LazyShuffledRange(12, seed=3)
    first = list(r)
    assert len(first) == 12
    assert list(r) == []
    r.reset()
    assert list(r) == first


# ---------------------------------------------------------------------------
# create_shar_index
# ---------------------------------------------------------------------------
def test_create_shar_index_walks_directory(tmp_path, shar_tar):
    shar_dir = tmp_path / "shar"
    shar_dir.mkdir()
    jsonl = shar_dir / "cuts.000000.jsonl"
    with jsonl.open("w") as f:
        for i in range(3):
            print(json.dumps({"id": f"c{i}"}), file=f)
    (shar_dir / "cuts.000001.jsonl.gz").write_bytes(b"\x1f\x8b")  # skipped
    tar_copy = shar_dir / shar_tar.name
    tar_copy.write_bytes(shar_tar.read_bytes())

    create_shar_index(shar_dir)
    assert (shar_dir / "cuts.000000.jsonl.idx").is_file()
    assert (shar_dir / (shar_tar.name + ".idx")).is_file()
    assert not (shar_dir / "cuts.000001.jsonl.gz.idx").exists()

    # output_dir redirects the sidecars.
    out = tmp_path / "indexes"
    out.mkdir()
    create_shar_index(shar_dir, output_dir=out)
    assert (out / "cuts.000000.jsonl.idx").is_file()


# ---------------------------------------------------------------------------
# LazyIndexedManifestIterator
# ---------------------------------------------------------------------------
def test_indexed_manifest_iterator_matches_plain_read(jsonl_path):
    create_jsonl_index(jsonl_path)
    it = LazyIndexedManifestIterator(jsonl_path)
    got = list(it)
    assert [s.id for s in got] == [dummy_supervision(i).id for i in range(10)]
    assert it[3].id == dummy_supervision(3).id
    assert len(it) == 10


def test_indexed_manifest_iterator_shuffle_covers_everything(jsonl_path):
    create_jsonl_index(jsonl_path)
    it = LazyIndexedManifestIterator(jsonl_path, shuffle=True, seed=4)
    ids = [s.id for s in it]
    assert sorted(ids) == sorted(dummy_supervision(i).id for i in range(10))
    assert ids != [dummy_supervision(i).id for i in range(10)]  # actually shuffled
    assert [s.id for s in it] == ids  # deterministic per seed


def test_indexed_manifest_iterator_resume_mid_stream(jsonl_path):
    create_jsonl_index(jsonl_path)
    it = LazyIndexedManifestIterator(jsonl_path, shuffle=True, seed=11)
    stream = iter(it)
    head = [next(stream).id for _ in range(4)]
    state = it.state_dict()
    rest = [s.id for s in stream]

    resumed = LazyIndexedManifestIterator(jsonl_path, shuffle=True, seed=11)
    resumed.load_state_dict(state)
    assert [s.id for s in resumed] == rest
    assert sorted(head + rest) == sorted(dummy_supervision(i).id for i in range(10))


def test_indexed_manifest_iterator_shuffled_restore_needs_range_state(jsonl_path):
    create_jsonl_index(jsonl_path)
    it = LazyIndexedManifestIterator(jsonl_path, shuffle=True, seed=0)
    with pytest.raises(ValueError, match="range"):
        it.load_state_dict({"position": 2})


def test_indexed_manifest_iterator_skip_decode_errors(tmp_path):
    path = tmp_path / "broken.jsonl"
    good = dummy_supervision(0).to_dict()
    with path.open("w") as f:
        print(json.dumps(good), file=f)
        print("{not valid json", file=f)
        print(json.dumps(dummy_supervision(2).to_dict()), file=f)
    create_jsonl_index(path)

    strict = LazyIndexedManifestIterator(path)
    with pytest.raises(Exception):
        list(strict)

    seen_errors = []
    lenient = LazyIndexedManifestIterator(
        path,
        skip_decode_errors=True,
        decode_error_callback=lambda ex, pos, p: seen_errors.append(pos),
    )
    ids = [s.id for s in lenient]
    assert ids == [dummy_supervision(0).id, dummy_supervision(2).id]
    assert seen_errors == [1]
