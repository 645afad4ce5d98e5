"""
Serialization matrix: every manifest type x every format x compression,
through both the typed classmethods and the generic load/store entry points,
plus the incremental writers.

Behavioral model: /root/reference/test/test_serialization.py.
"""
import pytest

from lhotse_tpu import CutSet, FeatureSet, RecordingSet, SupervisionSet
from lhotse_tpu.serialization import (
    InMemoryWriter,
    SequentialJsonlWriter,
    load_manifest,
    load_manifest_lazy,
    store_manifest,
)
from lhotse_tpu.testing.dummies import DummyManifest

TYPES = [RecordingSet, SupervisionSet, FeatureSet, CutSet]
FORMATS = [
    ("json", False),
    ("json", True),
    ("jsonl", False),
    ("jsonl", True),
    ("yaml", False),
    ("yaml", True),
]


def _make(cls):
    return DummyManifest(cls, begin_id=0, end_id=5)


def _path(tmp_path, fmt, compressed):
    return tmp_path / ("m." + fmt + (".gz" if compressed else ""))


@pytest.mark.parametrize("cls", TYPES)
@pytest.mark.parametrize("fmt,compressed", FORMATS)
def test_typed_roundtrip(tmp_path, cls, fmt, compressed):
    manifest = _make(cls)
    path = _path(tmp_path, fmt, compressed)
    manifest.to_file(path)
    restored = cls.from_file(path)
    assert list(restored) == list(manifest)
    assert len(restored) == 5


@pytest.mark.parametrize("cls", TYPES)
@pytest.mark.parametrize("fmt,compressed", FORMATS)
def test_generic_roundtrip(tmp_path, cls, fmt, compressed):
    manifest = _make(cls)
    path = _path(tmp_path, fmt, compressed)
    store_manifest(manifest, path)
    restored = load_manifest(path)
    assert isinstance(restored, cls)
    assert list(restored) == list(manifest)


@pytest.mark.parametrize("cls", TYPES)
def test_generic_load_with_expected_type_mismatch_raises(tmp_path, cls):
    manifest = _make(cls)
    path = tmp_path / "m.jsonl"
    store_manifest(manifest, path)
    wrong = RecordingSet if cls is not RecordingSet else SupervisionSet
    with pytest.raises(Exception):
        load_manifest(path, manifest_cls=wrong)


@pytest.mark.parametrize("cls", TYPES)
@pytest.mark.parametrize("compressed", [False, True])
def test_jsonl_loads_lazily_json_loads_eagerly(tmp_path, cls, compressed):
    manifest = _make(cls)
    jsonl = _path(tmp_path, "jsonl", compressed)
    manifest.to_file(jsonl)
    lazy = cls.from_file(jsonl)
    assert lazy.is_lazy
    assert list(lazy) == list(manifest)

    js = _path(tmp_path, "json", compressed)
    manifest.to_file(js)
    eager = cls.from_file(js)
    assert not eager.is_lazy


@pytest.mark.parametrize("cls", TYPES)
def test_load_manifest_lazy_empty_returns_none(tmp_path, cls):
    path = tmp_path / "empty.jsonl"
    path.write_text("")
    assert load_manifest_lazy(path) is None


def test_unknown_extension_raises(tmp_path):
    manifest = _make(RecordingSet)
    with pytest.raises(Exception):
        store_manifest(manifest, tmp_path / "m.parquet")


# ---------------------------------------------------------------------------
# Incremental writers
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("cls", TYPES)
@pytest.mark.parametrize("compressed", [False, True])
def test_sequential_jsonl_writer(tmp_path, cls, compressed):
    manifest = _make(cls)
    path = _path(tmp_path, "jsonl", compressed)
    with cls.open_writer(path) as writer:
        for item in manifest:
            writer.write(item)
    restored = cls.from_file(path)
    assert list(restored) == list(manifest)


def test_sequential_jsonl_writer_with_dict_input(tmp_path):
    manifest = _make(SupervisionSet)
    path = tmp_path / "m.jsonl"
    with SequentialJsonlWriter(path) as writer:
        for item in manifest:
            writer.write(item.to_dict())
    assert list(SupervisionSet.from_file(path)) == list(manifest)


def test_sequential_jsonl_writer_append_skips_preexisting_ids(tmp_path):
    # Reference semantics (serialization.py:193-253): only ids scanned from a
    # PRE-EXISTING file (overwrite=False) are skipped on write; duplicates
    # within one session are the caller's responsibility.
    manifest = _make(RecordingSet)
    items = list(manifest)
    path = tmp_path / "m.jsonl"
    with RecordingSet.open_writer(path) as writer:
        for item in items[:3]:
            writer.write(item)
    with RecordingSet.open_writer(path, overwrite=False) as writer:
        for item in items:  # first 3 silently skipped
            writer.write(item)
    assert [r.id for r in RecordingSet.from_file(path)] == [r.id for r in items]


@pytest.mark.parametrize("overwrite", [True, False])
def test_sequential_jsonl_writer_overwrite_mode(tmp_path, overwrite):
    manifest = _make(RecordingSet)
    items = list(manifest)
    path = tmp_path / "m.jsonl"
    with RecordingSet.open_writer(path) as writer:
        writer.write(items[0])
    with RecordingSet.open_writer(path, overwrite=overwrite) as writer:
        writer.write(items[1])
    restored = list(RecordingSet.from_file(path))
    if overwrite:
        assert [r.id for r in restored] == [items[1].id]
    else:
        assert [r.id for r in restored] == [items[0].id, items[1].id]


def test_sequential_writer_contains_resume_pattern(tmp_path):
    # The resumable-job idiom: `if id in writer: continue`.
    manifest = _make(SupervisionSet)
    items = list(manifest)
    path = tmp_path / "m.jsonl"
    with SupervisionSet.open_writer(path) as writer:
        for item in items[:3]:
            writer.write(item)
    with SupervisionSet.open_writer(path, overwrite=False) as writer:
        written = [item.id for item in items if item.id not in writer]
        for item in items:
            if item.id in writer:
                continue
            writer.write(item)
    assert written == [i.id for i in items[3:]]
    assert [s.id for s in SupervisionSet.from_file(path)] == [i.id for i in items]


@pytest.mark.parametrize("cls", TYPES)
def test_in_memory_writer(cls):
    manifest = _make(cls)
    with InMemoryWriter() as writer:
        for item in manifest:
            writer.write(item)
        result = writer.open_manifest()
    assert isinstance(result, cls)
    assert list(result) == list(manifest)


def test_open_writer_in_memory_via_special_path():
    manifest = _make(CutSet)
    with CutSet.open_writer(None) as writer:
        for c in manifest:
            writer.write(c)
        result = writer.open_manifest()
    assert list(result) == list(manifest)
