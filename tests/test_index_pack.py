"""Index pack (.idxpack) + packed lazy iterator tests."""
import pickle

import numpy as np
import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.cut import MonoCut
from lhotse_tpu.index_pack import (
    IndexPack, IndexPackCollectionSpec, index_pack_collection_key, open_index_pack,
    write_index_pack)
from lhotse_tpu.indexing import create_jsonl_index
from lhotse_tpu.packed_lazy import LazyPackedManifestIterator


def make_shards(tmp_path, num_shards=3, cuts_per_shard=10):
    paths = []
    idx = 0
    for s in range(num_shards):
        cuts = CutSet.from_cuts(
            MonoCut(
                id=f"cut-{idx + i:04d}", start=0.0, duration=1.0 + 0.1 * i,
                channel=0, supervisions=[],
            )
            for i in range(cuts_per_shard)
        )
        idx += cuts_per_shard
        p = tmp_path / f"cuts-{s:03d}.jsonl"
        cuts.to_file(p)
        create_jsonl_index(p)
        paths.append(str(p))
    return paths


@pytest.fixture
def pack_path(tmp_path):
    paths = make_shards(tmp_path)
    spec = IndexPackCollectionSpec(
        role="records", kind="json-lines", source_spec="cuts-{000..002}.jsonl", paths=tuple(paths))
    out = tmp_path / "dataset.idxpack"
    write_index_pack(out, [spec])
    return out


KEY = index_pack_collection_key(
    role="records", kind="json-lines", source_spec="cuts-{000..002}.jsonl")


class TestIndexPack:
    def test_catalog_and_locate(self, pack_path):
        with IndexPack(pack_path) as pack:
            col = pack.collection(KEY)
            assert len(col) == 30
            assert col.sequence_count == 3
            assert col.shard_length(0) == 10
            loc = col.locate(17)
            assert loc.shard_index == 1
            assert loc.local_index == 7
            assert loc.path.endswith("cuts-001.jsonl")
            # The byte range decodes to the right record.
            with open(loc.path, "rb") as f:
                f.seek(loc.start)
                line = f.read(loc.end - loc.start)
            import json

            assert json.loads(line)["id"] == "cut-0017"

    def test_crc_verification(self, pack_path):
        with IndexPack(pack_path) as pack:
            for seg in range(pack.num_segments):
                pack.verify_segment(seg)

    def test_unknown_collection(self, pack_path):
        with IndexPack(pack_path) as pack:
            with pytest.raises(KeyError):
                pack.collection(b"\0" * 32)

    def test_pickle_roundtrip(self, pack_path):
        pack = IndexPack(pack_path)
        pack2 = pickle.loads(pickle.dumps(pack))
        assert len(pack2.collection(KEY)) == 30
        assert pack2.collection(KEY).locate(5).local_index == 5

    def test_overwrite_protection(self, pack_path, tmp_path):
        (tmp_path / "other").mkdir()
        paths = make_shards(tmp_path / "other", 1, 2)
        spec = IndexPackCollectionSpec(
            role="records", kind="json-lines", source_spec="x", paths=tuple(paths))
        with pytest.raises(FileExistsError):
            write_index_pack(pack_path, [spec])
        write_index_pack(pack_path, [spec], overwrite=True)

    def test_corrupt_sidecar_rejected(self, tmp_path):
        paths = make_shards(tmp_path, 1, 3)
        # Corrupt the index: non-monotonic offsets.
        import struct

        idx = tmp_path / "cuts-000.jsonl.idx"
        data = bytearray(idx.read_bytes())
        data[0:16] = struct.pack("<QQ", 100, 50)
        idx.write_bytes(bytes(data))
        # Make the sidecar newer than the source to pass the mtime check.
        spec = IndexPackCollectionSpec(
            role="records", kind="json-lines", source_spec="y", paths=tuple(paths))
        with pytest.raises(ValueError, match="Non-monotonic"):
            write_index_pack(tmp_path / "bad.idxpack", [spec])


class TestLazyPackedManifestIterator:
    def test_sequential_iteration(self, pack_path):
        it = LazyPackedManifestIterator(pack_path, KEY)
        assert it.has_constant_time_access
        items = list(it)
        assert len(items) == 30
        assert [c.id for c in items] == [f"cut-{i:04d}" for i in range(30)]

    def test_random_access_tokens(self, pack_path):
        it = LazyPackedManifestIterator(pack_path, KEY)
        assert it[17].id == "cut-0017"
        assert it[(1, 7)].id == "cut-0017"
        assert it[-1].id == "cut-0029"

    def test_shuffled_deterministic_and_complete(self, pack_path):
        a = [c.id for c in LazyPackedManifestIterator(pack_path, KEY, shuffle_shards=True, seed=3)]
        b = [c.id for c in LazyPackedManifestIterator(pack_path, KEY, shuffle_shards=True, seed=3)]
        assert a == b
        assert sorted(a) == [f"cut-{i:04d}" for i in range(30)]
        c = [x.id for x in LazyPackedManifestIterator(pack_path, KEY, shuffle_shards=True, seed=4)]
        assert c != a

    def test_checkpoint_resume_sequential(self, pack_path):
        it = LazyPackedManifestIterator(pack_path, KEY)
        gen = iter(it)
        first = [next(gen).id for _ in range(13)]
        sd = it.state_dict()
        it2 = LazyPackedManifestIterator(pack_path, KEY)
        it2.load_state_dict(sd)
        rest = [c.id for c in it2]
        assert first + rest == [f"cut-{i:04d}" for i in range(30)]

    def test_checkpoint_resume_shuffled(self, pack_path):
        it = LazyPackedManifestIterator(pack_path, KEY, shuffle_shards=True, seed=7)
        all_ids = [c.id for c in it]
        it2 = LazyPackedManifestIterator(pack_path, KEY, shuffle_shards=True, seed=7)
        gen = iter(it2)
        first = [next(gen).id for _ in range(11)]
        sd = it2.state_dict()
        it3 = LazyPackedManifestIterator(pack_path, KEY, shuffle_shards=True, seed=7)
        it3.load_state_dict(sd)
        rest = [c.id for c in it3]
        assert first + rest == all_ids

    def test_cutset_over_pack_with_sampler(self, pack_path):
        from lhotse_tpu.dataset import DynamicCutSampler

        cuts = CutSet(LazyPackedManifestIterator(pack_path, KEY))
        assert cuts.has_constant_time_access
        sampler = DynamicCutSampler(cuts, max_cuts=4, world_size=1, rank=0)
        batches = list(sampler)
        assert sum(len(b) for b in batches) == 30


def test_verify_all_segments_and_cli(tmp_path):
    paths = make_shards(tmp_path)
    spec = IndexPackCollectionSpec(
        role="records", kind="json-lines",
        source_spec="cuts-{000..002}.jsonl", paths=tuple(paths))
    out = tmp_path / "v.idxpack"
    write_index_pack(out, [spec])

    assert IndexPack(out).verify() == 3

    from click.testing import CliRunner

    from lhotse_tpu.bin.lhotse_tpu import cli

    res = CliRunner().invoke(cli, ["index", "verify-pack", str(out)])
    assert res.exit_code == 0 and "OK (3 segments)" in res.output

    # Flip one byte inside an offsets payload: CRC must catch it.
    raw = bytearray(out.read_bytes())
    raw[-5] ^= 0xFF
    out.write_bytes(bytes(raw))
    res = CliRunner().invoke(cli, ["index", "verify-pack", str(out)])
    assert "Verification failed" in res.output
