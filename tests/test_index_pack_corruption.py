"""
Index-pack corruption / CRC recovery paths (reference surface:
/root/reference/lhotse/index_pack.py:758 verify_segment and the header/
catalog validation around it).
"""
import pickle

import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.cut import MonoCut
from lhotse_tpu.index_pack import (
    IndexPack,
    IndexPackCollectionSpec,
    index_pack_collection_key,
    write_index_pack,
)
from lhotse_tpu.indexing import create_jsonl_index

KEY = index_pack_collection_key(role="records", kind="json-lines", source_spec="spec")


@pytest.fixture
def pack_path(tmp_path):
    paths = []
    for s in range(2):
        cuts = CutSet.from_cuts(
            MonoCut(id=f"c{s}-{i}", start=0.0, duration=1.0, channel=0, supervisions=[])
            for i in range(8)
        )
        p = tmp_path / f"cuts-{s}.jsonl"
        cuts.to_file(p)
        create_jsonl_index(p)
        paths.append(str(p))
    out = tmp_path / "data.idxpack"
    write_index_pack(
        out,
        [IndexPackCollectionSpec(role="records", kind="json-lines",
                                 source_spec="spec", paths=tuple(paths))],
    )
    return out


def _flip_byte(path, position):
    with open(path, "r+b") as f:
        f.seek(position)
        b = f.read(1)
        f.seek(position)
        f.write(bytes([b[0] ^ 0xFF]))


class TestIndexPackCorruption:
    def test_fresh_pack_verifies(self, pack_path):
        with IndexPack(pack_path) as pack:
            for seg in range(pack.num_segments):
                pack.verify_segment(seg)

    def test_flipped_offsets_byte_fails_crc(self, pack_path):
        with IndexPack(pack_path) as pack:
            seg = pack._segment(0)
            pos = seg.offsets_pos + seg.offsets_size // 2
        _flip_byte(pack_path, pos)
        with IndexPack(pack_path) as pack:
            with pytest.raises(ValueError, match="CRC mismatch"):
                pack.verify_segment(0)
            # The other segment's payload is untouched and still verifies.
            pack.verify_segment(1)

    def test_corrupt_header_magic_rejected(self, pack_path):
        _flip_byte(pack_path, 0)
        with pytest.raises(Exception):
            with IndexPack(pack_path) as pack:
                pack.collection(KEY).locate(0)

    def test_truncated_pack_rejected(self, pack_path):
        size = pack_path.stat().st_size
        with open(pack_path, "r+b") as f:
            f.truncate(size // 2)
        with pytest.raises(Exception):
            with IndexPack(pack_path) as pack:
                col = pack.collection(KEY)
                for i in range(len(col)):
                    col.locate(i)
                for seg in range(pack.num_segments):
                    pack.verify_segment(seg)

    def test_file_replaced_after_open_detected(self, pack_path):
        pack = IndexPack(pack_path)
        col = pack.collection(KEY)
        col.locate(3)  # establishes the mmap + file identity
        state = pickle.dumps(pack)
        pack.close()
        with open(pack_path, "ab") as f:
            f.write(b"garbage appended after the pack was built")
        revived = pickle.loads(state)
        with pytest.raises(RuntimeError, match="changed after it was opened"):
            revived.collection(KEY).locate(3)

    def test_locate_out_of_range(self, pack_path):
        with IndexPack(pack_path) as pack:
            col = pack.collection(KEY)
            with pytest.raises(IndexError):
                col.locate(len(col))
            with pytest.raises(IndexError):
                col.locate_in_shard(99, 0)
