"""WebDataset-style tar export/import tests (self-contained, no webdataset lib)."""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank, LilcomChunkyWriter, Recording
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.dataset.webdataset import (LazyWebdatasetIterator, export_to_webdataset)

SR = 16000


@pytest.fixture(scope="module")
def cuts(tmp_path_factory):
    d = tmp_path_factory.mktemp("wds_src")
    rng = np.random.RandomState(0)
    out = []
    for i in range(6):
        p = d / f"r{i}.wav"
        write_wav(str(p), (rng.randn(SR) * 0.1).astype(np.float32), SR)
        out.append(Recording.from_file(p).to_cut())
    cuts = CutSet.from_cuts(out)
    with LilcomChunkyWriter(d / "feats") as st:
        return CutSet.from_cuts(c.compute_and_store_features(Fbank(), st) for c in cuts)


def test_export_import_roundtrip(cuts, tmp_path):
    n = export_to_webdataset(cuts, str(tmp_path / "all.tar"), audio_format="wav", verbose=False)
    assert n is None or n == 0 or n == 1  # unsharded
    back = list(CutSet.from_webdataset(str(tmp_path / "all.tar")))
    assert [c.id for c in back] == [c.id for c in cuts]
    np.testing.assert_allclose(back[0].load_audio(), cuts[0].load_audio(), atol=1.0 / 32768)
    assert np.abs(back[0].load_features() - cuts[0].load_features()).max() <= 2**-5


def test_sharded_export(cuts, tmp_path):
    n = export_to_webdataset(
        cuts, str(tmp_path / "shard-%06d.tar"), shard_size=2, audio_format="wav", verbose=False)
    assert n == 3
    shards = [str(tmp_path / f"shard-{i:06d}.tar") for i in range(3)]
    back = list(CutSet.from_webdataset(shards))
    assert sorted(c.id for c in back) == sorted(c.id for c in cuts)
    # shard_origin is attached.
    assert all(c.shard_origin.endswith(".tar") for c in back)


def test_shuffle_shards_epoch(cuts, tmp_path):
    export_to_webdataset(
        cuts, str(tmp_path / "shard-%06d.tar"), shard_size=1, audio_format="wav", verbose=False)
    shards = [str(tmp_path / f"shard-{i:06d}.tar") for i in range(6)]
    it = LazyWebdatasetIterator(shards, shuffle_shards=True, epoch=0)
    order0 = [c.id for c in it]
    it.set_epoch(1)
    order1 = [c.id for c in it]
    assert sorted(order0) == sorted(order1)
    assert order0 != order1


def test_webdataset_deduplicates_data_in_ddp(cuts, tmp_path, monkeypatch):
    """Sharded export + from_webdataset with node splitting: two simulated
    ranks must cover the corpus exactly once between them (reference:
    test/dataset/test_webdataset_ddp.py)."""
    from collections import Counter

    pattern = str(tmp_path / "wds" / "shard-%06d.tar")
    (tmp_path / "wds").mkdir()
    export_to_webdataset(cuts, pattern, shard_size=2, audio_format="wav", verbose=False)
    shards = sorted(str(p) for p in (tmp_path / "wds").glob("*.tar"))
    assert len(shards) == 3

    seen = Counter()
    for rank in range(2):
        monkeypatch.setenv("RANK", str(rank))
        monkeypatch.setenv("WORLD_SIZE", "2")
        part = CutSet.from_webdataset(
            shards, split_by_node=True, split_by_worker=False
        )
        for c in part:
            seen[c.id] += 1
            assert c.load_audio() is not None
    monkeypatch.delenv("RANK")
    monkeypatch.delenv("WORLD_SIZE")
    assert set(seen) == {c.id for c in cuts}
    assert all(v == 1 for v in seen.values())
