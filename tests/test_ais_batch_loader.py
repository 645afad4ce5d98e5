"""AISBatchLoader: request collection, dedup, and in-memory injection."""
import numpy as np
import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.ais import (
    AISBatchLoader, AISBatchLoaderError, FetchRequest, LocalBatchFetcher, collect_batch_requests)
from lhotse_tpu.testing.dummies import dummy_cut


@pytest.fixture
def shar_cuts(tmp_path):
    """Cuts read back from an indexed Shar in lazy (shar_ptr) mode."""
    base = []
    for i in range(4):
        c = dummy_cut(i, with_data=True, duration=1.0)
        # Keep only shar-exported custom fields: the others hold raw memory
        # bytes, which (like the reference) cannot be written to plain JSONL.
        c.custom = {"custom_features": c.custom["custom_features"]}
        base.append(c)
    cuts = CutSet.from_cuts(base)
    out = tmp_path / "shar"
    cuts.to_shar(
        out, fields={"recording": "wav", "features": "lilcom", "custom_features": "lilcom"},
        shard_size=2, compress_jsonl=False, create_index=True)
    lazy = CutSet.from_shar(in_dir=out, indexed=True, lazy=True)
    return cuts, list(lazy)


def test_collect_requests_finds_shar_pointers(shar_cuts):
    _, lazy_cuts = shar_cuts
    triples = collect_batch_requests(lazy_cuts)
    # one recording + features + one custom feature array per cut
    assert len(triples) == 12
    assert all(isinstance(t[2], FetchRequest) for t in triples)
    assert all(t[2].end is not None for t in triples)


def test_batch_loader_injects_memory_payloads(shar_cuts):
    eager_cuts, lazy_cuts = shar_cuts
    loader = AISBatchLoader(fetcher=LocalBatchFetcher())
    batch = loader(lazy_cuts)
    assert len(batch) == len(lazy_cuts)
    for orig, loaded in zip(eager_cuts, batch):
        assert loaded.recording.sources[0].type == "memory"
        np.testing.assert_array_equal(orig.load_audio(), loaded.load_audio())
        assert loaded.features.storage_type.startswith("memory")
        np.testing.assert_allclose(orig.load_features(), loaded.load_features(), atol=2**-6)
        inner = loaded.custom["custom_features"].array
        assert inner.storage_type.startswith("memory")
        np.testing.assert_allclose(
            orig.load_custom_features(), loaded.load_custom_features(), atol=2**-6)


def test_batch_loader_noop_on_local_cuts():
    cuts = [dummy_cut(i, with_data=True) for i in range(2)]
    out = AISBatchLoader(fetcher=LocalBatchFetcher())(cuts)
    assert len(out) == 2
    assert collect_batch_requests(cuts) == []


def test_batch_loader_dedups_identical_ranges(shar_cuts):
    _, lazy_cuts = shar_cuts

    class CountingFetcher(LocalBatchFetcher):
        def __init__(self):
            self.calls = []

        def fetch(self, requests):
            self.calls.append(len(requests))
            return super().fetch(requests)

    fetcher = CountingFetcher()
    # Duplicate the same cut: its ranges must be fetched once.
    AISBatchLoader(fetcher=fetcher)([lazy_cuts[0], lazy_cuts[0]])
    assert fetcher.calls == [3]  # recording+features+array, deduped across copies


def test_batch_loader_error_on_bad_fetch(shar_cuts):
    _, lazy_cuts = shar_cuts

    class BrokenFetcher:
        def fetch(self, requests):
            raise IOError("boom")

    with pytest.raises(AISBatchLoaderError):
        AISBatchLoader(fetcher=BrokenFetcher())(lazy_cuts)


def test_skip_failed_fetches_drops_only_affected_cuts(shar_cuts):
    _, lazy_cuts = shar_cuts

    class FlakyFetcher(LocalBatchFetcher):
        """Fails every request that targets the first cut's shard offsets."""

        def __init__(self, bad_urls):
            self.bad_urls = bad_urls

        def fetch(self, requests):
            if any(r.url in self.bad_urls for r in requests):
                raise IOError("flaky object store")
            return super().fetch(requests)

    # Poison every object the first cut points at.
    bad = {t[2].url for t in collect_batch_requests([lazy_cuts[0]])}
    # Cut 1 shares the first shard's tar files with cut 0, so it is dropped
    # too; cuts 2-3 live in the second shard and must survive.
    loader = AISBatchLoader(fetcher=FlakyFetcher(bad), skip_failed_fetches=True)
    batch = loader(lazy_cuts)
    survived = {c.id for c in batch}
    assert lazy_cuts[0].id not in survived
    assert {lazy_cuts[2].id, lazy_cuts[3].id} <= survived
    for c in batch:
        c.load_audio()  # survivors are fully injected

    # Without the flag the same failure raises.
    with pytest.raises(AISBatchLoaderError):
        AISBatchLoader(fetcher=FlakyFetcher(bad))(lazy_cuts)


def test_audio_samples_with_batch_loader(shar_cuts):
    from lhotse_tpu.dataset.input_strategies import AudioSamples

    eager_cuts, lazy_cuts = shar_cuts
    strategy = AudioSamples(use_batch_loader=True)
    # No aistore in env -> the loader resolves to LocalBatchFetcher, which
    # serves the shar byte ranges from disk.
    strategy.ais_batch_loader.fetcher = LocalBatchFetcher()
    audio, audio_lens = strategy(CutSet.from_cuts(lazy_cuts))
    assert audio.shape[0] == len(lazy_cuts)
    np.testing.assert_array_equal(
        np.asarray(audio)[0, : int(audio_lens[0])],
        eager_cuts[0].load_audio()[0])


def test_local_fetcher_ranges(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(bytes(range(100)))
    f = LocalBatchFetcher()
    whole, mid, tail = f.fetch(
        [
            FetchRequest(url=str(p)),
            FetchRequest(url=str(p), start=10, end=20),
            FetchRequest(url=f"file://{p}", start=90, end=None),
        ]
    )
    assert whole == bytes(range(100))
    assert mid == bytes(range(10, 20))
    assert tail == bytes(range(90, 100))
