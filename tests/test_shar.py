"""Shar format tests: export, streaming + indexed + lazy-pointer reads,
placeholders, checkpointing, sampler integration."""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank, LilcomChunkyWriter, Recording
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.shar import (
    LazyIndexedSharIterator, LazySharIterator, decode_pointer, encode_pointer, is_shar_pointer)
from lhotse_tpu.supervision import SupervisionSegment

SR = 16000


@pytest.fixture(scope="module")
def cuts(tmp_path_factory):
    d = tmp_path_factory.mktemp("shar_src")
    rng = np.random.RandomState(3)
    out = []
    for i in range(7):
        n = SR + i * 2000
        p = d / f"r{i}.wav"
        write_wav(str(p), (rng.randn(n) * 0.1).astype(np.float32), SR)
        c = Recording.from_file(p).to_cut()
        c.supervisions = [
            SupervisionSegment(
                id=f"s{i}", recording_id=c.recording_id, start=0,
                duration=c.duration, text=f"t{i}",
            )
        ]
        out.append(c)
    cuts = CutSet.from_cuts(out)
    with LilcomChunkyWriter(d / "feats") as st:
        return CutSet.from_cuts(c.compute_and_store_features(Fbank(), st) for c in cuts)


@pytest.fixture(scope="module")
def shar_dir(cuts, tmp_path_factory):
    d = tmp_path_factory.mktemp("shar_out")
    cuts.to_shar(d, fields={"recording": "wav", "features": "lilcom"}, shard_size=3)
    return d


@pytest.fixture(scope="module")
def shar_idx_dir(cuts, tmp_path_factory):
    d = tmp_path_factory.mktemp("shar_idx")
    cuts.to_shar(
        d, fields={"recording": "wav", "features": "lilcom"}, shard_size=3, compress_jsonl=False,
        create_index=True)
    return d


class TestStreaming:
    def test_roundtrip(self, cuts, shar_dir):
        back = list(CutSet.from_shar(in_dir=shar_dir))
        assert len(back) == 7
        assert [c.id for c in back] == [c.id for c in cuts]
        np.testing.assert_allclose(back[0].load_audio(), cuts[0].load_audio(), atol=1e-4)
        assert np.abs(back[0].load_features() - cuts[0].load_features()).max() <= 2**-5

    def test_reader_selection(self, shar_dir):
        # Compressed cuts jsonl -> streaming reader.
        cs = CutSet.from_shar(in_dir=shar_dir)
        assert isinstance(cs.data, LazySharIterator)

    def test_shuffle_shards_deterministic(self, shar_dir):
        a = [c.id for c in CutSet.from_shar(in_dir=shar_dir, shuffle_shards=True, seed=1)]
        b = [c.id for c in CutSet.from_shar(in_dir=shar_dir, shuffle_shards=True, seed=1)]
        assert a == b
        assert sorted(a) == sorted(c.id for c in CutSet.from_shar(in_dir=shar_dir))

    def test_streaming_checkpoint_resume(self, shar_dir):
        reader = LazySharIterator(in_dir=shar_dir)
        all_ids = [c.id for c in reader]

        reader2 = LazySharIterator(in_dir=shar_dir)
        it = iter(reader2)
        first = [next(it).id for _ in range(4)]
        sd = reader2.state_dict()
        reader3 = LazySharIterator(in_dir=shar_dir)
        reader3.load_state_dict(sd)
        rest = [c.id for c in reader3]
        assert first + rest == all_ids

    def test_placeholder_nodata(self, cuts, tmp_path):
        # One cut without features: the features tar stores a placeholder.
        mixed = CutSet.from_cuts([cuts[0], cuts[1].drop_features(), cuts[2]])
        mixed.to_shar(tmp_path, fields={"recording": "wav", "features": "lilcom"})
        back = list(CutSet.from_shar(in_dir=tmp_path))
        assert back[0].has_features
        assert not back[1].has_features
        assert back[2].has_features
        assert back[1].load_audio().shape == cuts[1].load_audio().shape


class TestIndexed:
    def test_auto_selects_indexed(self, shar_idx_dir):
        cs = CutSet.from_shar(in_dir=shar_idx_dir)
        assert isinstance(cs.data, LazyIndexedSharIterator)
        assert cs.has_constant_time_access
        assert len(cs) == 7

    def test_random_access(self, cuts, shar_idx_dir):
        cs = CutSet.from_shar(in_dir=shar_idx_dir)
        for i in (0, 3, 6):
            c = cs[i]
            assert c.id == cuts[i].id
            np.testing.assert_allclose(c.load_audio(), cuts[i].load_audio(), atol=1e-4)

    def test_lazy_pointer_mode(self, cuts, shar_idx_dir):
        it = LazyIndexedSharIterator(in_dir=shar_idx_dir, lazy=True)
        c = it[5]
        src = c.recording.sources[0]
        assert src.type == "shar_ptr"
        assert is_shar_pointer(src.source)
        np.testing.assert_allclose(c.load_audio(), cuts[5].load_audio(), atol=1e-4)
        assert np.abs(c.load_features() - cuts[5].load_features()).max() <= 2**-5

    def test_sampler_o1_resume_over_shar(self, shar_idx_dir):
        import pickle

        from lhotse_tpu.dataset import DynamicCutSampler

        def make():
            s = DynamicCutSampler(
                CutSet.from_shar(in_dir=shar_idx_dir), max_cuts=2, shuffle=True, seed=0,
                world_size=1, rank=0)
            s.set_epoch(1)
            return s

        all_batches = [[c.id for c in b] for b in make()]
        s2 = make()
        it = iter(s2)
        first = [[c.id for c in next(it)]]
        sd = pickle.loads(pickle.dumps(s2.state_dict()))
        assert "cuts_state" in sd
        s3 = make()
        s3.allow_iter_to_reset_state()
        s3.load_state_dict(sd)
        rest = [[c.id for c in b] for b in s3]
        assert first + rest == all_batches


class TestLazyPointer:
    def test_encode_decode(self):
        p = encode_pointer("/x/y.tar", 100, 250)
        assert is_shar_pointer(p)
        assert decode_pointer(p) == ("/x/y.tar", 100, 250)
        assert not is_shar_pointer("/x/y.tar")
        with pytest.raises(ValueError):
            decode_pointer("not-a-pointer")
