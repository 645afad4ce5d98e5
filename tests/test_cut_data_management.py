"""
Cut data management: in-memory detachment (move_to_memory), data relocation
(copy_data, with_path_prefix), attribute dropping, and supervision masks
(reference tests: test/cut/test_cut_with_in_memory_data.py, test_copy_data.py,
test_cut_drop_attributes.py, test_masks.py).
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank
from lhotse_tpu.testing.dummies import DummyManifest, dummy_cut


@pytest.fixture
def cut_with_feats(tmp_path):
    from lhotse_tpu.features.io import LilcomChunkyWriter

    cut = dummy_cut(0, with_data=True)
    cut.custom = {}
    feats = Fbank().extract(cut.load_audio()[0], 16000)
    with LilcomChunkyWriter(str(tmp_path / "feats")) as w:
        cut.features = None
        cut = cut.compute_and_store_features(Fbank(), w) if False else cut
        # attach features manually to keep this fixture cheap and exact
        from lhotse_tpu.features.base import Features

        key = w.write(cut.id, feats)
        w.flush()
        cut.features = Features(
            type="kaldi-fbank", num_frames=feats.shape[0], num_features=feats.shape[1],
            frame_shift=0.01, sampling_rate=16000, start=0.0, duration=cut.duration,
            storage_type=w.name, storage_path=w.storage_path, storage_key=key,
            channels=0)
    return cut


def test_move_to_memory_cut_detaches_all_data(cut_with_feats):
    cut = cut_with_feats
    mem = cut.move_to_memory()
    audio0, feats0 = cut.load_audio(), cut.load_features()
    np.testing.assert_array_equal(mem.load_audio(), audio0)
    assert np.abs(mem.load_features() - feats0).max() <= 2.0**-5 + 1e-6
    # The in-memory cut must not reference the original storage paths.
    d = mem.to_dict()
    assert "feats" not in str(d.get("features", {}).get("storage_path", ""))


def test_move_to_memory_audio_only(cut_with_feats):
    mem = cut_with_feats.move_to_memory(audio_format="wav")
    np.testing.assert_allclose(
        mem.load_audio(), cut_with_feats.load_audio(), atol=2.0**-15)


def test_drop_attributes_family(cut_with_feats):
    cut = cut_with_feats
    assert cut.drop_features().has_features is False
    assert cut.drop_recording().has_recording is False
    no_sup = cut.drop_supervisions()
    assert no_sup.supervisions == []
    # drop_alignments keeps supervisions but clears their alignment field.
    dropped = cut.drop_alignments()
    assert all(s.alignment is None for s in dropped.supervisions)
    assert len(dropped.supervisions) == len(cut.supervisions)


def test_cutset_copy_data_relocates_and_stays_loadable(tmp_path, cut_with_feats):
    cuts = CutSet.from_cuts([cut_with_feats])
    out = cuts.copy_data(tmp_path / "relocated", verbose=False)
    c = next(iter(out))
    assert str(tmp_path / "relocated") in str(c.features.storage_path)
    np.testing.assert_allclose(
        c.load_features(), cut_with_feats.load_features(), atol=2.0**-5)
    np.testing.assert_allclose(
        c.load_audio(), cut_with_feats.load_audio(), atol=2.0**-15)


def test_supervision_masks_mark_active_regions(cut_with_feats):
    from lhotse_tpu.testing.dummies import dummy_supervision

    cut = cut_with_feats
    cut.supervisions = [dummy_supervision(0, start=0.2, duration=0.5)]
    audio_mask = cut.supervisions_audio_mask()
    feat_mask = cut.supervisions_feature_mask()
    assert audio_mask.shape[-1] == cut.num_samples
    assert feat_mask.shape[-1] == cut.num_frames
    sup = cut.supervisions[0]
    s_smp, e_smp = int(sup.start * 16000), int(sup.end * 16000)
    assert audio_mask[..., s_smp:e_smp].all()
    if e_smp < cut.num_samples:
        assert not audio_mask[..., e_smp + 160 :].any()
    assert feat_mask[..., int(sup.start * 100) : int(sup.end * 100) - 1].all()


def test_cutset_decompose_recovers_manifests(tmp_path):
    cuts = DummyManifest(CutSet, begin_id=0, end_id=4)
    recs, sups, feats = cuts.decompose(tmp_path, verbose=False)
    assert len(list(recs)) == 4
    assert len(list(sups)) == 4
    assert (tmp_path / "recordings.jsonl.gz").exists()


def test_cutset_save_audios_relocates_and_stays_loadable(tmp_path, cut_with_feats):
    cuts = CutSet.from_cuts([cut_with_feats])
    before = cut_with_feats.load_audio()
    out = cuts.save_audios(tmp_path / "audio", progress_bar=False)
    (saved,) = list(out)
    path = saved.recording.sources[0].source
    assert str(path).startswith(str(tmp_path / "audio"))
    np.testing.assert_allclose(saved.load_audio(), before, atol=2 / 32768)


def test_cutset_copy_feats_restores_matrices(tmp_path, cut_with_feats):
    from lhotse_tpu.features.io import LilcomChunkyWriter

    cuts = CutSet.from_cuts([cut_with_feats])
    before = cut_with_feats.load_features()
    with LilcomChunkyWriter(tmp_path / "refeats.lca") as writer:
        out = cuts.copy_feats(writer=writer)
    (copied,) = list(out)
    assert str(copied.features.storage_path).endswith("refeats.lca")
    np.testing.assert_allclose(copied.load_features(), before, atol=2**-5)


def test_cutset_prefetch_preserves_order_and_items(cut_with_feats):
    cuts = CutSet.from_cuts(
        [cut_with_feats.with_id(f"c{i}") for i in range(20)]
    )
    prefetched = list(cuts.prefetch(buffer_size=4))
    assert [c.id for c in prefetched] == [c.id for c in cuts]
