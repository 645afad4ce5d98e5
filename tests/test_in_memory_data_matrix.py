"""
In-memory data matrix: selective move_to_memory, offset-window correctness,
padding/mixed cut behavior, to_mono rendering, pickling, and Shar round trips
of memory-backed cuts.

Behavioral model: /root/reference/test/cut/test_cut_with_in_memory_data.py.
"""
import pickle

import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank, MonoCut, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut, PaddingCut
from lhotse_tpu.features.io import NumpyHdf5Writer

SR = 16000


@pytest.fixture
def cut(tmp_path):
    n = int(2.0 * SR)
    x = (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / SR)).astype(np.float32)
    p = tmp_path / "c.wav"
    write_wav(str(p), x, SR)
    rec = Recording.from_file(p, recording_id="c")
    c = MonoCut(
        id="c", start=0.5, duration=1.0, channel=0, recording=rec,
        supervisions=[
            SupervisionSegment(
                id="c-sup", recording_id="c", start=0.0, duration=1.0, text="x")])
    return c.compute_and_store_features(
        extractor=Fbank(), storage=NumpyHdf5Writer(str(tmp_path / "feats"))
    )


@pytest.fixture
def cut_with_arrays(tmp_path, cut):
    with NumpyHdf5Writer(str(tmp_path / "arrs")) as writer:
        emb = writer.store_array("c-emb", np.arange(16, dtype=np.float32))
        post = writer.store_array(
            "c-post",
            np.arange(300, dtype=np.float32).reshape(100, 3),
            frame_shift=0.01,
            temporal_dim=0,
            start=0.5,  # aligned with the cut window
        )
    cut.embedding = emb
    cut.posteriors = post
    return cut


# ---------------------------------------------------------------------------
# Selective moves
# ---------------------------------------------------------------------------
def test_move_to_memory_all(cut):
    mem = cut.move_to_memory()
    assert mem.start == 0.0  # window baked into the payload
    np.testing.assert_allclose(mem.load_audio(), cut.load_audio(), atol=2 / 32768)
    np.testing.assert_allclose(mem.load_features(), cut.load_features(), atol=1e-4)
    assert mem.recording.sources[0].type == "memory"


def test_move_to_memory_load_audio_false(cut):
    mem = cut.move_to_memory(load_audio=False)
    assert mem.recording == cut.recording  # still file-backed
    assert mem.features.storage_type.startswith("memory")
    np.testing.assert_allclose(mem.load_features(), cut.load_features(), atol=1e-4)


def test_move_to_memory_load_features_false(cut):
    mem = cut.move_to_memory(load_features=False)
    assert mem.features == cut.features  # untouched, on disk
    assert mem.recording.sources[0].type == "memory"


def test_move_to_memory_load_custom_false(cut_with_arrays):
    mem = cut_with_arrays.move_to_memory(load_custom=False)
    assert mem.embedding.storage_type == cut_with_arrays.embedding.storage_type
    assert not mem.embedding.storage_type.startswith("memory")


# ---------------------------------------------------------------------------
# Offset-window correctness
# ---------------------------------------------------------------------------
def test_audio_window_with_offset_is_exact(cut):
    mem = cut.move_to_memory()
    # In-memory audio must be exactly the [start, start+duration) window.
    direct = cut.recording.load_audio(offset=0.5, duration=1.0)
    np.testing.assert_allclose(mem.load_audio(), direct, atol=2 / 32768)
    assert mem.num_samples == SR


def test_temporal_array_window_with_offset(cut_with_arrays):
    mem = cut_with_arrays.move_to_memory()
    got = mem.load_posteriors()
    want = cut_with_arrays.load_posteriors()
    np.testing.assert_array_equal(got, want)
    assert got.shape == (100, 3)
    # Plain (non-temporal) arrays move whole.
    np.testing.assert_array_equal(
        mem.load_embedding(), np.arange(16, dtype=np.float32)
    )


def test_truncated_cut_moves_only_its_window(cut_with_arrays):
    tr = cut_with_arrays.truncate(offset=0.2, duration=0.5)
    mem = tr.move_to_memory()
    np.testing.assert_allclose(mem.load_audio(), tr.load_audio(), atol=2 / 32768)
    got = mem.load_posteriors()
    want = tr.load_posteriors()
    np.testing.assert_array_equal(got, want)
    assert got.shape[0] == 50  # 0.5 s at 0.01 frame shift


# ---------------------------------------------------------------------------
# Padding / mixed cuts
# ---------------------------------------------------------------------------
def test_padding_cut_move_to_memory_is_noop():
    pad = PaddingCut(
        id="p", duration=1.0, sampling_rate=SR, feat_value=-23.0, num_samples=SR
    )
    mem = pad.move_to_memory()
    assert isinstance(mem, PaddingCut)
    assert (mem.load_audio() == 0).all()


def test_mixed_cut_move_to_memory(cut):
    mixed = cut.pad(duration=2.0).mix(cut, offset_other_by=0.25, snr=5.0)
    assert isinstance(mixed, MixedCut)
    mem = mixed.move_to_memory()
    assert isinstance(mem, MixedCut)
    np.testing.assert_allclose(mem.load_audio(), mixed.load_audio(), atol=4 / 32768)


def test_mixed_cut_to_mono(cut):
    mixed = cut.mix(cut.perturb_volume(0.5), offset_other_by=0.3, snr=None)
    mono = mixed.to_mono()
    assert isinstance(mono, MonoCut)
    assert mono.recording.sources[0].type == "memory"
    np.testing.assert_allclose(
        mono.load_audio(), mixed.load_audio(mono_downmix=True), atol=2 / 32768
    )
    assert mono.supervisions and all(s.channel == 0 for s in mono.supervisions)


def test_mixed_cut_to_mono_keeps_custom(cut_with_arrays):
    mixed = cut_with_arrays.mix(
        cut_with_arrays.perturb_volume(0.5), offset_other_by=0.2
    )
    mono = mixed.to_mono()
    assert mono.custom is not None and "embedding" in mono.custom


# ---------------------------------------------------------------------------
# Transport: pickle, Shar, JSONL refusal
# ---------------------------------------------------------------------------
def test_in_memory_cut_pickles(cut_with_arrays):
    mem = cut_with_arrays.move_to_memory()
    clone = pickle.loads(pickle.dumps(mem))
    np.testing.assert_allclose(clone.load_audio(), mem.load_audio(), atol=1e-7)
    np.testing.assert_array_equal(clone.load_posteriors(), mem.load_posteriors())


def test_in_memory_cut_jsonl_refused_with_actionable_error(tmp_path, cut):
    mem = cut.move_to_memory()
    with pytest.raises(TypeError, match="in-memory"):
        CutSet.from_cuts([mem]).to_file(tmp_path / "cuts.jsonl")


def test_in_memory_cut_through_shar(tmp_path, cut):
    # Every in-memory field must be declared so its payload lands in the data
    # shards; undeclared in-memory bytes cannot go into cuts jsonl (see
    # test_in_memory_cut_jsonl_refused_with_actionable_error).
    mem = cut.move_to_memory()
    out = tmp_path / "shar"
    CutSet.from_cuts([mem]).to_shar(
        out,
        fields={"recording": "wav", "features": "numpy"},
        shard_size=4,
        verbose=False,
    )
    back = list(CutSet.from_shar(in_dir=out))[0]
    np.testing.assert_allclose(back.load_audio(), mem.load_audio(), atol=2 / 32768)
    np.testing.assert_allclose(back.load_features(), mem.load_features(), atol=1e-4)


def test_drop_in_memory_data(cut_with_arrays):
    mem = cut_with_arrays.move_to_memory()
    dropped = mem.drop_in_memory_data()
    # Metadata survives; payloads are gone (placeholders).
    assert dropped.has_recording
    assert dropped.num_samples == mem.num_samples
    with pytest.raises(Exception):
        dropped.load_audio()


def test_drop_in_memory_data_mixed(cut):
    mixed = cut.mix(cut, offset_other_by=0.2).move_to_memory()
    dropped = mixed.drop_in_memory_data()
    assert isinstance(dropped, MixedCut)
    with pytest.raises(Exception):
        dropped.load_audio()
