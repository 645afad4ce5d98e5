"""
Batch audio IO (AudioSamples / collate_audio channel-policy matrix,
CutSet.load_audio, custom recording fields), supervision/speaker masks
across Mono/Padding/Mixed cuts, and controllable multiplexer weights.

Behavioral models: /root/reference/test/dataset/test_batch_io.py,
/root/reference/test/cut/test_masks.py,
/root/reference/test/dataset/test_controllable_weights.py.
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, Fbank, MonoCut, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MultiCut, PaddingCut
from lhotse_tpu.dataset.collation import collate_audio
from lhotse_tpu.dataset.input_strategies import AudioSamples
from lhotse_tpu.features.io import NumpyHdf5Writer
from lhotse_tpu.lazy import LazyIteratorMultiplexer

SR = 16000


def _mono(tmp_path, name, seconds=1.0, freq=220.0, sup=True):
    n = int(seconds * SR)
    x = (0.2 * np.sin(2 * np.pi * freq * np.arange(n) / SR)).astype(np.float32)
    p = tmp_path / f"{name}.wav"
    write_wav(str(p), x, SR)
    rec = Recording.from_file(p, recording_id=name)
    sups = (
        [
            SupervisionSegment(
                id=f"{name}-sup", recording_id=name, start=0.2,
                duration=round(seconds - 0.4, 3), channel=0, speaker=f"spk-{name}")
        ]
        if sup
        else []
    )
    return MonoCut(
        id=name, start=0.0, duration=seconds, channel=0, recording=rec,
        supervisions=sups)


def _multi(tmp_path, name, seconds=1.0):
    n = int(seconds * SR)
    rng = np.random.RandomState(1)
    data = (0.1 * rng.randn(2, n)).astype(np.float32)
    p = tmp_path / f"{name}.wav"
    write_wav(str(p), data, SR)
    rec = Recording.from_file(p, recording_id=name)
    return MultiCut(
        id=name, start=0.0, duration=seconds, channel=[0, 1], recording=rec
    )


# ---------------------------------------------------------------------------
# Batch IO
# ---------------------------------------------------------------------------
def test_audio_samples_equivalent_to_cut_set_load_audio(tmp_path):
    cuts = CutSet.from_cuts(
        [_mono(tmp_path, f"a{i}", seconds=0.5 + 0.25 * i) for i in range(3)]
    )
    audio, lens = AudioSamples()(cuts)
    audio2, lens2 = cuts.load_audio(collate=True)
    np.testing.assert_array_equal(audio, audio2)
    np.testing.assert_array_equal(lens, lens2)
    assert audio.shape == (3, int(1.0 * SR))
    assert lens.tolist() == [int((0.5 + 0.25 * i) * SR) for i in range(3)]
    # Padding region is zeros.
    assert (audio[0, lens[0] :] == 0).all()


def test_cut_set_load_audio_collate_false(tmp_path):
    cuts = CutSet.from_cuts(
        [_mono(tmp_path, f"b{i}", seconds=0.5 + 0.1 * i) for i in range(2)]
    )
    out = cuts.load_audio(collate=False)
    assert isinstance(out, list) and len(out) == 2
    assert out[0].shape != out[1].shape


def test_audio_samples_with_custom_recording_field(tmp_path):
    cuts = []
    for i in range(2):
        c = _mono(tmp_path, f"c{i}", seconds=0.6)
        target = _mono(tmp_path, f"t{i}", seconds=0.6, freq=500.0)
        c.target_recording = target.recording
        cuts.append(c)
    cuts = CutSet.from_cuts(cuts)
    audio, lens = AudioSamples()(cuts, recording_field="target_recording")
    direct = np.stack([c.load_target_recording() for c in cuts])[:, 0, :]
    np.testing.assert_allclose(audio, direct, atol=1e-7)


def test_audio_samples_with_missing_custom_field_raises(tmp_path):
    cuts = CutSet.from_cuts([_mono(tmp_path, "m0")])
    with pytest.raises(AssertionError, match="target_recording"):
        AudioSamples()(cuts, recording_field="target_recording")


def test_mono_downmix_none_mono_only(tmp_path):
    cuts = CutSet.from_cuts([_mono(tmp_path, f"d{i}") for i in range(2)])
    audio, _ = collate_audio(cuts, mono_downmix=None)
    assert audio.ndim == 2  # (B, T)


def test_mono_downmix_none_multi_only(tmp_path):
    cuts = CutSet.from_cuts([_multi(tmp_path, f"e{i}") for i in range(2)])
    audio, _ = collate_audio(cuts, mono_downmix=None)
    assert audio.shape[:2] == (2, 2)  # (B, C, T)


def test_mono_downmix_true_multichannel(tmp_path):
    cuts = CutSet.from_cuts([_multi(tmp_path, "f0")])
    audio, _ = collate_audio(cuts, mono_downmix=True)
    assert audio.ndim == 2
    want = cuts[0].load_audio().mean(axis=0)
    np.testing.assert_allclose(audio[0], want, atol=1e-6)


def test_mono_downmix_false_mixed_batch(tmp_path):
    cuts = CutSet.from_cuts([_mono(tmp_path, "g0"), _multi(tmp_path, "g1")])
    audio, _ = collate_audio(cuts, mono_downmix=False)
    assert audio.shape[:2] == (2, 2)
    # Mono cut sits in channel 0; its channel 1 is zero-padded.
    assert (audio[0, 1] == 0).all()
    assert not (audio[0, 0] == 0).all()


def test_fault_tolerant_collation_returns_survivors(tmp_path):
    good = _mono(tmp_path, "h0")
    bad = _mono(tmp_path, "h1")
    bad.recording.sources[0].source = str(tmp_path / "missing.wav")
    cuts = CutSet.from_cuts([good, bad])
    audio, lens, kept = AudioSamples(fault_tolerant=True)(cuts)
    assert [c.id for c in kept] == ["h0"]
    assert audio.shape[0] == 1


def test_pad_to_multiple(tmp_path):
    cuts = CutSet.from_cuts([_mono(tmp_path, "i0", seconds=0.53)])
    audio, lens = collate_audio(cuts, pad_to_multiple=4000)
    assert audio.shape[1] % 4000 == 0
    assert lens[0] == int(0.53 * SR)


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------
def test_mono_cut_audio_and_feature_masks(tmp_path):
    cut = _mono(tmp_path, "j0", seconds=1.0).compute_and_store_features(
        extractor=Fbank(), storage=NumpyHdf5Writer(str(tmp_path / "feats-j"))
    )
    amask = cut.supervisions_audio_mask()
    assert amask.shape == (cut.num_samples,)
    s, e = int(0.2 * SR), int(0.8 * SR)
    assert (amask[s:e] == 1).all()
    assert amask[: s - 1].sum() == 0 and amask[e + 1 :].sum() == 0

    fmask = cut.supervisions_feature_mask()
    assert fmask.shape == (cut.num_frames,)
    assert fmask.sum() == pytest.approx(0.6 / cut.frame_shift, abs=2)


def test_padding_cut_masks_are_zero():
    pad = PaddingCut(
        id="p", duration=1.0, sampling_rate=SR, feat_value=-23.0,
        num_samples=SR, num_frames=100, num_features=80, frame_shift=0.01)
    assert (pad.supervisions_audio_mask() == 0).all()
    assert (pad.supervisions_feature_mask() == 0).all()
    assert pad.supervisions_audio_mask().shape == (SR,)
    assert pad.supervisions_feature_mask().shape == (100,)


def test_mixed_cut_audio_mask_covers_both_tracks(tmp_path):
    a = _mono(tmp_path, "k0", seconds=1.0)
    b = _mono(tmp_path, "k1", seconds=1.0)
    mixed = a.mix(b, offset_other_by=1.5, allow_padding=True)  # gap in [1.0, 1.5)
    mask = mixed.supervisions_audio_mask()
    assert mask.shape == (mixed.num_samples,)
    # Supervised regions of both tracks are active at their shifted offsets.
    assert mask[int(0.3 * SR)] == 1
    assert mask[int((1.5 + 0.3) * SR)] == 1
    assert mask[int(1.2 * SR)] == 0  # the gap


def test_speakers_audio_mask_one_row_per_speaker(tmp_path):
    a = _mono(tmp_path, "l0", seconds=1.0)
    b = _mono(tmp_path, "l1", seconds=1.0)
    mixed = a.mix(b, offset_other_by=0.5)
    mask = mixed.speakers_audio_mask()
    assert mask.shape[0] >= 2
    assert mask.shape[1] == mixed.num_samples
    assert mask[0].sum() > 0 and mask[1].sum() > 0


def test_speakers_feature_mask_min_speaker_dim(tmp_path):
    cut = _mono(tmp_path, "n0", seconds=1.0).compute_and_store_features(
        extractor=Fbank(), storage=NumpyHdf5Writer(str(tmp_path / "feats-n"))
    )
    mask = cut.speakers_feature_mask(min_speaker_dim=4)
    assert mask.shape[0] == 4  # padded up to the requested speaker dim
    assert mask[1:].sum() == 0


def test_audio_mask_from_alignment(tmp_path):
    from lhotse_tpu.supervision import AlignmentItem

    cut = _mono(tmp_path, "o0", seconds=1.0)
    cut.supervisions[0] = cut.supervisions[0].with_alignment(
        "word", [AlignmentItem("hi", 0.25, 0.1, None)]
    )
    mask = cut.supervisions_audio_mask(use_alignment_if_exists="word")
    s, e = int(0.25 * SR), int(0.35 * SR)
    assert (mask[s:e] == 1).all()
    assert mask.sum() == pytest.approx(e - s, abs=2)


# ---------------------------------------------------------------------------
# Controllable multiplexer weights
# ---------------------------------------------------------------------------
def test_mux_with_controllable_weights(tmp_path):
    import json

    from lhotse_tpu.indexing import create_jsonl_index
    from lhotse_tpu.lazy import LazyIndexedManifestIterator
    from lhotse_tpu.testing.dummies import dummy_supervision

    paths = []
    for src, ids in (("a", range(0, 300)), ("b", range(1000, 1300))):
        p = tmp_path / f"{src}.jsonl"
        with p.open("w") as f:
            for i in ids:
                print(json.dumps(dummy_supervision(i).to_dict()), file=f)
        create_jsonl_index(p)
        paths.append(p)

    weights = [1.0, 0.0]  # start: only source A
    mux = LazyIteratorMultiplexer(
        LazyIndexedManifestIterator(paths[0]),
        LazyIndexedManifestIterator(paths[1]),
        weights=weights,
        seed=0,
    )
    stream = iter(mux)
    first = [next(stream).id for _ in range(50)]
    assert all("1" != i.split("-")[-1][0] for i in first)  # all from A (ids < 1000)

    # Flip the live weights mid-stream: the SAME list object steers the draw.
    weights[0], weights[1] = 0.0, 1.0
    second = [next(stream).id for _ in range(50)]
    assert all(i.split("-")[-1][0] == "1" for i in second)  # all from B now
