"""
Custom-field matrix: Array/TemporalArray/Recording custom attributes under
load, truncate, pad, resample, attach/delete, and mixed/padding cut access.

Behavioral model: /root/reference/test/cut/test_custom_attrs.py.
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet, MonoCut, Recording, SupervisionSegment, validate
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut
from lhotse_tpu.features.io import NumpyHdf5Writer

SR = 16000


def _rec(tmp_path, name, seconds=1.0, freq=220.0):
    n = int(seconds * SR)
    p = tmp_path / f"{name}.wav"
    write_wav(
        str(p),
        (0.1 * np.sin(2 * np.pi * freq * np.arange(n) / SR)).astype(np.float32),
        SR,
    )
    return Recording.from_file(p, recording_id=name)


@pytest.fixture
def cut(tmp_path):
    rec = _rec(tmp_path, "c")
    return MonoCut(id="c-cut", start=0.0, duration=1.0, channel=0, recording=rec)


def test_nonexistent_attribute_raises(cut):
    with pytest.raises(AttributeError):
        cut.does_not_exist


# ---------------------------------------------------------------------------
# Array / TemporalArray custom fields
# ---------------------------------------------------------------------------
def test_load_plain_array_unaffected_by_truncation(tmp_path, cut):
    with NumpyHdf5Writer(str(tmp_path / "a")) as w:
        cut.embedding = w.store_array("emb", np.arange(8, dtype=np.float32))
    tr = cut.truncate(offset=0.25, duration=0.5)
    np.testing.assert_array_equal(
        tr.load_embedding(), np.arange(8, dtype=np.float32)
    )
    # ...and by padding.
    pad = cut.pad(duration=2.0)
    np.testing.assert_array_equal(
        pad.load_embedding(), np.arange(8, dtype=np.float32)
    )


def test_load_temporal_array_truncate_and_pad(tmp_path, cut):
    with NumpyHdf5Writer(str(tmp_path / "a")) as w:
        cut.posteriors = w.store_array(
            "post",
            np.arange(100, dtype=np.float32),
            frame_shift=0.01,
            temporal_dim=0,
            start=0.0,
        )
    full = cut.load_posteriors()
    assert full.shape == (100,)

    tr = cut.truncate(offset=0.2, duration=0.5)
    got = tr.load_posteriors()
    np.testing.assert_array_equal(got, np.arange(20, 70, dtype=np.float32))

    pad = cut.pad(duration=1.5)
    padded = pad.load_posteriors()
    assert padded.shape == (150,)
    np.testing.assert_array_equal(padded[:100], full)
    assert (padded[100:] == 0).all()  # default pad value


def test_validate_cut_with_temporal_array(tmp_path, cut):
    with NumpyHdf5Writer(str(tmp_path / "a")) as w:
        cut.alignment_scores = w.store_array(
            "al", np.ones(100, dtype=np.float32), frame_shift=0.01,
            temporal_dim=0, start=0.0)
    validate(CutSet.from_cuts([cut]))


def test_attach_tensor_plain_and_temporal(cut):
    c = cut.attach_tensor("snr_vec", np.full(10, 3.5, dtype=np.float32))
    np.testing.assert_array_equal(c.load_snr_vec(), np.full(10, 3.5, np.float32))
    c2 = c.attach_tensor(
        "frame_energy",
        np.arange(100, dtype=np.float32),
        frame_shift=0.01,
        temporal_dim=0,
    )
    got = c2.truncate(offset=0.5).load_frame_energy()
    np.testing.assert_array_equal(got, np.arange(50, 100, dtype=np.float32))


def test_non_array_custom_values_serialize(cut):
    cut.language = "pl"
    cut.quality = 0.97
    from lhotse_tpu.cut.set import deserialize_cut

    restored = deserialize_cut(cut.to_dict())
    assert restored.language == "pl"
    assert restored.quality == 0.97


def test_del_custom_attr(cut):
    cut.tag = "x"
    assert cut.has_custom("tag")
    del cut.tag
    assert not cut.has_custom("tag")
    with pytest.raises(AttributeError):
        del cut.tag


def test_del_attr_on_supervision():
    sup = SupervisionSegment(id="s", recording_id="r", start=0.0, duration=1.0)
    sup.role = "agent"
    assert sup.role == "agent"
    del sup.role
    with pytest.raises(AttributeError):
        sup.role


# ---------------------------------------------------------------------------
# Custom Recording fields
# ---------------------------------------------------------------------------
def test_load_custom_recording_and_truncate(tmp_path, cut):
    target = _rec(tmp_path, "t", freq=500.0)
    cut.target_recording = target
    full = cut.load_target_recording()
    assert full.shape == (1, SR)
    tr = cut.truncate(offset=0.25, duration=0.5)
    got = tr.load_target_recording()
    np.testing.assert_allclose(
        got, target.load_audio(offset=0.25, duration=0.5), atol=2 / 32768
    )


@pytest.mark.parametrize("direction", ["right", "left", "both"])
def test_load_custom_recording_pad(tmp_path, cut, direction):
    cut.target_recording = _rec(tmp_path, "t2", freq=500.0)
    padded = cut.pad(duration=2.0, direction=direction)
    audio = padded.load_target_recording()
    assert audio.shape == (1, 2 * SR)
    lo = 0 if direction == "right" else (SR if direction == "left" else SR // 2)
    speech = audio[0, lo : lo + SR]
    assert np.abs(speech).max() > 0.01
    assert np.abs(np.delete(audio[0], np.arange(lo, lo + SR))).max() < 1e-6


def test_resample_custom_recording_only(tmp_path, cut):
    cut.target_recording = _rec(tmp_path, "t3")
    rs = cut.resample(8000, recording_field="target_recording")
    assert rs.target_recording.sampling_rate == 8000
    assert rs.recording.sampling_rate == SR  # main recording untouched
    assert cut.target_recording.sampling_rate == SR  # original intact
    assert rs.load_target_recording().shape == (1, 8000)


def test_resample_custom_recording_missing_field_raises(cut):
    with pytest.raises((KeyError, TypeError)):
        cut.resample(8000, recording_field="target_recording")


# ---------------------------------------------------------------------------
# Mixed / padding cuts
# ---------------------------------------------------------------------------
def test_mixed_cut_custom_direct_access(tmp_path, cut):
    cut.target_recording = _rec(tmp_path, "t4")
    mixed = cut.pad(duration=1.5)
    assert isinstance(mixed, MixedCut)
    assert mixed.has_custom("target_recording")
    audio = mixed.load_target_recording()
    # Custom recording is padded to the mixed cut's duration.
    assert audio.shape == (1, int(1.5 * SR))


def test_mixed_cut_custom_after_append_same_sr(tmp_path, cut):
    other = MonoCut(
        id="o", start=0.0, duration=1.0, channel=0,
        recording=_rec(tmp_path, "o", freq=300.0))
    cut.target_recording = _rec(tmp_path, "ta", freq=500.0)
    other.target_recording = _rec(tmp_path, "tb", freq=700.0)
    joined = cut.append(other)
    audio = joined.load_target_recording()
    assert audio.shape == (1, 2 * SR)
    np.testing.assert_allclose(
        audio[:, :SR], cut.load_target_recording(), atol=2 / 32768
    )
    np.testing.assert_allclose(
        audio[:, SR:], other.load_target_recording(), atol=2 / 32768
    )


def test_copy_mixed_cut_preserves_custom(tmp_path, cut):
    cut.ref_text = "hello"
    mixed = cut.pad(duration=2.0)
    from lhotse_tpu.utils import fastcopy

    clone = fastcopy(mixed)
    assert clone.ref_text == "hello"


def test_padding_in_mix_does_not_break_custom_arrays(tmp_path, cut):
    with NumpyHdf5Writer(str(tmp_path / "a")) as w:
        cut.posteriors = w.store_array(
            "p", np.ones((100, 4), dtype=np.float32), frame_shift=0.01,
            temporal_dim=0, start=0.0)
    padded = cut.pad(duration=1.3)
    arr = padded.load_posteriors()
    assert arr.shape == (130, 4)
    assert (arr[:100] == 1).all()
    assert (arr[100:] == 0).all()
