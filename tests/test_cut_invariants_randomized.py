"""
Property-based invariants of the cut algebra (SURVEY §4: the reference keeps
hypothesis-randomized invariant tests, e.g. test/cut/test_invariants_randomized.py).

The core contract: after ANY chain of lazy cut operations,
``cut.num_samples == round(duration * sampling_rate)`` and
``cut.load_audio().shape == (num_channels, num_samples)``.
"""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lhotse_tpu.testing.dummies import dummy_cut, dummy_recording

MAX_EXAMPLES = 25


def make_cut(duration=2.0):
    rec = dummy_recording(0, duration=duration, with_data=True)
    return rec.to_cut()


@st.composite
def op_chains(draw):
    n_ops = draw(st.integers(1, 4))
    ops = []
    for _ in range(n_ops):
        ops.append(
            draw(
                st.sampled_from(
                    ["truncate", "pad", "resample", "perturb_speed",
                     "perturb_volume", "perturb_tempo"]
                )
            )
        )
    params = {
        "trunc_offset": draw(st.floats(0.0, 0.5)), "trunc_duration": draw(st.floats(0.2, 1.0)),
        "pad_duration": draw(st.floats(2.5, 5.0)),
        "resample_rate": draw(st.sampled_from([8000, 16000, 22050, 24000])),
        "speed": draw(st.sampled_from([0.9, 1.0, 1.1])), "volume": draw(st.floats(0.5, 2.0)),
        "tempo": draw(st.sampled_from([0.9, 1.1]))}
    return ops, params


def apply_ops(cut, ops, params):
    for op in ops:
        if op == "truncate":
            cut = cut.truncate(
                offset=min(params["trunc_offset"], max(cut.duration - 0.2, 0)),
                duration=min(params["trunc_duration"], cut.duration))
        elif op == "pad":
            cut = cut.pad(duration=cut.duration + params["pad_duration"])
        elif op == "resample":
            cut = cut.resample(params["resample_rate"])
        elif op == "perturb_speed":
            cut = cut.perturb_speed(params["speed"])
        elif op == "perturb_volume":
            cut = cut.perturb_volume(params["volume"])
        elif op == "perturb_tempo":
            cut = cut.perturb_tempo(params["tempo"])
    return cut


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(op_chains())
def test_num_samples_matches_duration_after_op_chain(chain):
    ops, params = chain
    cut = apply_ops(make_cut(), ops, params)
    assert cut.duration > 0
    assert abs(cut.num_samples - cut.duration * cut.sampling_rate) <= 1


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(op_chains())
def test_loaded_audio_shape_matches_manifest_after_op_chain(chain):
    ops, params = chain
    cut = apply_ops(make_cut(), ops, params)
    audio = cut.load_audio()
    assert audio.shape == (1, cut.num_samples), (ops, params)
    assert np.isfinite(audio).all()


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(offset=st.floats(0.0, 1.5), duration=st.floats(0.1, 2.0), keep=st.booleans())
def test_truncate_keeps_supervisions_within_bounds(offset, duration, keep):
    cut = dummy_cut(0, with_data=True, duration=1.0, recording_duration=2.0)
    offset = min(offset, cut.duration - 0.05)
    cut2 = cut.truncate(
        offset=offset, duration=min(duration, cut.duration - offset),
        keep_excessive_supervisions=keep)
    for sup in cut2.supervisions:
        if not keep:
            assert sup.start >= -1e-8
            assert sup.end <= cut2.duration + 1e-8


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(snr=st.floats(-5, 30), offset=st.floats(0.0, 0.8))
def test_mix_duration_and_audio_shape(snr, offset):
    a = make_cut(duration=1.0)
    b = make_cut(duration=1.0)
    mixed = a.mix(b, offset_other_by=offset, snr=snr)
    assert mixed.duration == pytest.approx(max(1.0, offset + 1.0), abs=1e-3)
    audio = mixed.load_audio()
    assert audio.shape == (1, mixed.num_samples)
    assert np.isfinite(audio).all()


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(st.sampled_from([8000, 16000, 22050, 44100]), st.floats(0.31, 2.0))
def test_resample_then_window_partition(rate, win):
    cut = apply_ops(make_cut(), ["resample"], {"resample_rate": rate})
    windows = cut.cut_into_windows(win)
    total = sum(w.duration for w in windows)
    # Window boundaries snap to whole samples, so the sum can drift by up to
    # one sample per window.
    assert total == pytest.approx(cut.duration, abs=len(windows) / cut.sampling_rate)
    for w in windows:
        assert abs(w.num_samples - w.duration * w.sampling_rate) <= 1


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(chain=op_chains())
def test_serialization_roundtrip_after_op_chain(chain):
    """After ANY op chain, the cut's manifest must survive a JSON round trip
    byte-for-byte in meaning: equal manifest and identical loaded audio."""
    import json
    import tempfile
    from pathlib import Path

    from lhotse_tpu import Recording
    from lhotse_tpu.audio.wavio import write_wav
    from lhotse_tpu.cut.set import deserialize_cut

    ops, params = chain
    with tempfile.TemporaryDirectory() as d:
        t = np.arange(32000) / 16000
        write_wav(Path(d) / "r.wav", (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), 16000)
        cut = apply_ops(Recording.from_file(Path(d) / "r.wav").to_cut(), ops, params)
        restored = deserialize_cut(json.loads(json.dumps(cut.to_dict())))
        assert restored.duration == cut.duration
        assert restored.num_samples == cut.num_samples
        np.testing.assert_array_equal(restored.load_audio(), cut.load_audio())
        return
