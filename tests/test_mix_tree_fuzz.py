"""
Randomized mix-tree fuzzer: build nested mix/append/pad trees over real
audio cuts, asserting the core invariants (num_samples arithmetic, audio
shape/finiteness, per-track unmix consistency) and dict-serialization
round trips at every tree shape.
"""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lhotse_tpu import MonoCut, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut
from lhotse_tpu.cut.set import deserialize_cut

SR = 16000
_BASE = {}


def _base_cuts(tmp_path_factory):
    if "cuts" not in _BASE:
        d = tmp_path_factory.mktemp("mixfuzz")
        cuts = []
        for i, dur in enumerate((0.4, 0.7, 1.0)):
            n = int(dur * SR)
            p = d / f"b{i}.wav"
            write_wav(
                str(p),
                (0.1 * np.sin(2 * np.pi * (200 + 111 * i) * np.arange(n) / SR)).astype(
                    np.float32
                ),
                SR,
            )
            rec = Recording.from_file(p, recording_id=f"b{i}")
            cuts.append(
                MonoCut(
                    id=f"b{i}", start=0.0, duration=dur, channel=0, recording=rec,
                    supervisions=[
                        SupervisionSegment(
                            id=f"s{i}", recording_id=f"b{i}", start=0.0, duration=dur)
                    ])
            )
        _BASE["cuts"] = cuts
    return _BASE["cuts"]


def _tree(depth):
    leaf = st.integers(0, 2)
    if depth == 0:
        return leaf
    sub = _tree(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.just("mix"), sub, sub, st.floats(0.0, 0.5), st.one_of(st.none(), st.floats(-5, 20))),
        st.tuples(st.just("append"), sub, sub),
        st.tuples(st.just("pad"), sub, st.floats(1.0, 2.0)),
    )


def _build(node, base):
    if isinstance(node, int):
        return base[node]
    op = node[0]
    if op == "mix":
        _, l, r, offset, snr = node
        left, right = _build(l, base), _build(r, base)
        return left.mix(right, offset_other_by=round(offset, 3), snr=snr, allow_padding=True)
    if op == "append":
        _, l, r = node
        return _build(l, base).append(_build(r, base))
    if op == "pad":
        _, l, dur = node
        return _build(l, base).pad(duration=round(dur, 3))
    raise AssertionError(node)


@settings(max_examples=60, deadline=None)
@given(bp=_tree(depth=3))
def test_mix_tree_invariants(tmp_path_factory, bp):
    base = _base_cuts(tmp_path_factory)
    cut = _build(bp, base)

    audio = cut.load_audio()
    assert audio.shape == (1, cut.num_samples)
    assert np.isfinite(audio).all()
    assert abs(cut.num_samples - round(cut.duration * SR)) <= 1

    if isinstance(cut, MixedCut):
        # Per-track list (reference-parity return type) sums back to the mix.
        tracks = cut.load_audio(mixed=False)
        assert isinstance(tracks, list)
        stack = np.stack(tracks)
        assert stack.shape[-1] == cut.num_samples
        np.testing.assert_allclose(
            stack.sum(axis=0), audio, atol=1e-4
        )

    # Serialization round trip reproduces the samples exactly.
    restored = deserialize_cut(cut.to_dict())
    np.testing.assert_allclose(restored.load_audio(), audio, atol=1e-7)
    # Supervisions survive with in-bounds times.
    for s in restored.supervisions:
        assert s.end <= cut.duration + 0.02
