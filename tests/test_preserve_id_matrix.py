"""
ID semantics matrix: preserve_id on pad/append/mix (mono and mixed inputs,
all directions) and affix_id on the lazy augmentation builders.

Behavioral model: /root/reference/test/cut/test_cut_ops_preserve_id.py.
"""
import numpy as np
import pytest

from lhotse_tpu import MonoCut, Recording
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.cut import MixedCut

SR = 16000


def _cut(tmp_path, name, seconds=1.0):
    n = int(seconds * SR)
    p = tmp_path / f"{name}.wav"
    write_wav(str(p), (0.05 * np.ones(n)).astype(np.float32), SR)
    return MonoCut(
        id=name, start=0.0, duration=seconds, channel=0,
        recording=Recording.from_file(p, recording_id=name))


@pytest.fixture
def cut1(tmp_path):
    return _cut(tmp_path, "cut1")


@pytest.fixture
def cut2(tmp_path):
    return _cut(tmp_path, "cut2", seconds=0.5)


@pytest.fixture
def mixed1(cut1, cut2):
    return cut1.mix(cut2, offset_other_by=0.25)


# ---------------------------------------------------------------------------
# pad
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("direction", ["right", "left", "both"])
def test_pad_cut_preserve_id_false(cut1, direction):
    padded = cut1.pad(duration=2.0, direction=direction)
    assert isinstance(padded, MixedCut)
    assert padded.id != cut1.id


@pytest.mark.parametrize("direction", ["right", "left", "both"])
def test_pad_cut_preserve_id_true(cut1, direction):
    padded = cut1.pad(duration=2.0, direction=direction, preserve_id=True)
    assert padded.id == cut1.id


@pytest.mark.parametrize("direction", ["right", "left", "both"])
def test_pad_mixed_cut_preserve_id(mixed1, direction):
    assert mixed1.pad(duration=3.0, direction=direction).id != mixed1.id
    assert (
        mixed1.pad(duration=3.0, direction=direction, preserve_id=True).id
        == mixed1.id
    )


def test_pad_noop_keeps_id_regardless(cut1):
    assert cut1.pad(duration=0.5).id == cut1.id  # no padding needed


# ---------------------------------------------------------------------------
# append
# ---------------------------------------------------------------------------
def test_append_preserve_id_semantics(cut1, cut2):
    assert cut1.append(cut2).id not in (cut1.id, cut2.id)
    assert cut1.append(cut2, preserve_id="left").id == cut1.id
    assert cut1.append(cut2, preserve_id="right").id == cut2.id


def test_append_mixed_cut_preserve_id(mixed1, cut2):
    assert mixed1.append(cut2).id not in (mixed1.id, cut2.id)
    assert mixed1.append(cut2, preserve_id="left").id == mixed1.id
    assert mixed1.append(cut2, preserve_id="right").id == cut2.id


# ---------------------------------------------------------------------------
# mix
# ---------------------------------------------------------------------------
def test_mix_preserve_id_semantics(cut1, cut2):
    assert cut1.mix(cut2).id not in (cut1.id, cut2.id)
    assert cut1.mix(cut2, preserve_id="left").id == cut1.id
    assert cut1.mix(cut2, preserve_id="right").id == cut2.id


def test_mix_mixed_cut_preserve_id(mixed1, cut2):
    assert mixed1.mix(other=cut2).id not in (mixed1.id, cut2.id)
    assert mixed1.mix(other=cut2, preserve_id="left").id == mixed1.id
    assert mixed1.mix(other=cut2, preserve_id="right").id == cut2.id


def test_unpreserved_mix_ids_are_fresh(cut1, cut2):
    # Unpreserved mixed ids are newly generated per call (uuid4, reference
    # parity) — two identical mixes are distinct manifests.
    a = cut1.mix(cut2, offset_other_by=0.1)
    b = cut1.mix(cut2, offset_other_by=0.1)
    assert a.id != b.id


# ---------------------------------------------------------------------------
# affix_id on lazy builders
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "op,kwargs,suffix",
    [
        ("perturb_speed", {"factor": 1.1}, "_sp1.1"),
        ("perturb_tempo", {"factor": 0.9}, "_tp0.9"),
        ("perturb_volume", {"factor": 2.0}, "_vp2.0"),
        ("resample", {"sampling_rate": 8000}, "_rs8000"),
    ],
)
def test_affix_id_toggles_suffix(cut1, op, kwargs, suffix):
    affixed = getattr(cut1, op)(**kwargs, affix_id=True)
    assert affixed.id == cut1.id + suffix
    plain = getattr(cut1, op)(**kwargs, affix_id=False)
    assert plain.id == cut1.id


def test_reverb_rir_affix(cut1):
    rv = cut1.reverb_rir(room_rng_seed=1, source_rng_seed=2, affix_id=True)
    assert rv.id.startswith(cut1.id) and rv.id != cut1.id
    plain = cut1.reverb_rir(room_rng_seed=1, source_rng_seed=2, affix_id=False)
    assert plain.id == cut1.id
