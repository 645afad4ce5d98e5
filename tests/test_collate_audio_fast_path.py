"""collate_audio's mono fast path vs the pad()+mix reference route.

The fast path (collation.py, ``_USE_MONO_FAST_PATH``) reads each mono cut
once and zero-pads it directly into the batch buffer instead of wrapping
every cut in a padded MixedCut and re-collating — the two must agree
bitwise on every output (audio, lens, surviving cuts).
"""
import numpy as np
import pytest

from lhotse_tpu import CutSet
from lhotse_tpu.dataset import collation
from lhotse_tpu.dataset.collation import collate_audio
from lhotse_tpu.testing.dummies import dummy_cut


@pytest.fixture
def cuts():
    return CutSet.from_cuts(
        [dummy_cut(i, duration=0.5 + 0.31 * i, with_data=True) for i in range(5)]
    )


def both_paths(monkeypatch, fn):
    fast = fn()
    monkeypatch.setattr(collation, "_USE_MONO_FAST_PATH", False)
    slow = fn()
    return fast, slow


@pytest.mark.parametrize("pad_direction", ["right", "left"])
def test_fast_path_matches_padcut_path(cuts, monkeypatch, pad_direction):
    fast, slow = both_paths(
        monkeypatch, lambda: collate_audio(cuts, pad_direction=pad_direction)
    )
    np.testing.assert_array_equal(fast[0], slow[0])
    np.testing.assert_array_equal(fast[1], slow[1])
    assert fast[0].dtype == slow[0].dtype == np.float32


def test_fast_path_matches_with_pad_to_multiple(cuts, monkeypatch):
    fast, slow = both_paths(
        monkeypatch, lambda: collate_audio(cuts, pad_to_multiple=4096)
    )
    np.testing.assert_array_equal(fast[0], slow[0])
    np.testing.assert_array_equal(fast[1], slow[1])
    assert fast[0].shape[1] % 4096 == 0


def test_fast_path_fault_tolerant_contract(cuts, monkeypatch):
    fast, slow = both_paths(
        monkeypatch, lambda: collate_audio(cuts, fault_tolerant=True)
    )
    np.testing.assert_array_equal(fast[0], slow[0])
    np.testing.assert_array_equal(fast[1], slow[1])
    # Surviving cuts come back padded in both paths (same ids, same types).
    assert [c.id for c in fast[2]] == [c.id for c in slow[2]]
    assert [type(c).__name__ for c in fast[2]] == [
        type(c).__name__ for c in slow[2]
    ]
    assert [c.duration for c in fast[2]] == [c.duration for c in slow[2]]


def test_fast_path_skipped_for_explicit_channel_layout(cuts):
    # mono_downmix=False requests the (B, C, T) layout: not the fast path.
    out = collate_audio(cuts, mono_downmix=False)
    assert out[0].ndim == 3 and out[0].shape[1] == 1
