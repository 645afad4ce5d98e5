"""
Parity of the in-place collated extraction fast path
(``extract_batch_collated``, the host hot path behind OnTheFlyFeatures)
against extract_batch + collate_matrices.

Reference semantics under test: lhotse/dataset/input_strategies.py
(OnTheFlyFeatures collation with LOG_EPSILON padding).
"""
import numpy as np
import pytest

from lhotse_tpu import Fbank, Mfcc
from lhotse_tpu.dataset.collation import collate_matrices
from lhotse_tpu.features.kaldi.extractors import FbankConfig
from lhotse_tpu.utils import LOG_EPSILON

SR = 16000


def _items(seed=0, n=5):
    rng = np.random.RandomState(seed)
    return [
        (rng.randn(int(SR * d)) * 0.1).astype(np.float32)
        for d in rng.uniform(0.3, 2.1, n)
    ]


def test_collated_matches_extract_batch_fbank():
    ex = Fbank()
    items = _items()
    got = ex.extract_batch_collated(items, sampling_rate=SR, pad_value=LOG_EPSILON)
    assert got is not None
    batch, lens = got
    ref = ex.extract_batch(items, sampling_rate=SR)
    ref_list = [np.asarray(f) for f in ref]
    expected = collate_matrices(ref_list, padding_value=LOG_EPSILON)
    assert batch.shape == expected.shape
    assert batch.dtype == np.float32
    np.testing.assert_array_equal(lens, [f.shape[0] for f in ref_list])
    np.testing.assert_allclose(batch, expected, rtol=0, atol=1e-6)
    # Padding region is exactly LOG_EPSILON.
    for i, n in enumerate(lens):
        if n < batch.shape[1]:
            assert np.all(batch[i, n:] == np.float32(LOG_EPSILON))


def test_collated_matches_extract_batch_mfcc():
    ex = Mfcc()
    items = _items(seed=1)
    got = ex.extract_batch_collated(items, sampling_rate=SR, pad_value=LOG_EPSILON)
    if got is None:
        pytest.skip("Mfcc opted out of the collated path")
    batch, lens = got
    ref_list = [np.asarray(f) for f in ex.extract_batch(items, sampling_rate=SR)]
    expected = collate_matrices(ref_list, padding_value=LOG_EPSILON)
    np.testing.assert_allclose(batch, expected, rtol=0, atol=1e-6)


def test_collated_with_lengths_kwarg():
    ex = Fbank()
    rng = np.random.RandomState(2)
    padded = (rng.randn(4, SR) * 0.1).astype(np.float32)
    lengths = np.array([SR, SR // 2, SR // 3, SR - 7])
    got = ex.extract_batch_collated(
        padded, sampling_rate=SR, lengths=lengths, pad_value=-5.0
    )
    assert got is not None
    batch, lens = got
    for i, l in enumerate(lengths):
        single = np.asarray(ex.extract(padded[i, :l], sampling_rate=SR))
        assert lens[i] == single.shape[0]
        np.testing.assert_allclose(batch[i, : lens[i]], single, rtol=0, atol=1e-6)


def test_collated_declines_use_energy():
    ex = Fbank(FbankConfig(use_energy=True))
    assert ex.extract_batch_collated(_items(3, 2), sampling_rate=SR) is None


def test_on_the_fly_features_uses_collated_path(tmp_path):
    """OnTheFlyFeatures output is unchanged by the fast path."""
    from lhotse_tpu.dataset.input_strategies import OnTheFlyFeatures
    from lhotse_tpu.testing.dummies import dummy_cut, dummy_recording
    from lhotse_tpu.cut import CutSet

    cuts = CutSet.from_cuts(
        dummy_cut(
            i, duration=0.5 + 0.2 * i, recording=dummy_recording(i, duration=2.0, with_data=True)
        )
        for i in range(4)
    )
    strat = OnTheFlyFeatures(Fbank())
    feats, lens = strat(cuts)
    assert feats.ndim == 3 and feats.shape[0] == 4 and feats.dtype == np.float32
    # Slow path for comparison.
    strat_slow = OnTheFlyFeatures(Fbank())
    strat_slow.extractor.extract_batch_collated = lambda *a, **k: None
    feats2, lens2 = strat_slow(cuts)
    np.testing.assert_array_equal(lens, lens2)
    np.testing.assert_allclose(feats, feats2, rtol=0, atol=1e-6)
