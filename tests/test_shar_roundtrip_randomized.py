"""
Property-based Shar round trips: random corpora (durations, sampling rates,
shard sizes, audio/array formats) must survive export -> sequential read and
export -> indexed random access with data intact (within codec tolerance).
"""
import warnings

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lhotse_tpu import CutSet
from lhotse_tpu.testing.dummies import dummy_cut

LILCOM_TOL = 2.0**-5


def make_corpus(n, sr, dur_steps, with_features, rng):
    cuts = []
    for i in range(n):
        dur = 0.5 + 0.25 * dur_steps[i % len(dur_steps)]
        c = dummy_cut(i, duration=min(dur, 1.0), with_data=True)
        if not with_features:
            c = c.drop_features()
        # Strip the dummy custom fields: this suite exports audio+features.
        c.custom = {}
        cuts.append(c)
    return CutSet.from_cuts(cuts)


@st.composite
def shar_case(draw):
    n = draw(st.integers(min_value=3, max_value=12))
    shard_size = draw(st.sampled_from([2, 5, 100]))
    audio_format = draw(st.sampled_from(["wav", "flac"]))
    with_features = draw(st.booleans())
    seed = draw(st.integers(min_value=0, max_value=999))
    return n, shard_size, audio_format, with_features, seed


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=shar_case())
def test_shar_roundtrip_preserves_everything(tmp_path_factory, case):
    n, shard_size, audio_format, with_features, seed = case
    rng = np.random.default_rng(seed)
    tmp_path = tmp_path_factory.mktemp("shar_rt")
    cuts = make_corpus(n, 16000, list(range(5)), with_features, rng)
    originals = {c.id: c for c in cuts}

    fields = {"recording": audio_format}
    if with_features:
        fields["features"] = "lilcom"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = cuts.to_shar(
            str(tmp_path), fields=fields, shard_size=shard_size,
            compress_jsonl=False, create_index=True)

    expected_shards = (n + shard_size - 1) // shard_size
    assert len(out["cuts"]) == expected_shards

    # Sequential read: everything back, in order, data within tolerance.
    seen = []
    for c in CutSet.from_shar(in_dir=str(tmp_path)):
        orig = originals[c.id]
        a, a0 = c.load_audio(), orig.load_audio()
        assert a.shape == a0.shape
        # wav/flac are 16-bit exact for int16-representable data.
        np.testing.assert_allclose(a, a0, atol=2.0**-15 + 1e-7)
        if with_features:
            f, f0 = c.load_features(), orig.load_features()
            assert f.shape == f0.shape
            assert np.abs(f - f0).max() <= LILCOM_TOL
        assert [s.id for s in c.supervisions] == [s.id for s in orig.supervisions]
        seen.append(c.id)
    assert seen == [c.id for c in cuts]

    # Indexed random access agrees with sequential order.
    from lhotse_tpu.shar.readers.indexed import LazyIndexedSharIterator

    idx = LazyIndexedSharIterator(in_dir=str(tmp_path))
    assert len(idx) == n
    for i in [0, n // 2, n - 1]:
        c = idx[i]
        assert c.id == seen[i]
        np.testing.assert_allclose(
            c.load_audio(), originals[c.id].load_audio(), atol=2.0**-15 + 1e-7)
