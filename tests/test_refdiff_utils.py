"""
Differential tests: the arithmetic/utility layer vs the actual reference
implementation (imported from /root/reference via tests/_reference.py stubs).

Unlike the golden-fixture parity tests, these execute BOTH implementations on
the same randomized inputs and compare outputs exactly — frame/sample
arithmetic must agree bit-for-bit because manifests produced by one must load
and validate in the other (reference contract: lhotse/utils.py:410-717).
"""
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    import lhotse.utils as RU

import lhotse_tpu.utils.core as MU

SAMPLING_RATES = [8000, 16000, 22050, 24000, 44100, 48000]

durations = st.one_of(
    st.integers(0, 100_000).map(lambda n: n / 1000.0),  # ms-grid durations
    st.floats(0.0, 100.0, allow_nan=False, allow_infinity=False),
)
frame_shifts = st.sampled_from([0.01, 0.0125, 0.02, 0.025, 1 / 75])
srs = st.sampled_from(SAMPLING_RATES)


@settings(max_examples=300, deadline=None)
@given(durations, frame_shifts, srs)
def test_compute_num_frames(duration, frame_shift, sr):
    assert MU.compute_num_frames(duration, frame_shift, sr) == RU.compute_num_frames(
        duration, frame_shift, sr
    )


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 10_000_000), frame_shifts, srs)
def test_compute_num_frames_from_samples(num_samples, frame_shift, sr):
    assert MU.compute_num_frames_from_samples(
        num_samples, frame_shift, sr
    ) == RU.compute_num_frames_from_samples(num_samples, frame_shift, sr)


@settings(max_examples=300, deadline=None)
@given(durations, srs)
def test_compute_num_samples(duration, sr):
    assert MU.compute_num_samples(duration, sr) == RU.compute_num_samples(duration, sr)


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 10_000_000), st.sampled_from([0.9, 1.0, 1.1, 0.95, 1.05]))
def test_perturb_num_samples(num_samples, factor):
    assert MU.perturb_num_samples(num_samples, factor) == RU.perturb_num_samples(
        num_samples, factor
    )


@settings(max_examples=300, deadline=None)
@given(st.lists(durations, min_size=1, max_size=5), srs)
def test_add_durations(durs, sr):
    assert MU.add_durations(*durs, sampling_rate=sr) == RU.add_durations(
        *durs, sampling_rate=sr
    )


@settings(max_examples=200, deadline=None)
@given(
    st.floats(0.01, 100.0, allow_nan=False),
    st.floats(0.01, 5.0, allow_nan=False),
    st.floats(0.005, 5.0, allow_nan=False),
)
def test_compute_num_windows(sig_len, win_len, hop):
    assert MU.compute_num_windows(sig_len, win_len, hop) == RU.compute_num_windows(
        sig_len, win_len, hop
    )


@settings(max_examples=300, deadline=None)
@given(
    st.floats(0.0, 50.0, allow_nan=False),
    st.floats(0.01, 20.0, allow_nan=False),
    st.floats(0.0, 10.0, allow_nan=False),
    st.sampled_from(["left", "right", "center"]),
    srs,
)
def test_compute_start_duration_for_extended_cut(start, duration, extension, direction, sr):
    pad = extension if direction != "center" else extension / 2
    kwargs = dict(
        start=start,
        duration=duration,
        new_duration=duration + extension,
        direction=direction,
    )
    try:
        exp = RU.compute_start_duration_for_extended_cut(**kwargs)
    except ValueError:
        with pytest.raises(ValueError):
            MU.compute_start_duration_for_extended_cut(**kwargs)
        return
    got = MU.compute_start_duration_for_extended_cut(**kwargs)
    assert got == exp, (kwargs, pad)


spans = st.tuples(
    st.floats(0.0, 30.0, allow_nan=False), st.floats(0.0, 10.0, allow_nan=False)
)


def _spans(ref_mod, my_mod, a, b):
    (s1, d1), (s2, d2) = a, b
    return (
        ref_mod.TimeSpan(s1, s1 + d1),
        ref_mod.TimeSpan(s2, s2 + d2),
        my_mod.TimeSpan(s1, s1 + d1),
        my_mod.TimeSpan(s2, s2 + d2),
    )


@settings(max_examples=300, deadline=None)
@given(spans, spans)
def test_overlaps_overspans_measure(a, b):
    ra, rb, ma, mb = _spans(RU, MU, a, b)
    assert MU.overlaps(ma, mb) == RU.overlaps(ra, rb)
    assert MU.overspans(ma, mb) == RU.overspans(ra, rb)
    # Zero-duration spans strictly inside the other make BOTH implementations
    # raise ZeroDivisionError (shorter-span duration is 0) — parity includes
    # the failure mode.
    try:
        exp = RU.measure_overlap(ra, rb)
    except ZeroDivisionError:
        with pytest.raises(ZeroDivisionError):
            MU.measure_overlap(ma, mb)
        return
    assert MU.measure_overlap(ma, mb) == pytest.approx(exp, nan_ok=True)


@settings(max_examples=300, deadline=None)
@given(
    st.floats(0.0, 30.0, allow_nan=False),
    st.floats(0.0, 20.0, allow_nan=False),
    frame_shifts,
    srs,
    st.one_of(st.none(), st.floats(5.0, 40.0)),
)
def test_supervision_to_frames(start, duration, frame_shift, sr, max_dur):
    kw = dict(frame_shift=frame_shift, sampling_rate=sr, max_frames=None)
    sup_r = ref.SupervisionSegment("s", "r", start=start, duration=duration)
    import lhotse_tpu as mine

    sup_m = mine.SupervisionSegment("s", "r", start=start, duration=duration)
    assert MU.supervision_to_frames(sup_m, **kw) == RU.supervision_to_frames(sup_r, **kw)
    assert MU.supervision_to_samples(
        sup_m, sampling_rate=sr, max_samples=None
    ) == RU.supervision_to_samples(sup_r, sampling_rate=sr, max_samples=None)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=8), max_size=5), st.one_of(st.none(), st.just("#")))
def test_merge_items_with_delimiter(items, sep):
    kw = {} if sep is None else {"delimiter": sep}
    assert MU.merge_items_with_delimiter(items, **kw) == RU.merge_items_with_delimiter(
        items, **kw
    )


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=20), st.one_of(st.none(), st.integers(1, 1000)))
def test_hash_str_to_int(s, max_value):
    assert MU.hash_str_to_int(s, max_value) == RU.hash_str_to_int(s, max_value)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(), min_size=0, max_size=30),
    st.integers(1, 6),
    st.booleans(),
)
def test_split_sequence(seq, num_splits, shuffle):
    try:
        exp = RU.split_sequence(list(seq), num_splits, shuffle=shuffle, drop_last=False)
    except Exception as e:
        with pytest.raises(type(e)):
            MU.split_sequence(list(seq), num_splits, shuffle=shuffle, drop_last=False)
        return
    got = MU.split_sequence(list(seq), num_splits, shuffle=shuffle, drop_last=False)
    if shuffle:
        # both use seeded random.shuffle(..., 42-seeded rng) — compare as bags
        assert sorted(x for part in got for x in part) == sorted(
            x for part in exp for x in part
        )
        assert [len(p) for p in got] == [len(p) for p in exp]
    else:
        assert got == exp


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 60), st.integers(1, 20), st.integers(0, 2**32 - 1))
def test_streaming_shuffle_order(n, bufsize, seed):
    data = list(range(n))
    exp = list(RU.streaming_shuffle(iter(data), bufsize=bufsize, rng=random.Random(seed)))
    got = list(MU.streaming_shuffle(iter(data), bufsize=bufsize, rng=random.Random(seed)))
    assert got == exp
