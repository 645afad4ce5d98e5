"""Foundation utility tests (rounding semantics are the manifest-arithmetic
parity contract with the reference: SURVEY.md §2 / utils.py:410-681)."""
import numpy as np
import pytest

from lhotse_tpu.utils import (
    TimeSpan, add_durations, compute_num_frames, compute_num_samples, compute_num_windows, fastcopy,
    fix_random_seed, overlaps, overspans, perturb_num_samples, split_sequence, streaming_shuffle,
    uuid4)


def test_compute_num_frames_golden():
    # Golden from the reference test suite: 16.04 s at 10 ms shift -> 1604.
    assert compute_num_frames(16.04, 0.01, 16000) == 1604
    assert compute_num_frames(1.0, 0.01, 16000) == 100
    assert compute_num_frames(0.5, 0.01, 8000) == 50


def test_compute_num_samples_rounding():
    assert compute_num_samples(1.0, 16000) == 16000
    # Non-banker's rounding: 0.5 rounds up.
    assert compute_num_samples(0.00003125, 16000) == 1  # 0.5 samples -> 1


def test_perturb_num_samples():
    assert perturb_num_samples(16000, 1.1) == 14545
    # Not exactly invertible: 14545 * 1.1 = 15999.5 rounds half-down for
    # factors < 1 (matching the reference semantics).
    assert perturb_num_samples(14545, 1 / 1.1) == 15999


def test_add_durations():
    assert add_durations(1.0, 2.0, sampling_rate=16000) == 3.0
    out = add_durations(0.1, 0.2, 0.3, sampling_rate=16000)
    assert abs(out - 0.6) < 1e-9


def test_compute_num_windows():
    # Examples from the reference docstring (utils.py:437).
    cases = [
        ((1, 6.1, 3), 1), ((3, 1, 6.1), 1), ((3, 6.1, 1), 1), ((5.9, 1, 3), 2), ((5.9, 3, 1), 4),
        ((6.1, 1, 3), 3), ((6.1, 3, 1), 5), ((5.9, 3, 3), 2), ((6.1, 3, 3), 3), ((0.0, 3, 3), 0)]
    for args, expected in cases:
        assert compute_num_windows(*args) == expected, args


def test_split_sequence():
    splits = split_sequence(list(range(32)), 3)
    assert [len(s) for s in splits] == [11, 11, 10]
    assert sum(splits, []) == list(range(32))
    splits = split_sequence(list(range(32)), 3, drop_last=True)
    assert [len(s) for s in splits] == [10, 10, 10]


def test_overlaps_overspans():
    a, b = TimeSpan(0, 2), TimeSpan(1, 3)
    assert overlaps(a, b)
    assert not overlaps(TimeSpan(0, 1), TimeSpan(1, 2))
    assert overspans(TimeSpan(0, 5), TimeSpan(1, 2))
    assert not overspans(TimeSpan(1, 2), TimeSpan(0, 5))


def test_fix_random_seed_uuid_deterministic():
    fix_random_seed(0)
    a = uuid4()
    fix_random_seed(0)
    b = uuid4()
    assert a == b


def test_streaming_shuffle_is_permutation():
    import random

    data = list(range(1000))
    out = list(streaming_shuffle(iter(data), bufsize=100, rng=random.Random(0)))
    assert sorted(out) == data
    assert out != data


def test_fastcopy():
    ts = TimeSpan(start=5, end=10)
    ts2 = fastcopy(ts, end=12)
    assert ts2.start == 5 and ts2.end == 12
