"""
Validation-behavior differential vs the ACTUAL reference: the same crafted
manifest defects through both implementations' validators — both must agree
on what is acceptable (reference lhotse/qa.py).

Also pins a reference crash we fixed: its SupervisionSet/RecordingSet
validators do ``Counter().most_common(1)[0]`` and IndexError on EMPTY
manifests (reference qa.py:453,464) — empty sets are legal (e.g. a corpus
part with no annotations).
"""
import copy

import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    from lhotse import (
        RecordingSet as RefRecordingSet,
        SupervisionSet as RefSupervisionSet,
    )
    from lhotse.qa import (
        validate_recordings_and_supervisions as ref_validate_pair,
    )

from lhotse_tpu import (
    RecordingSet as MyRecordingSet,
    SupervisionSet as MySupervisionSet,
)
from lhotse_tpu.qa import validate_recordings_and_supervisions as my_validate_pair

SR = 16000


def _rec(i, dur_ms):
    n = int(round(dur_ms * SR / 1000))
    return {
        "id": f"rec{i}",
        "sources": [{"type": "file", "channels": [0], "source": f"/x/rec{i}.wav"}],
        "sampling_rate": SR,
        "num_samples": n,
        "duration": n / SR,
    }


def _sup(i, rec, start_ms, dur_ms, channel=0, **kw):
    return {
        "id": f"sup{i}",
        "recording_id": f"rec{rec}",
        "start": start_ms / 1000,
        "duration": dur_ms / 1000,
        "channel": channel,
        "text": "t",
        **kw,
    }


CASES = [
    ("valid", [_rec(0, 2000)], [_sup(0, 0, 0, 1000)], True),
    ("sup-beyond-end", [_rec(0, 1000)], [_sup(0, 0, 500, 1000)], False),
    ("sup-bad-channel", [_rec(0, 2000)], [_sup(0, 0, 0, 500, channel=3)], False),
    ("sup-unknown-recording", [_rec(0, 2000)], [_sup(0, 9, 0, 500)], False),
    (
        "negative-start",
        [_rec(0, 2000)],
        [_sup(0, 0, -200, 500)],
        False,
    ),
]


@pytest.mark.parametrize("name, recs, sups, ok", CASES, ids=[c[0] for c in CASES])
def test_pair_validation_agreement(name, recs, sups, ok):
    their_r = RefRecordingSet.from_dicts(copy.deepcopy(recs))
    their_s = RefSupervisionSet.from_dicts(copy.deepcopy(sups))
    my_r = MyRecordingSet.from_dicts(copy.deepcopy(recs))
    my_s = MySupervisionSet.from_dicts(copy.deepcopy(sups))

    def outcome(fn, *args):
        try:
            fn(*args)
            return True
        except Exception:
            return False

    theirs = outcome(ref_validate_pair, their_r, their_s)
    mine = outcome(my_validate_pair, my_r, my_s)
    assert theirs == mine == ok, f"{name}: reference={theirs}, mine={mine}, expected={ok}"


def test_empty_manifests_validate_here_but_crash_reference():
    """Empty sets are legal here; the reference's validator IndexErrors."""
    my_validate_pair(MyRecordingSet.from_dicts([]), MySupervisionSet.from_dicts([]))
    with pytest.raises(Exception):
        ref_validate_pair(
            RefRecordingSet.from_dicts([]), RefSupervisionSet.from_dicts([])
        )
