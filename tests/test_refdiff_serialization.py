"""
Serialization-format interchange differential: every manifest format one
implementation writes (.jsonl.gz / .jsonl / .json / .yaml / .yaml.gz) must
load identically in the other, both directions.

Reference: lhotse/serialization.py (format dispatch by extension).
"""
import copy

import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    from lhotse import (
        CutSet as RefCutSet,
        RecordingSet as RefRecordingSet,
        SupervisionSet as RefSupervisionSet,
        load_manifest as ref_load_manifest,
    )

from lhotse_tpu import (
    CutSet as MyCutSet,
    RecordingSet as MyRecordingSet,
    SupervisionSet as MySupervisionSet,
    load_manifest as my_load_manifest,
)

SR = 16000


def _dicts():
    recs, sups, cuts = [], [], []
    for i in range(3):
        n = SR * (i + 1)
        recs.append(
            {
                "id": f"rec{i}",
                "sources": [
                    {"type": "file", "channels": [0], "source": f"/x/rec{i}.wav"}
                ],
                "sampling_rate": SR,
                "num_samples": n,
                "duration": float(i + 1),
            }
        )
        sups.append(
            {
                "id": f"sup{i}",
                "recording_id": f"rec{i}",
                "start": 0.25,
                "duration": 0.5,
                "channel": 0,
                "text": f"text {i} ąćę 中文",
                "speaker": f"spk{i}",
                "custom": {"x": [1, 2, 3], "y": {"nested": True}},
            }
        )
        cuts.append(
            {
                "id": f"cut{i}",
                "start": 0.0,
                "duration": float(i + 1),
                "channel": 0,
                "recording": copy.deepcopy(recs[-1]),
                "supervisions": [copy.deepcopy(sups[-1])],
                "type": "MonoCut",
            }
        )
    return recs, sups, cuts


FORMATS = ["jsonl.gz", "jsonl", "json", "yaml", "yaml.gz"]


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("kind", ["recordings", "supervisions", "cuts"])
def test_cross_format_interchange(tmp_path, fmt, kind):
    recs, sups, cuts = _dicts()
    data = {"recordings": recs, "supervisions": sups, "cuts": cuts}[kind]
    ref_cls = {
        "recordings": RefRecordingSet,
        "supervisions": RefSupervisionSet,
        "cuts": RefCutSet,
    }[kind]
    my_cls = {
        "recordings": MyRecordingSet,
        "supervisions": MySupervisionSet,
        "cuts": MyCutSet,
    }[kind]

    ref_obj = ref_cls.from_dicts(copy.deepcopy(data))
    my_obj = my_cls.from_dicts(copy.deepcopy(data))

    # ours -> written -> read by reference
    mine_path = tmp_path / f"mine.{fmt}"
    my_obj.to_file(mine_path)
    back_ref = ref_load_manifest(mine_path)
    assert [x.to_dict() for x in back_ref] == [x.to_dict() for x in ref_obj]

    # reference -> written -> read by us
    ref_path = tmp_path / f"ref.{fmt}"
    ref_obj.to_file(ref_path)
    back_my = my_load_manifest(ref_path)
    assert [x.to_dict() for x in back_my] == [x.to_dict() for x in my_obj]
