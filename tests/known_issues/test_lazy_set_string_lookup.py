"""
Regression pin: ``set[string_id]`` on a LAZY RecordingSet / SupervisionSet /
CutSet used to compare enumerate positions against the string and raise a
bare StopIteration; string lookups must match by id on lazy backends, int
lookups by position, with KeyError/IndexError on misses.
"""
import pytest

from lhotse_tpu import CutSet, RecordingSet, SupervisionSet
from lhotse_tpu.testing.dummies import DummyManifest


@pytest.mark.parametrize("cls", [RecordingSet, SupervisionSet, CutSet])
def test_lazy_string_and_int_lookup(cls, tmp_path):
    eager = DummyManifest(cls, begin_id=0, end_id=5)
    path = tmp_path / "manifest.jsonl.gz"
    eager.to_file(path)
    lazy = cls.from_jsonl_lazy(path)
    assert lazy.is_lazy

    wanted = list(eager)[3]
    assert lazy[wanted.id].id == wanted.id
    assert lazy[3].id == wanted.id

    with pytest.raises(KeyError):
        lazy["definitely-not-an-id"]
    with pytest.raises(IndexError):
        lazy[999]
