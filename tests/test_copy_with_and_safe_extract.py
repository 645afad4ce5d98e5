"""
copy_with() semantics across manifest types, and safe archive extraction
(path-traversal rejection).

Behavioral models: /root/reference/test/test_copy_with.py and
test/test_utils.py::test_extract_[un]safe_tar_file.
"""
import io
import tarfile

import pytest

from lhotse_tpu import SupervisionSegment
from lhotse_tpu.testing.dummies import (
    dummy_cut,
    dummy_features,
    dummy_recording,
    dummy_supervision,
    dummy_temporal_array,
)
from lhotse_tpu.utils import fastcopy, safe_extract


# ---------------------------------------------------------------------------
# copy_with
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "make,field,value",
    [
        (lambda: dummy_recording(0), "id", "new-id"),
        (lambda: dummy_supervision(0), "text", "changed"),
        (lambda: dummy_features(0), "num_frames", 123),
        (lambda: dummy_cut(0), "duration", 0.7),
        (lambda: dummy_temporal_array(), "frame_shift", 0.02),
    ],
)
def test_copy_with_overwrites_field_without_mutating(make, field, value):
    original = make()
    before = getattr(original, field)
    clone = original.copy_with(**{field: value})
    assert getattr(clone, field) == value
    assert getattr(original, field) == before
    assert type(clone) is type(original)


def test_copy_with_no_kwargs_is_equal_copy():
    cut = dummy_cut(0)
    clone = cut.copy_with()
    assert clone == cut
    assert clone is not cut


def test_copy_with_matches_fastcopy():
    sup = dummy_supervision(0)
    assert sup.copy_with(text="x") == fastcopy(sup, text="x")


def test_copy_with_sets_custom_dict_on_supervision():
    # copy_with takes dataclass FIELDS — custom values go through the
    # `custom` dict (reference parity: test_copy_with.py).
    sup = SupervisionSegment(id="s", recording_id="r", start=0.0, duration=1.0)
    clone = sup.copy_with(custom={"speaker_age": 42})
    assert clone.speaker_age == 42
    with pytest.raises(AttributeError):
        sup.speaker_age  # original untouched
    with pytest.raises(TypeError):
        sup.copy_with(snr=7.5)  # not a dataclass field


# ---------------------------------------------------------------------------
# safe_extract
# ---------------------------------------------------------------------------
def _tar_with_member(name):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name)
        payload = b"hello"
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    buf.seek(0)
    return tarfile.open(fileobj=buf)


def test_extract_safe_tar_file(tmp_path):
    with _tar_with_member("inner/data.txt") as tf:
        safe_extract(tf, path=tmp_path)
    assert (tmp_path / "inner" / "data.txt").read_bytes() == b"hello"


def test_extract_unsafe_tar_file_traversal_rejected(tmp_path):
    with _tar_with_member("../evil.txt") as tf:
        with pytest.raises(Exception, match="[Pp]ath [Tt]raversal|outside"):
            safe_extract(tf, path=tmp_path / "sub")
    assert not (tmp_path / "evil.txt").exists()


def test_extract_unsafe_absolute_path_rejected(tmp_path):
    with _tar_with_member("/abs/evil.txt") as tf:
        try:
            safe_extract(tf, path=tmp_path)
        except Exception:
            pass  # rejecting is fine too
    # Either way nothing may land outside the target directory.
    import os

    assert not os.path.exists("/abs/evil.txt")
