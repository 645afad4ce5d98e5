"""
Shar writer matrix: TarWriter sharding/naming/offsets, audio format
choices, custom non-data attributes, include_cuts, transform baking, and
temporal-array window truncation.

Behavioral model: /root/reference/test/shar/test_write.py.
"""
import io
import tarfile

import numpy as np
import pytest

from lhotse_tpu import CutSet, MonoCut, Recording, SupervisionSegment
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.features.io import NumpyHdf5Writer
from lhotse_tpu.shar.writers.tar import TarWriter

SR = 16000


def _cut(tmp_path, name, seconds=1.0, freq=220.0):
    n = int(seconds * SR)
    p = tmp_path / f"{name}.wav"
    write_wav(
        str(p),
        (0.1 * np.sin(2 * np.pi * freq * np.arange(n) / SR)).astype(np.float32),
        SR,
    )
    rec = Recording.from_file(p, recording_id=name)
    return MonoCut(
        id=name, start=0.0, duration=seconds, channel=0, recording=rec,
        supervisions=[
            SupervisionSegment(
                id=f"{name}-s", recording_id=name, start=0.0, duration=seconds)])


# ---------------------------------------------------------------------------
# TarWriter
# ---------------------------------------------------------------------------
def test_tar_writer_shards_and_names(tmp_path):
    with TarWriter(str(tmp_path / "data.%06d.tar"), shard_size=2) as w:
        for i in range(5):
            w.write(f"blob{i}", io.BytesIO(bytes([i]) * 10))
    names = sorted(p.name for p in tmp_path.glob("*.tar"))
    assert names == ["data.000000.tar", "data.000001.tar", "data.000002.tar"]
    with tarfile.open(tmp_path / "data.000002.tar") as tf:
        assert [m.name for m in tf.getmembers()] == ["blob4"]


def test_tar_writer_shard_offset(tmp_path):
    with TarWriter(
        str(tmp_path / "data.%06d.tar"), shard_size=2, shard_offset=7
    ) as w:
        for i in range(3):
            w.write(f"b{i}", io.BytesIO(b"x"))
    names = sorted(p.name for p in tmp_path.glob("*.tar"))
    assert names == ["data.000007.tar", "data.000008.tar"]


def test_tar_writer_unsharded(tmp_path):
    # A pattern without %d writes ONE tar regardless of item count.
    with TarWriter(str(tmp_path / "all.tar"), shard_size=2) as w:
        for i in range(5):
            w.write(f"b{i}", io.BytesIO(b"y"))
    assert sorted(p.name for p in tmp_path.glob("*.tar")) == ["all.tar"]
    with tarfile.open(tmp_path / "all.tar") as tf:
        assert len(tf.getmembers()) == 5


def test_tar_writer_roundtrip_bytes(tmp_path):
    payloads = {f"item{i}": bytes(range(i, i + 20)) for i in range(4)}
    with TarWriter(str(tmp_path / "d.%06d.tar"), shard_size=10) as w:
        for k, v in payloads.items():
            w.write(k, io.BytesIO(v))
    with tarfile.open(tmp_path / "d.000000.tar") as tf:
        got = {m.name: tf.extractfile(m).read() for m in tf.getmembers()}
    assert got == payloads


# ---------------------------------------------------------------------------
# to_shar writer behaviors
# ---------------------------------------------------------------------------
def test_to_shar_include_cuts_false(tmp_path):
    cuts = CutSet.from_cuts([_cut(tmp_path, f"c{i}") for i in range(3)])
    out = tmp_path / "shar"
    cuts.to_shar(
        out, fields={"recording": "wav"}, shard_size=2, include_cuts=False,
        verbose=False)
    names = {p.name.split(".")[0] for p in out.iterdir()}
    assert "recording" in names
    assert "cuts" not in names


def test_to_shar_custom_nondata_attribute_travels(tmp_path):
    cuts = []
    for i in range(3):
        c = _cut(tmp_path, f"c{i}")
        c.snr_estimate = 4.5 + i
        cuts.append(c)
    out = tmp_path / "shar"
    CutSet.from_cuts(cuts).to_shar(
        out, fields={"recording": "wav"}, shard_size=2, verbose=False
    )
    back = list(CutSet.from_shar(in_dir=out))
    assert [c.snr_estimate for c in back] == [4.5, 5.5, 6.5]


def test_to_shar_bakes_recording_transforms(tmp_path):
    # A lazily-transformed recording must be exported with the transform
    # APPLIED (the payload is the transformed audio), not carried as
    # metadata pointing at audio that no longer matches.
    cut = _cut(tmp_path, "c0")
    quiet = cut.perturb_volume(0.25)
    out = tmp_path / "shar"
    CutSet.from_cuts([quiet]).to_shar(
        out, fields={"recording": "wav"}, shard_size=2, verbose=False
    )
    back = list(CutSet.from_shar(in_dir=out))[0]
    np.testing.assert_allclose(
        back.load_audio(), quiet.load_audio(), atol=2 / 32768
    )


@pytest.mark.parametrize("fmt", ["wav", "flac"])
def test_to_shar_audio_formats(tmp_path, fmt):
    cuts = CutSet.from_cuts([_cut(tmp_path, f"c-{fmt}")])
    out = tmp_path / f"shar_{fmt}"
    cuts.to_shar(out, fields={"recording": fmt}, shard_size=2, verbose=False)
    with tarfile.open(next(out.glob("recording.*.tar"))) as tf:
        exts = {m.name.rsplit(".", 1)[-1] for m in tf.getmembers() if "." in m.name}
    assert fmt in exts
    back = list(CutSet.from_shar(in_dir=out))[0]
    np.testing.assert_allclose(
        back.load_audio(), list(cuts)[0].load_audio(), atol=2 / 32768
    )


def test_to_shar_truncates_temporal_array_to_cut_window(tmp_path):
    base = _cut(tmp_path, "c0", seconds=2.0)
    with NumpyHdf5Writer(str(tmp_path / "arr")) as w:
        base.posteriors = w.store_array(
            "p", np.arange(200, dtype=np.float32), frame_shift=0.01,
            temporal_dim=0, start=0.0)
    window = base.truncate(offset=0.5, duration=1.0)
    out = tmp_path / "shar"
    CutSet.from_cuts([window]).to_shar(
        out, fields={"recording": "wav", "posteriors": "numpy"}, shard_size=2,
        verbose=False)
    back = list(CutSet.from_shar(in_dir=out))[0]
    got = back.load_posteriors()
    # Only the cut's window was exported.
    np.testing.assert_array_equal(got, np.arange(50, 150, dtype=np.float32))
    np.testing.assert_allclose(
        back.load_audio(), window.load_audio(), atol=2 / 32768
    )
