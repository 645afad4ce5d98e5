"""
Feature-storage backend round trips (reference surface: lhotse/features/io.py).

Covers every writer/reader pair available in this environment (hdf5 and
kaldi_native_io backends are pip-gated and exercised in
test_degraded_installs.py instead), partial temporal reads, and the
flush-before-manifest-handout contract of FeatureSetBuilder.
"""
import numpy as np
import pytest

from lhotse_tpu.features.io import (
    LilcomChunkyReader,
    LilcomChunkyWriter,
    LilcomFilesReader,
    LilcomFilesWriter,
    MemoryLilcomReader,
    MemoryLilcomWriter,
    MemoryNpyReader,
    MemoryNpyWriter,
    MemoryRawReader,
    MemoryRawWriter,
    NumpyFilesReader,
    NumpyFilesWriter,
    get_reader,
)

LILCOM_TOL = 2.0**-5  # tick_power=-5 quantization bound


@pytest.fixture
def feats():
    rng = np.random.default_rng(1234)
    return rng.normal(size=(230, 80)).astype(np.float32)


def _roundtrip_error(writer, reader_cls, feats, lossy):
    key = writer.write("utt1", feats)
    writer.flush()
    reader = reader_cls(writer.storage_path)
    out = reader.read(key)
    assert out.shape == feats.shape
    err = np.abs(out - feats).max()
    assert err <= (LILCOM_TOL if lossy else 0.0)
    return key, reader


@pytest.mark.parametrize(
    "writer_cls, reader_cls, lossy",
    [
        (LilcomChunkyWriter, LilcomChunkyReader, True),
        (LilcomFilesWriter, LilcomFilesReader, True),
        (NumpyFilesWriter, NumpyFilesReader, False),
    ],
)
def test_file_backend_roundtrip(tmp_path, feats, writer_cls, reader_cls, lossy):
    with writer_cls(str(tmp_path / "store")) as writer:
        key, reader = _roundtrip_error(writer, reader_cls, feats, lossy)
        # Partial temporal read agrees with slicing the full array.
        part = reader.read(key, left_offset_frames=37, right_offset_frames=198)
        np.testing.assert_array_equal(part, reader.read(key)[37:198])


@pytest.mark.parametrize(
    "writer_cls, reader_cls, lossy",
    [
        (MemoryLilcomWriter, MemoryLilcomReader, True),
        (MemoryRawWriter, MemoryRawReader, False),
        (MemoryNpyWriter, MemoryNpyReader, False),
    ],
)
def test_memory_backend_roundtrip(feats, writer_cls, reader_cls, lossy):
    writer = writer_cls()
    blob = writer.write("utt1", feats)
    assert isinstance(blob, bytes)
    out = reader_cls().read(blob)
    err = np.abs(out - feats).max()
    assert err <= (LILCOM_TOL if lossy else 0.0)


def test_chunky_multi_array_offsets(tmp_path):
    """Keys encode absolute+relative offsets; arrays interleave in one file."""
    rng = np.random.default_rng(7)
    arrays = [rng.normal(size=(n, 40)).astype(np.float32) for n in (120, 501, 999, 73)]
    with LilcomChunkyWriter(str(tmp_path / "feats")) as w:
        keys = [w.write(f"utt{i}", a) for i, a in enumerate(arrays)]
        w.flush()
        r = LilcomChunkyReader(w.storage_path)
        for key, a in zip(keys, arrays):
            assert np.abs(r.read(key) - a).max() <= LILCOM_TOL
            # Partial read touching only the middle chunk of the 999-frame one.
            mid = r.read(key, left_offset_frames=50, right_offset_frames=70)
            assert np.abs(mid - a[50:70]).max() <= LILCOM_TOL


def test_builder_manifests_loadable_before_close(tmp_path):
    """Regression: process_and_store_recordings must flush buffered writers so
    the returned manifests are immediately loadable (found 2026-08-16: the
    chunky archive held the whole payload in the BufferedWriter and load()
    saw an empty/truncated file)."""
    from lhotse_tpu import Fbank, RecordingSet
    from lhotse_tpu.audio.wavio import write_wav
    from lhotse_tpu.features import FeatureSetBuilder

    sr = 16000
    for i in range(3):
        t = np.arange(int(sr * (1.0 + 0.5 * i))) / sr
        write_wav(
            tmp_path / f"rec{i}.wav",
            (0.1 * np.sin(2 * np.pi * (210 + 37 * i) * t)).astype(np.float32),
            sr,
        )
    recs = RecordingSet.from_dir(tmp_path, "*.wav")
    writer = LilcomChunkyWriter(str(tmp_path / "feats"))
    builder = FeatureSetBuilder(feature_extractor=Fbank(), storage=writer)
    featset = builder.process_and_store_recordings(recordings=recs)
    # No close() here on purpose: manifests must already be readable.
    for f in featset:
        full = f.load()
        assert full.shape == (f.num_frames, f.num_features)
        part = f.load(start=0.25, duration=0.5)
        assert 0 < part.shape[0] < full.shape[0]
    writer.close()


def test_get_reader_resolves_registered_names():
    assert get_reader("lilcom_chunky") is LilcomChunkyReader
    assert get_reader("memory_lilcom") is MemoryLilcomReader


def test_builder_parallel_jobs_single_writer(tmp_path):
    """Regression (found 2026-08-17): num_jobs>1 pickled the builder's open
    storage writer into spawn workers and crashed with 'cannot pickle
    BufferedWriter' (the reference has the same latent flaw upstream,
    features/base.py:890-919). Workers now only extract; the parent stores —
    and the result must be identical to the serial path."""
    from lhotse_tpu import Fbank, RecordingSet
    from lhotse_tpu.audio.wavio import write_wav
    from lhotse_tpu.features import FeatureSetBuilder

    sr = 16000
    for i in range(4):
        t = np.arange(int(sr * (0.8 + 0.3 * i))) / sr
        write_wav(
            tmp_path / f"rec{i}.wav",
            (0.1 * np.sin(2 * np.pi * (180 + 55 * i) * t)).astype(np.float32),
            sr,
        )
    recs = RecordingSet.from_dir(tmp_path, "*.wav")

    serial_writer = LilcomChunkyWriter(str(tmp_path / "serial"))
    serial = FeatureSetBuilder(
        feature_extractor=Fbank(), storage=serial_writer
    ).process_and_store_recordings(recordings=recs)
    serial_writer.close()

    par_writer = LilcomChunkyWriter(str(tmp_path / "par"))
    parallel = FeatureSetBuilder(
        feature_extractor=Fbank(), storage=par_writer
    ).process_and_store_recordings(recordings=recs, num_jobs=2)
    par_writer.close()

    assert len(parallel) == len(serial) == len(recs)
    for fs, fp in zip(
        sorted(serial, key=lambda f: f.recording_id),
        sorted(parallel, key=lambda f: f.recording_id),
    ):
        assert fp.recording_id == fs.recording_id
        assert fp.num_frames == fs.num_frames
        np.testing.assert_allclose(fp.load(), fs.load(), atol=1e-4)
