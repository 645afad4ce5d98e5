"""
Pins the parity symbols added by the API-diff sweep (tools/apidiff.py) so
drop-in imports written against the reference library keep working.
Reference anchors are cited next to each assertion.
"""
import queue
import random
import tarfile
from io import BytesIO
from pathlib import Path

import numpy as np
import pytest


def test_pytorch_worker_info_alias():
    from lhotse_tpu.shar.readers.utils import pytorch_worker_info, worker_info

    assert pytorch_worker_info is worker_info
    rank, world, worker, num_workers = pytorch_worker_info()
    assert (rank, world, worker, num_workers) == (0, 1, 0, 1)


def test_functional_resample():
    from lhotse_tpu.augmentation.resample import resample, resample_array

    wav = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)[None]
    out = resample(wav, 16000, 8000)
    np.testing.assert_allclose(out, resample_array(wav, 16000, 8000))
    with pytest.raises(ValueError, match="sinc_interp_kaiser"):
        resample(wav, 16000, 8000, resampling_method="sinc_interp_kaiser")


def test_validate_cut_set(tmp_path):
    from lhotse_tpu.qa import validate_cut_set
    from lhotse_tpu.testing.dummies import DummyManifest
    from lhotse_tpu.cut import CutSet

    cuts = DummyManifest(CutSet, begin_id=0, end_id=3)
    validate_cut_set(cuts)  # does not raise


def test_log_mel_spectrogram_matches_whisper_fbank():
    from lhotse_tpu.features.whisper import WhisperFbank, log_mel_spectrogram

    audio = np.random.RandomState(0).randn(16000).astype(np.float32)
    func = log_mel_spectrogram(audio)
    cls = WhisperFbank().extract(audio, 16000)
    assert func.shape == (80, cls.shape[0])
    np.testing.assert_allclose(func.T, cls, atol=1e-5)


def test_buckets_dont_have_enough_data_alias():
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import (
        BucketsDontHaveEnoughData, _DrainedBuffers)

    assert BucketsDontHaveEnoughData is _DrainedBuffers
    assert issubclass(BucketsDontHaveEnoughData, Exception)


def test_pick_at_random_yields_all_and_records_indexes():
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import pick_at_random

    q = queue.Queue()
    for x in "abcde":
        q.put(x)
    used = []
    out = list(pick_at_random(q, random.Random(0), used))
    assert sorted(out) == list("abcde")
    assert sorted(used) == [0, 1, 2, 3, 4]
    # Plain sequences are accepted too.
    assert sorted(pick_at_random([1, 2, 3], random.Random(1), [])) == [1, 2, 3]


def test_bucket_selection_state_alias():
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import BucketSelectionState

    st = BucketSelectionState(random.Random(0), 4, 2)
    a, b, c, d = (st.select_bucket_idx() for _ in range(4))
    # Each draw is reused world_size=2 times (reference dynamic_bucketing.py:557).
    assert a == b and c == d


def test_checkpoint_backend_builders_and_restore_alias():
    from lhotse_tpu.dataset.sampling.checkpoint_backends import (
        IndexedCheckpointBackend, ReplayCheckpointBackend,
        build_dynamic_bucketing_checkpoint_backend,
        build_dynamic_cut_checkpoint_backend)
    from lhotse_tpu.dataset.sampling import DynamicCutSampler
    from lhotse_tpu.testing.dummies import DummyManifest
    from lhotse_tpu.cut import CutSet

    cuts = DummyManifest(CutSet, begin_id=0, end_id=10)
    sampler = DynamicCutSampler(cuts, max_cuts=2, shuffle=False)
    backend = build_dynamic_cut_checkpoint_backend(
        sampler, current_epoch=0, num_batches_to_iter=0)
    assert isinstance(backend, (IndexedCheckpointBackend, ReplayCheckpointBackend))
    assert hasattr(backend, "restore") and hasattr(backend, "run")
    backend2 = build_dynamic_bucketing_checkpoint_backend(
        sampler, current_epoch=0, num_batches_to_iter=0)
    assert hasattr(backend2, "restore")


def test_shard_writer_native(tmp_path):
    from lhotse_tpu.dataset.webdataset import ShardWriter

    pattern = str(tmp_path / "shard-%06d.tar")
    with ShardWriter(pattern, maxcount=2) as w:
        for i in range(5):
            w.write({"__key__": f"s{i}", "txt": f"t{i}", "bin": b"\x00" * 4})
    shards = sorted(Path(tmp_path).glob("shard-*.tar"))
    assert len(shards) == 3
    with tarfile.open(shards[0]) as t:
        assert t.getnames() == ["s0.txt", "s0.bin", "s1.txt", "s1.bin"]
        assert t.extractfile("s0.txt").read() == b"t0"
    assert w.total == 5


def test_create_shard_shuffler_deterministic():
    from lhotse_tpu.dataset.webdataset import create_shard_shuffler

    s1 = create_shard_shuffler(epoch=0)
    s2 = create_shard_shuffler(epoch=0)
    o1, o2 = s1(range(10)), s2(range(10))
    assert o1 == o2 and sorted(o1) == list(range(10))
    # Advancing the epoch changes the permutation.
    assert s1(range(10)) != o1


def test_read_tar_member_at(tmp_path):
    from lhotse_tpu.indexing import read_tar_member_at

    tar_path = tmp_path / "a.tar"
    with tarfile.open(tar_path, "w") as t:
        for name, data in [("x.bin", b"hello"), ("y.nodata", b""), ("z.bin", b"world")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            t.addfile(info, BytesIO(data))
    with open(tar_path, "rb") as fh:
        data, path, info = read_tar_member_at(fh, 0)
        assert data == b"hello" and path.name == "x.bin" and info.size == 5
        # Second member header starts after 512B header + padded payload.
        off2 = 512 + 512
        data2, path2, _ = read_tar_member_at(fh, off2)
        assert data2 is None and path2.suffix == ".nodata"


def test_io_backend_special_cases():
    from lhotse_tpu.serialization import (
        CompositeIOBackend, GzipIOBackend, IOBackend, MSCIOBackend,
        PipeIOBackend, RedirectIOBackend)

    assert IOBackend().handles_special_case("anything") is False
    assert RedirectIOBackend().handles_special_case("-")
    assert PipeIOBackend().handles_special_case("pipe:cat")
    assert GzipIOBackend().handles_special_case("x.jsonl.gz")
    assert not GzipIOBackend().handles_special_case("https://x.com/y.gz")
    assert MSCIOBackend.is_msc_url("msc://p/k") and not MSCIOBackend.is_msc_url("s3://b/k")
    comp = CompositeIOBackend([RedirectIOBackend(), PipeIOBackend()])
    assert comp.handles_special_case("pipe:cat") and not comp.handles_special_case("x.txt")


def test_composite_prefers_special_case_over_order(tmp_path):
    """A special-case handler registered AFTER a broadly-applicable backend
    must still win (reference serialization.py:1062-1069 two-pass open)."""
    from lhotse_tpu.serialization import BuiltinIOBackend, CompositeIOBackend, GzipIOBackend

    p = tmp_path / "data.txt.gz"
    comp = CompositeIOBackend([BuiltinIOBackend(), GzipIOBackend()])
    with comp.open(str(p), "w") as f:
        f.write("payload")
    # Builtin open would return raw gzip bytes; the special-case pass must
    # route through gzip decompression despite Builtin being first.
    with comp.open(str(p), "r") as f:
        assert f.read() == "payload"


def test_chunked_hdf5_reader_honors_stored_chunk_size(tmp_path):
    h5py = pytest.importorskip("h5py")
    from lhotse_tpu.features.io import (
        CHUNK_SIZE_KEY, ChunkedLilcomHdf5Reader, ChunkedLilcomHdf5Writer,
        lookup_chunk_size)

    path = tmp_path / "feats.h5"
    writer = ChunkedLilcomHdf5Writer(str(path))
    # Simulate an archive written with a non-default chunk geometry.
    writer.CHUNK_SIZE = 25
    del writer.hdf[CHUNK_SIZE_KEY]
    writer.hdf.create_dataset(CHUNK_SIZE_KEY, data=25)
    arr = np.random.RandomState(0).randn(100, 8).astype(np.float32)
    key = writer.write("k", arr)
    writer.close()

    reader = ChunkedLilcomHdf5Reader(str(path))
    assert lookup_chunk_size(reader.hdf) == 25
    full = reader.read(key)
    np.testing.assert_allclose(full, arr, atol=2 ** -5)
    # Partial read crossing the custom chunk boundary decodes correctly.
    part = reader.read(key, left_offset_frames=30, right_offset_frames=60)
    np.testing.assert_allclose(part, arr[30:60], atol=2 ** -5)


def test_audio_cache_enable_toggle():
    from lhotse_tpu.caching import AudioCache, is_caching_enabled

    was = is_caching_enabled()
    try:
        AudioCache.enable(True)
        assert AudioCache.enabled()
        AudioCache.add_to_cache("k", b"payload")
        assert AudioCache.try_cache("k") == b"payload"
        AudioCache.enable(False)
        assert not AudioCache.enabled()
        assert AudioCache.try_cache("k") is None
    finally:
        AudioCache.enable(was)


def test_pipe_is_running():
    from lhotse_tpu.utils import Pipe

    p = Pipe("cat", mode="wb")
    assert p.is_running()
    p.close()
    assert not p.is_running()


def test_smart_open_setup_raises_without_package():
    from lhotse_tpu.utils import SmartOpen, is_module_available

    if is_module_available("smart_open"):
        pytest.skip("smart_open installed; gating path not reachable")
    with pytest.raises(ImportError):
        SmartOpen.setup({"timeout": 5})


def test_parse_channel_from_ffmpeg_output():
    from lhotse_tpu.audio.backend import parse_channel_from_ffmpeg_output

    stderr = (
        b"Input #0, wav, from 'x.wav':\n"
        b"  Stream #0:0: Audio: pcm_f32le, 16000 Hz, mono, flt, 512 kb/s\n"
    )
    assert parse_channel_from_ffmpeg_output(stderr) == "mono"
    stereo = b"  Stream #0:0(eng): Audio: pcm_f32le, 48000 Hz, stereo, flt\n"
    assert parse_channel_from_ffmpeg_output(stereo) == "stereo"
    # Undecodable metadata lines are skipped, not fatal.
    mixed = b"\xff\xfe garbage\n  Stream #0:0: Audio: pcm_f32le, 8000 Hz, mono, flt\n"
    assert parse_channel_from_ffmpeg_output(mixed) == "mono"
    with pytest.raises(ValueError):
        parse_channel_from_ffmpeg_output(b"no stream lines here")


def test_ffmpeg_opus_backend_alias():
    from lhotse_tpu.audio.backend import (
        FfmpegSubprocessBackend, FfmpegSubprocessOpusBackend)

    assert FfmpegSubprocessOpusBackend is FfmpegSubprocessBackend


def test_ais_batch_loader_lazy_client():
    from lhotse_tpu.ais.batch_loader import AISBatchLoader, LocalBatchFetcher

    loader = AISBatchLoader()  # must not touch aistore at construction
    assert isinstance(loader.fetcher, LocalBatchFetcher)
    with pytest.raises(AttributeError, match="no AIStore client"):
        loader.client


def test_plot_alignment(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from lhotse_tpu.supervision import AlignmentItem
    from lhotse_tpu.testing.dummies import dummy_cut, dummy_supervision

    c = dummy_cut(0, with_data=True, supervisions=[dummy_supervision(0, duration=1.0)])
    c.supervisions[0] = c.supervisions[0].with_alignment(
        "word", [AlignmentItem("hi", 0.0, 0.5), AlignmentItem("yo", 0.5, 0.5)])
    fig = c.plot_alignment()
    assert fig is not None
    with pytest.raises(AssertionError):
        dummy_cut(1, with_data=True).plot_alignment()


def test_deprecated_warning_category():
    import warnings

    from lhotse_tpu.utils import DeprecatedWarning, deprecated

    @deprecated("use something else")
    def old():
        return 42

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert old() == 42
    assert any(issubclass(x.category, DeprecatedWarning) for x in w)


def test_python_literal_option():
    from lhotse_tpu.utils import PythonLiteralOption

    opt = PythonLiteralOption(["--parts"])
    assert opt.type_cast_value(None, "['a','b']") == ["a", "b"]
    assert opt.type_cast_value(None, "['solo']") == "solo"
    assert opt.type_cast_value(None, "3") == 3
    assert opt.type_cast_value(None, "not a literal") is None


def test_whisper_functional_custom_filters_and_window():
    from lhotse_tpu.features.whisper import log_mel_spectrogram, slaney_mel_filters

    audio = np.random.RandomState(1).randn(8000).astype(np.float32)
    filters = slaney_mel_filters(16000, 400, 40)
    out = log_mel_spectrogram(audio, filters=filters, n_mels=40)
    assert out.shape[0] == 40


def _tiny_cuts(tmp_path, n=6):
    from lhotse_tpu.audio.recording import Recording
    from lhotse_tpu.audio.wavio import write_wav
    from lhotse_tpu.cut.set import CutSet
    from lhotse_tpu.supervision import SupervisionSegment

    rng = np.random.RandomState(5)
    out = []
    for i in range(n):
        p = tmp_path / f"r{i}.wav"
        write_wav(str(p), (rng.randn(8000) * 0.1).astype(np.float32), 16000)
        c = Recording.from_file(p, recording_id=f"r{i}").to_cut()
        c.supervisions = [
            SupervisionSegment(id=f"s{i}", recording_id=f"r{i}", start=0, duration=c.duration)
        ]
        out.append(c)
    return CutSet.from_cuts(out)


def test_from_shar_indexes_root(tmp_path):
    """Reference: CutSet.from_shar(indexes_root=...) mirrors missing .idx files
    under a user-owned root (/root/reference/lhotse/cut/set.py:484)."""
    from lhotse_tpu.cut.set import CutSet

    cuts = _tiny_cuts(tmp_path)
    shar = tmp_path / "shar"
    shar.mkdir()
    cuts.to_shar(shar, fields={"recording": "wav"}, shard_size=2,
                 compress_jsonl=False, create_index=False, verbose=False)
    root = tmp_path / "idxroot"
    cs = CutSet.from_shar(in_dir=shar, indexes_root=root)
    got = [c.id for c in cs]
    assert sorted(got) == sorted(c.id for c in cuts)
    assert cs[3].id == got[3]  # random access proves the indexed reader was chosen
    assert list(root.rglob("*.idx"))
    with pytest.raises(ValueError, match="contradictory"):
        CutSet.from_shar(in_dir=shar, indexes_root=root, indexed=False)


def test_from_jsonl_lazy_shuffle(tmp_path):
    """Reference: from_jsonl_lazy(shuffle=True) gives index-backed shuffled
    iteration (/root/reference/lhotse/serialization.py:405)."""
    from lhotse_tpu.cut.set import CutSet

    cuts = _tiny_cuts(tmp_path, n=12)
    p = tmp_path / "cuts.jsonl"
    cuts.to_file(p)
    cs = CutSet.from_jsonl_lazy(p, shuffle=True, seed=7)
    ids = [c.id for c in cs]
    assert sorted(ids) == sorted(c.id for c in cuts)
    assert ids != [c.id for c in cuts]
    # plain call keeps the cheap streaming iterator
    assert [c.id for c in CutSet.from_jsonl_lazy(p)] == [c.id for c in cuts]


def test_sampler_deprecated_compat_args(tmp_path):
    """Reference samplers accept legacy strict/shuffle_buffer_size kwargs
    (/root/reference/lhotse/dataset/sampling/dynamic_bucketing.py:48)."""
    import warnings

    from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import DynamicBucketingSampler

    cuts = _tiny_cuts(tmp_path)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        DynamicCutSampler(cuts.repeat(), max_duration=10, strict=True)
        b = DynamicBucketingSampler(
            cuts.repeat(), max_duration=10, num_buckets=2,
            strict=False, shuffle_buffer_size=100)
    assert any("strict" in str(x.message) for x in w)
    assert any("shuffle_buffer_size" in str(x.message) for x in w)
    assert len(next(iter(b))) > 0
    # no warnings on the clean call path
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        DynamicCutSampler(cuts.repeat(), max_duration=10)
    assert not [x for x in w if issubclass(x.category, DeprecationWarning)]
