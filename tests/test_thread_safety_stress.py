"""
Thread-safety stress (SURVEY §5.2): concurrent random-access reads through
shared Shar pointer handles, and concurrent AudioCache traffic. Races here
manifest as exceptions, short reads, or corrupted payloads.
"""
import threading

import numpy as np
import pytest

from lhotse_tpu import CutSet, Recording
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.caching import AudioCache, set_caching_enabled
from lhotse_tpu.supervision import SupervisionSegment

SR = 16000
N = 12
THREADS = 8
ROUNDS = 30


@pytest.fixture
def shar_cuts(tmp_path):
    out = []
    rng = np.random.RandomState(0)
    for i in range(N):
        p = tmp_path / f"r{i}.wav"
        write_wav(str(p), (0.1 * rng.randn(SR // 2)).astype(np.float32), SR)
        c = Recording.from_file(p, recording_id=f"r{i}").to_cut()
        c.supervisions = [
            SupervisionSegment(
                id=f"s{i}", recording_id=f"r{i}", start=0, duration=c.duration)
        ]
        out.append(c)
    shar_dir = tmp_path / "shar"
    CutSet.from_cuts(out).to_shar(
        shar_dir, fields={"recording": "wav"}, shard_size=4,
        compress_jsonl=False, create_index=True, verbose=False)
    return shar_dir


def test_concurrent_shar_pointer_reads(shar_cuts):
    cuts = CutSet.from_shar(in_dir=shar_cuts, indexed=True)
    # ONE shared reader object across all threads: pointer reads go through
    # shared per-tar file handles guarded by locks.
    expected = {c.id: c.load_audio() for c in cuts}
    errors = []
    mismatches = []
    barrier = threading.Barrier(THREADS)

    def worker(seed):
        rng = np.random.RandomState(seed)
        barrier.wait()
        try:
            for _ in range(ROUNDS):
                k = int(rng.randint(0, N))
                cut = cuts.data[k]
                audio = cut.load_audio()
                if not np.array_equal(audio, expected[cut.id]):
                    mismatches.append(cut.id)
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors[:3]
    assert not mismatches, mismatches[:5]


def test_concurrent_audio_cache_traffic():
    set_caching_enabled(True)
    try:
        AudioCache.clear()
        payloads = {f"key{i}": bytes([i % 256]) * (100 + i) for i in range(50)}
        errors = []
        barrier = threading.Barrier(THREADS)

        def worker(seed):
            rng = np.random.RandomState(seed)
            barrier.wait()
            try:
                for _ in range(200):
                    k = f"key{int(rng.randint(0, 50))}"
                    if rng.rand() < 0.5:
                        AudioCache.add_to_cache(k, payloads[k])
                    else:
                        got = AudioCache.try_cache(k)
                        if got is not None and got != payloads[k]:
                            errors.append(f"corrupt read for {k}")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

        threads = [
            threading.Thread(target=worker, args=(s,)) for s in range(THREADS)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors[:3]
    finally:
        AudioCache.clear()
        set_caching_enabled(False)


def test_threadpool_loader_over_indexed_shar(shar_cuts):
    """End-to-end: the DataLoader's thread-pool assembly mode reading audio
    through a SHARED indexed-Shar reader must produce byte-identical batches
    to serial assembly (this exact path corrupted reads before the
    os.pread fix)."""
    from lhotse_tpu.dataset import DataLoader
    from lhotse_tpu.dataset.sampling.simple import SimpleCutSampler

    cuts = CutSet.from_shar(in_dir=shar_cuts, indexed=True).to_eager()

    class AudioDataset:
        def __getitem__(self, batch):
            return {c.id: c.load_audio() for c in batch}

    serial = [
        AudioDataset()[b] for b in SimpleCutSampler(cuts, max_cuts=3, shuffle=False)
    ]
    loader = DataLoader(
        SimpleCutSampler(cuts, max_cuts=3, shuffle=False),
        AudioDataset(),
        num_thread_workers=4,
        prefetch_batches=4,
    )
    threaded = list(loader)
    assert len(threaded) == len(serial)
    for a, b in zip(serial, threaded):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


@pytest.mark.parametrize("writer_name", ["numpy_hdf5", "lilcom_chunky"])
def test_concurrent_feature_storage_reads(tmp_path, writer_name):
    """h5py's internal lock and the chunky reader's per-call open make
    concurrent reads through feature storage safe — pin it."""
    from lhotse_tpu.features.io import LilcomChunkyWriter, NumpyHdf5Writer, get_reader

    writer_cls = NumpyHdf5Writer if writer_name == "numpy_hdf5" else LilcomChunkyWriter
    rng0 = np.random.RandomState(0)
    mats = {
        f"k{i}": rng0.randn(60 + i, 16).astype(np.float32) for i in range(12)
    }
    keys = {}
    with writer_cls(str(tmp_path / "store")) as w:
        for k, m in mats.items():
            keys[k] = w.write(k, m)
        storage_type, real_path = w.name, str(w.storage_path)

    errors = []
    barrier = threading.Barrier(THREADS)

    def worker(seed):
        try:
            rng = np.random.RandomState(seed)
            reader = get_reader(storage_type)(real_path)
            barrier.wait()
            for _ in range(60):
                k = f"k{int(rng.randint(0, 12))}"
                got = reader.read(keys[k])
                tol = 2**-4 if writer_name == "lilcom_chunky" else 0
                if not np.allclose(got, mats[k], atol=tol):
                    errors.append(f"corrupt {k}")
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors[:3]
