"""DecodedAudioCache: decoded-sample LRU for reused short assets (noise
pools, RIRs). Windows served from cache must be sample-exact vs direct
decoder reads."""
import numpy as np
import pytest

from lhotse_tpu import Recording, set_caching_enabled
from lhotse_tpu.audio.wavio import write_wav
from lhotse_tpu.audio.flacio import write_flac
from lhotse_tpu.caching import DecodedAudioCache

SR = 16000


@pytest.fixture(autouse=True)
def _caching_off_after():
    yield
    set_caching_enabled(False)


def _make(tmp_path, name, writer, seconds=2.0):
    rng = np.random.RandomState(hash(name) % 2**31)
    sig = (0.2 * rng.randn(int(SR * seconds))).astype(np.float32)
    path = tmp_path / name
    writer(str(path), sig, SR)
    return Recording.from_file(path)


@pytest.mark.parametrize(
    "name,writer", [("a.wav", write_wav), ("b.flac", write_flac)]
)
@pytest.mark.parametrize("window", [(0.0, None), (0.333, 0.77), (1.0, 1.0), (0.5, None)])
def test_cached_window_equals_direct_read(tmp_path, name, writer, window):
    rec = _make(tmp_path, name, writer)
    offset, duration = window
    direct = rec.load_audio(offset=offset, duration=duration)

    set_caching_enabled(True)
    DecodedAudioCache.clear()
    first = rec.load_audio(offset=offset, duration=duration)  # probation
    assert DecodedAudioCache.memory_used() == 0, "one-shot reads must not cache"
    second = rec.load_audio(offset=offset, duration=duration)  # populates
    assert DecodedAudioCache.memory_used() > 0
    third = rec.load_audio(offset=offset, duration=duration)  # serves
    np.testing.assert_array_equal(direct, first)
    np.testing.assert_array_equal(direct, second)
    np.testing.assert_array_equal(direct, third)


def test_disabled_by_default(tmp_path):
    rec = _make(tmp_path, "c.wav", write_wav)
    DecodedAudioCache.clear()
    rec.load_audio()
    assert DecodedAudioCache.memory_used() == 0


def test_long_recordings_not_cached(tmp_path, monkeypatch):
    rec = _make(tmp_path, "d.wav", write_wav, seconds=2.0)
    set_caching_enabled(True)
    DecodedAudioCache.clear()
    monkeypatch.setattr(DecodedAudioCache, "max_item_samples", 1000)
    rec.load_audio()
    assert DecodedAudioCache.memory_used() == 0


def test_lru_eviction_respects_cap(tmp_path, monkeypatch):
    set_caching_enabled(True)
    DecodedAudioCache.clear()
    # Each 2 s mono f32 recording is 128 KB; cap to ~2.5 of them.
    monkeypatch.setattr(DecodedAudioCache, "max_cache_memory", 320 * 1024)
    recs = [_make(tmp_path, f"e{i}.wav", write_wav) for i in range(4)]
    for r in recs:
        r.load_audio()  # probation pass
    for r in recs:
        r.load_audio()  # caching pass
    assert 0 < DecodedAudioCache.memory_used() <= 320 * 1024


def test_memory_source_keyed_by_content(tmp_path):
    rec = _make(tmp_path, "f.wav", write_wav)
    mem1 = rec.move_to_memory()
    set_caching_enabled(True)
    DecodedAudioCache.clear()
    a = mem1.load_audio()
    b = mem1.load_audio()
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, rec.load_audio())


def test_cache_returns_writable_private_copies(tmp_path):
    rec = _make(tmp_path, "g.wav", write_wav)
    set_caching_enabled(True)
    DecodedAudioCache.clear()
    rec.load_audio()  # probation
    a = rec.load_audio()  # populates
    a[:] = 0.0  # caller mutation must not corrupt the cache
    b = rec.load_audio()  # served from cache
    assert not np.allclose(b, 0.0)
    b[:] = 0.0
    c = rec.load_audio()
    assert not np.allclose(c, 0.0)


# ---------------------------------------------------------------------------
# Post-transform window memoization (Recording._transformed_cache_key):
# deterministic transform chains cache the FINISHED window, so warm epochs
# skip decode + DSP; hits must be bit-exact with cold loads.
# ---------------------------------------------------------------------------
def test_transformed_window_cached_and_bit_exact(tmp_path, monkeypatch):
    rec = _make(tmp_path, "c.wav", write_wav).perturb_speed(1.1)
    cold = rec.load_audio(offset=0.25, duration=1.0)

    set_caching_enabled(True)
    DecodedAudioCache.clear()
    import lhotse_tpu.augmentation.transforms as tr

    calls = {"n": 0}
    orig = tr.Speed.__call__

    def counting(self, samples, sampling_rate):
        calls["n"] += 1
        return orig(self, samples, sampling_rate)

    monkeypatch.setattr(tr.Speed, "__call__", counting)
    first = rec.load_audio(offset=0.25, duration=1.0)   # probation
    second = rec.load_audio(offset=0.25, duration=1.0)  # computes + caches
    third = rec.load_audio(offset=0.25, duration=1.0)   # pure cache hit
    assert calls["n"] == 2, "third load must skip the transform chain"
    for got in (first, second, third):
        np.testing.assert_array_equal(cold, got)
    # The cached entry is detached: mutating a returned window must not
    # poison later hits.
    third[...] = -1.0
    fourth = rec.load_audio(offset=0.25, duration=1.0)
    np.testing.assert_array_equal(cold, fourth)


def test_transformed_window_keys_are_chain_and_window_specific(tmp_path):
    base = _make(tmp_path, "d.wav", write_wav)
    sp11 = base.perturb_speed(1.1)
    sp09 = base.perturb_speed(0.9)
    set_caching_enabled(True)
    DecodedAudioCache.clear()
    for _ in range(3):  # past probation for every key
        a = sp11.load_audio(offset=0.0, duration=1.0)
        b = sp09.load_audio(offset=0.0, duration=1.0)
        c = sp11.load_audio(offset=0.5, duration=1.0)
    assert not np.array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(a, sp11.load_audio(offset=0.0, duration=1.0))


def test_random_rir_chain_is_not_memoized(tmp_path):
    """A generator-backed reverb draws a fresh room per call — the window
    cache must refuse it (is_deterministic=False) or repeats would freeze
    the augmentation distribution."""
    rec = _make(tmp_path, "e.wav", write_wav).reverb_rir(room_rng_seed=7)
    chain = [
        t for t in (rec.transforms or [])
    ]
    from lhotse_tpu.augmentation.transform import AudioTransform

    built = [
        t if isinstance(t, AudioTransform) else AudioTransform.from_dict(t)
        for t in chain
    ]
    assert any(not t.is_deterministic for t in built)
    set_caching_enabled(True)
    DecodedAudioCache.clear()
    outs = [rec.load_audio(duration=1.0) for _ in range(3)]
    assert not np.array_equal(outs[1], outs[2]), "random reverb must stay random"
