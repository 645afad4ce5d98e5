"""
AudioCache LRU semantics + the dynamic cache switch (reference: caching.py)
and batch visualization (dataset/vis.py) under the Agg backend.
"""
import numpy as np
import pytest

from lhotse_tpu.caching import (
    AudioCache,
    dynamic_lru_cache,
    is_caching_enabled,
    set_caching_enabled,
)


@pytest.fixture(autouse=True)
def reset_cache_state():
    prev = is_caching_enabled()
    AudioCache.clear()
    yield
    set_caching_enabled(prev)
    AudioCache.clear()


def test_audio_cache_hit_and_miss():
    set_caching_enabled(True)
    assert AudioCache.try_cache("k") is None
    AudioCache.add_to_cache("k", b"payload")
    assert AudioCache.try_cache("k") == b"payload"
    assert AudioCache.memory_used() == len(b"payload")


def test_audio_cache_respects_global_switch():
    set_caching_enabled(False)
    AudioCache.add_to_cache("k", b"payload")
    assert AudioCache.try_cache("k") is None
    assert AudioCache.memory_used() == 0


def test_audio_cache_lru_eviction(monkeypatch):
    set_caching_enabled(True)
    monkeypatch.setattr(AudioCache, "max_cache_memory", 100)
    AudioCache.add_to_cache("a", b"x" * 40)
    AudioCache.add_to_cache("b", b"y" * 40)
    assert AudioCache.try_cache("a") is not None  # touch: 'a' becomes MRU
    AudioCache.add_to_cache("c", b"z" * 40)       # evicts LRU ('b')
    assert AudioCache.try_cache("b") is None
    assert AudioCache.try_cache("a") is not None
    assert AudioCache.try_cache("c") is not None
    assert AudioCache.memory_used() <= 100


def test_audio_cache_rejects_oversized_values(monkeypatch):
    set_caching_enabled(True)
    monkeypatch.setattr(AudioCache, "max_cache_memory", 10)
    AudioCache.add_to_cache("big", b"x" * 100)
    assert AudioCache.try_cache("big") is None


def test_dynamic_lru_cache_toggles_with_switch():
    calls = []

    class Reader:
        @dynamic_lru_cache
        def read(self, key):
            calls.append(key)
            return key * 2

    r = Reader()
    set_caching_enabled(True)
    assert r.read("a") == "aa" and r.read("a") == "aa"
    assert calls == ["a"]  # second hit served from cache
    set_caching_enabled(False)
    r.read("a")
    assert calls == ["a", "a"]  # cache bypassed


def test_plot_batch_renders_features_and_audio():
    import matplotlib

    matplotlib.use("Agg")
    from lhotse_tpu.dataset.vis import plot_batch

    rng = np.random.default_rng(0)
    batch = {
        "inputs": rng.normal(size=(2, 120, 80)).astype(np.float32),
        "supervisions": {
            "text": ["hello", "world"],
            "start_frame": np.array([0, 10]),
            "num_frames": np.array([100, 80]),
            "sequence_idx": np.array([0, 1]),
        },
    }
    fig = plot_batch(batch)
    assert fig is not None

    audio_batch = {
        "audio": rng.normal(size=(2, 16000)).astype(np.float32) * 0.1,
        "supervisions": {
            "text": ["a", "b"],
            "start_sample": np.array([0, 100]),
            "num_samples": np.array([8000, 12000]),
            "sequence_idx": np.array([0, 1]),
        },
    }
    fig2 = plot_batch(audio_batch)
    assert fig2 is not None
