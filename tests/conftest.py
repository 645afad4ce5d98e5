"""
Test configuration: force JAX onto a virtual 8-device CPU mesh so that
multi-chip sharding logic is exercised without TPU hardware (per-axis tests
use subsets of the 8 devices). Must run before anything imports jax.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("_AXON_REGISTERED", None)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def deterministic_rng():
    """Seed all host RNGs for a deterministic test."""
    from lhotse_tpu.utils import fix_random_seed

    fix_random_seed(42)
    yield 42


@pytest.fixture
def tmp_wav(tmp_path):
    """A 1-second 16 kHz mono sine WAV file."""
    from lhotse_tpu.audio.wavio import write_wav

    x = (np.sin(2 * np.pi * 440 * np.arange(16000) / 16000) * 0.5).astype(np.float32)
    p = tmp_path / "sine.wav"
    write_wav(str(p), x, 16000)
    return p
