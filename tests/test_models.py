"""Flagship model + graft entry tests (8 virtual CPU devices via conftest)."""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from lhotse_tpu.models import (
    EncoderConfig, forward, init_params, masked_prediction_loss, sgd_train_step)

CFG = EncoderConfig(num_layers=2, d_model=64, num_heads=4, ffn_dim=128)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


class TestEncoder:
    def test_forward_shapes(self, params):
        feats = np.random.RandomState(0).randn(2, 50, 80).astype(np.float32)
        out = forward(params, feats, np.array([50, 30]), CFG)
        assert out.shape == (2, 50, CFG.d_model)
        assert np.isfinite(np.asarray(out, dtype=np.float32)).all()

    def test_padding_invariance(self, params):
        """Frames beyond feat_lens must not affect valid outputs."""
        rng = np.random.RandomState(1)
        feats = rng.randn(1, 40, 80).astype(np.float32)
        lens = np.array([30])
        out1 = np.asarray(forward(params, feats, lens, CFG), np.float32)
        feats2 = feats.copy()
        feats2[0, 30:] = 999.0  # garbage in the padding region
        out2 = np.asarray(forward(params, feats2, lens, CFG), np.float32)
        np.testing.assert_allclose(out1[0, :30], out2[0, :30], atol=2e-2)

    def test_loss_decreases(self, params):
        rng = np.random.RandomState(2)
        feats = rng.randn(4, 32, 80).astype(np.float32)
        lens = np.full(4, 32, np.int32)
        key = jax.random.PRNGKey(3)
        p = params
        loss0 = float(masked_prediction_loss(p, feats, lens, key, CFG))
        step = jax.jit(lambda p, k: sgd_train_step(p, feats, lens, k, CFG, lr=1e-2))
        for i in range(10):
            p, loss = step(p, jax.random.fold_in(key, i))
        assert float(loss) < loss0


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.ndim == 3
        assert np.isfinite(np.asarray(out, dtype=np.float32)).all()

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
        ge.dryrun_multichip(8)

    def test_dryrun_multichip_4(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(4)

    def test_dryrun_self_provisions_from_single_device_process(self):
        """
        The driver's calling convention: a process whose jax is already
        initialized with a single (non-virtual) device calls
        dryrun_multichip(8).  The wrapper must detect the shortfall and
        re-exec the body in a provisioned subprocess — this was the r01/r02
        MULTICHIP failure mode.
        """
        import os
        import subprocess

        root = Path(__file__).parent.parent
        env = dict(os.environ)
        env["XLA_FLAGS"] = ""  # no forced device count -> 1 CPU device
        env["JAX_PLATFORMS"] = "cpu"
        code = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "assert len(jax.devices()) == 1, jax.devices()\n"
            "import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n"
            "print('SELF_PROVISION_OK')\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd=root,
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        assert proc.returncode == 0 and "SELF_PROVISION_OK" in proc.stdout, (
            f"rc={proc.returncode}\nstdout:\n{proc.stdout[-2000:]}\n"
            f"stderr:\n{proc.stderr[-4000:]}"
        )
