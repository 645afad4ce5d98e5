#!/usr/bin/env bash
# Pre-commit smoke gate: import + graft entry + multichip dryrun + bench (tiny,
# CPU) + pytest. Run before EVERY commit that touches lhotse_tpu source.
# Note: the axon TPU plugin ignores JAX_PLATFORMS env; we must force CPU via
# jax.config.update after import (same technique as tests/conftest.py).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[smoke] import check"
python -c "import lhotse_tpu"

echo "[smoke] graft entry compile check (cpu)"
python - <<'EOF'
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
jax.eval_shape(fn, *args)
print("entry ok")
g.dryrun_multichip(8)
print("dryrun ok")
EOF

echo "[smoke] dryrun driver-convention (NO env preset: wrapper must self-provision)"
env -u XLA_FLAGS -u _AXON_REGISTERED JAX_PLATFORMS=cpu python - <<'EOF'
import __graft_entry__ as g
g.dryrun_multichip(8)
print("driver-convention dryrun ok")
EOF

echo "[smoke] bench smoke (tiny, cpu)"
LHOTSE_TPU_BENCH_SMOKE=1 python bench.py

echo "[smoke] pytest"
python -m pytest tests/ -x -q

echo "[smoke] ALL OK"
