"""
TPU device-mesh utilities: the distributed story of this framework.

The reference library's distributed axis is data-parallel dataloading only —
`torch.distributed` is used purely for rank discovery (reference:
`/root/reference/lhotse/dataset/sampling/base.py:143-160`,
`dataset/dataloading.py:329-345`); no collectives carry data (SURVEY §2.10).

The TPU-native equivalent implemented here:
- rank/world discovery via ``jax.process_index()/process_count()`` with env-var
  overrides (``WORLD_SIZE``/``RANK``), mirroring the reference resolution order;
- per-host data sharding via deterministic partition arithmetic (see
  :mod:`lhotse_tpu.dataset.dataloading`);
- host-local batches assembled into global device arrays over a
  ``jax.sharding.Mesh`` via ``jax.make_array_from_process_local_data`` —
  ICI/DCN traffic is XLA-managed, no custom comm layer.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def get_world_size() -> int:
    """Resolution order mirrors reference dataloading.py:329: env > jax > 1."""
    if "WORLD_SIZE" in os.environ:
        return int(os.environ["WORLD_SIZE"])
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


def get_rank() -> int:
    if "RANK" in os.environ:
        return int(os.environ["RANK"])
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def data_parallel_mesh(n_devices: Optional[int] = None, axis_name: str = "data"):
    """
    Create a 1-D data-parallel ``jax.sharding.Mesh`` over all (or the first
    ``n_devices``) devices. The data pipeline shards the batch dimension over
    this axis; everything else is replicated.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh, axis_name: str = "data"):
    """NamedSharding placing the leading (batch) dim on the mesh's data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name: str = "data"):
    """
    Place a (pytree of) host-local numpy batch(es) onto the mesh, sharding the
    leading dimension across ``axis_name``. In the multi-process setting each
    host contributes its local shard and the result is a global jax.Array
    (assembled with ``jax.make_array_from_process_local_data``); in
    single-process settings this is a ``device_put`` with a NamedSharding.
    """
    import jax

    sharding = batch_sharding(mesh, axis_name)

    def _place(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_place, batch)


def pad_to_multiple(
    arr: np.ndarray, multiple: int, axis: int = 0, value: float = 0.0) -> np.ndarray:
    """Pad ``arr`` along ``axis`` so its size is divisible by ``multiple`` —
    needed so the batch dim shards evenly over the mesh."""
    size = arr.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, rem)
    return np.pad(arr, widths, mode="constant", constant_values=value)


def host_local_to_global(batch, mesh=None, axis_name: str = "data"):
    """
    Convenience wrapper: build a default data-parallel mesh if none given, pad
    the batch dim to shard evenly, and shard over devices. Returns
    ``(global_batch, mesh)``.
    """
    if mesh is None:
        mesh = data_parallel_mesh(axis_name=axis_name)
    n = int(np.prod(mesh.devices.shape))
    import jax

    padded = jax.tree_util.tree_map(lambda x: pad_to_multiple(np.asarray(x), n, axis=0), batch)
    return shard_batch(padded, mesh, axis_name), mesh
