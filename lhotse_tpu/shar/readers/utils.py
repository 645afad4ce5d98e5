"""
Shard splitting across nodes and dataloading workers.

Reference behavior: `/root/reference/lhotse/shar/readers/utils.py`
(pytorch_worker_info :4-40, split_by_node :43-49, split_by_worker :52-58) —
rank/world discovery uses env vars then the JAX process runtime instead of
torch.distributed.
"""


def worker_info(group=None):
    """Return ``(rank, world_size, worker, num_workers)``."""
    import os

    from lhotse_tpu.dataset.dataloading import (get_rank, get_worker_info, get_world_size)

    rank = get_rank()
    world_size = get_world_size()
    worker = 0
    num_workers = 1
    if "WORKER" in os.environ and "NUM_WORKERS" in os.environ:
        worker = int(os.environ["WORKER"])
        num_workers = int(os.environ["NUM_WORKERS"])
    else:
        wi = get_worker_info()
        if wi is not None:
            worker = wi.id
            num_workers = wi.num_workers
    return rank, world_size, worker, num_workers


def split_by_node(src, group=None):
    """Every node takes its strided subset of the shard list."""
    rank, world_size, worker, num_workers = worker_info(group=group)
    return src[rank::world_size]


def split_by_worker(src):
    """Every dataloading worker takes its strided subset of the shard list."""
    rank, world_size, worker, num_workers = worker_info()
    return src[worker::num_workers]


# Parity alias: the reference exposes this under a torch-centric name
# (`lhotse/shar/readers/utils.py:4`); the implementation above is
# framework-neutral but downstream code imports the original symbol.
pytorch_worker_info = worker_info
