from lhotse_tpu.dataset.dataloading import (
    WorkerInfo,
    get_rank,
    get_worker_info,
    get_world_size,
    make_worker_init_fn,
    resolve_seed,
    set_worker_info,
    worker_init_fn,
)
from lhotse_tpu.dataset.sampling import *  # noqa: F401,F403
from lhotse_tpu.dataset.sampling import __all__ as _sampling_all

__all__ = [
    "WorkerInfo",
    "get_rank",
    "get_worker_info",
    "get_world_size",
    "make_worker_init_fn",
    "resolve_seed",
    "set_worker_info",
    "worker_init_fn",
] + list(_sampling_all)
