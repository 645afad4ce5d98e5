from lhotse_tpu.dataset import collation, input_strategies, signal_transforms
from lhotse_tpu.dataset.collation import (
    TokenCollater,
    collate_audio,
    collate_custom_field,
    collate_features,
    collate_images,
    collate_matrices,
    collate_multi_channel_audio,
    collate_multi_channel_features,
    collate_vectors,
    collate_video,
)
from lhotse_tpu.dataset.cut_transforms import *  # noqa: F401,F403
from lhotse_tpu.dataset.cut_transforms import __all__ as _cut_transforms_all
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
from lhotse_tpu.dataset.input_strategies import (
    AudioSamples,
    BatchIO,
    OnTheFlyFeatures,
    PrecomputedFeatures,
)
from lhotse_tpu.dataset.sampling import *  # noqa: F401,F403
from lhotse_tpu.dataset.sampling import __all__ as _sampling_all
from lhotse_tpu.dataset.signal_transforms import (
    DereverbWPE,
    GlobalMVN,
    RandomizedSmoothing,
    SpecAugment,
)

__all__ = (
    [
        "AudioSamples",
        "BatchIO",
        "DereverbWPE",
        "GlobalMVN",
        "OnTheFlyFeatures",
        "PrecomputedFeatures",
        "RandomizedSmoothing",
        "SpecAugment",
        "TokenCollater",
        "WorkerInfo",
        "collate_audio",
        "collate_custom_field",
        "collate_features",
        "collate_images",
        "collate_matrices",
        "collate_multi_channel_audio",
        "collate_multi_channel_features",
        "collate_vectors",
        "collate_video",
        "get_rank",
        "get_worker_info",
        "get_world_size",
        "make_worker_init_fn",
        "resolve_seed",
        "set_worker_info",
        "worker_init_fn",
    ]
    + list(_sampling_all)
    + list(_cut_transforms_all)
)
