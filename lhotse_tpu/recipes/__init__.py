from lhotse_tpu.recipes.librispeech import download_librispeech, prepare_librispeech
from lhotse_tpu.recipes.utils import manifests_exist, read_manifests_if_cached

__all__ = [
    "download_librispeech",
    "manifests_exist",
    "prepare_librispeech",
    "read_manifests_if_cached",
]
