"""
Manifest combination and parallel-transform helpers.

Reference behavior: `/root/reference/lhotse/manipulation.py` — ``combine``
(:18), ``split_parallelize_combine`` (:33), ``to_manifest``.
"""
from __future__ import annotations

from concurrent.futures import ProcessPoolExecutor
from functools import reduce
from itertools import chain
from operator import add
from typing import Callable, Iterable, Optional, TypeVar, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.features.base import Features, FeatureSet
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet

ManifestItem = TypeVar("ManifestItem")
Manifest = TypeVar("Manifest")


def combine(*manifests: Union[Manifest, Iterable[Manifest]]) -> Manifest:
    """Combine multiple manifests of the same type into one (accepts varargs
    or a single list/tuple)."""
    if len(manifests) == 1 and isinstance(manifests, (tuple, list)):
        manifests = manifests[0]
    return reduce(add, manifests)


def split_parallelize_combine(
    num_jobs: int, manifest: Manifest, fn: Callable, *args, **kwargs
) -> Manifest:
    """
    Split the manifest into ``num_jobs`` pieces, apply ``fn`` to each split in
    a process pool, and combine the results.
    """
    splits = manifest.split(num_splits=num_jobs)
    with ProcessPoolExecutor(num_jobs) as ex:
        futures = [ex.submit(fn, subset, *args, **kwargs) for subset in splits]
        result = combine([f.result() for f in futures])
    return result


def to_manifest(items: Iterable[ManifestItem]) -> Optional[Manifest]:
    """Build the right Set type from an iterable of manifest items
    (None when empty)."""
    items = iter(items)
    try:
        first_item = next(items)
    except StopIteration:
        return None
    items = chain([first_item], items)

    from lhotse_tpu.cut import Cut, CutSet

    if isinstance(first_item, Recording):
        return RecordingSet.from_recordings(items)
    if isinstance(first_item, SupervisionSegment):
        return SupervisionSet.from_segments(items)
    if isinstance(first_item, Cut):
        return CutSet.from_cuts(items)
    if isinstance(first_item, Features):
        raise ValueError(
            "FeatureSet generic construction from an iterable is not possible; "
            "call FeatureSet.from_features() directly instead."
        )
    raise ValueError(f"Unknown type of manifest item: {first_item}")
