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
    parts = manifests[0] if len(manifests) == 1 else manifests
    return reduce(add, parts)


def split_parallelize_combine(
    num_jobs: int, manifest: Manifest, fn: Callable, *args, **kwargs) -> Manifest:
    """
    Split the manifest into ``num_jobs`` pieces, apply ``fn`` to each split in
    a process pool, and combine the results.
    """
    with ProcessPoolExecutor(num_jobs) as pool:
        pending = [
            pool.submit(fn, piece, *args, **kwargs)
            for piece in manifest.split(num_splits=num_jobs)
        ]
        return combine([job.result() for job in pending])


def to_manifest(items: Iterable[ManifestItem]) -> Optional[Manifest]:
    """Build the right Set type from an iterable of manifest items
    (None when empty)."""
    stream = iter(items)
    head = next(stream, None)
    if head is None:
        return None
    stream = chain([head], stream)

    from lhotse_tpu.cut import Cut, CutSet

    builders = (
        (Recording, RecordingSet.from_recordings),
        (SupervisionSegment, SupervisionSet.from_segments), (Cut, CutSet.from_cuts))
    for kind, build in builders:
        if isinstance(head, kind):
            return build(stream)
    if isinstance(head, Features):
        raise ValueError(
            "FeatureSet generic construction from an iterable is not possible; "
            "call FeatureSet.from_features() directly instead."
        )
    raise ValueError(f"Unknown type of manifest item: {head}")
