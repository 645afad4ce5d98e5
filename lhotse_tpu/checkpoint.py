"""
Iterator graph traversal and checkpoint utilities for resumable dataloading.

Reference behavior: `/root/reference/lhotse/checkpoint.py` —
``collect_state_dict``/``restore_state_dict`` recursive walk over
``source``/``sources`` attributes (checkpoint.py:49,95) and
``DataloaderCheckpoint`` JSON container validating
num_workers/world_size/rank (checkpoint.py:148-198).
"""
from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any, Dict, List

from lhotse_tpu.utils import Pathlike

__all__ = [
    "collect_state_dict",
    "restore_state_dict",
    "DataloaderCheckpoint",
]

_SINGLE_CHILD = "source"
_MULTI_CHILDREN = "sources"


def _rng_state_to_json(rng_state) -> list:
    """Convert a ``random.Random.getstate()`` tuple to JSON-safe lists."""
    version, internalstate, gauss_next = rng_state
    return [version, list(internalstate), gauss_next]


def _rng_state_from_json(data) -> tuple:
    version, internalstate, gauss_next = data
    return (version, tuple(internalstate), gauss_next)


def collect_state_dict(root) -> dict:
    """
    Recursively collect state from all checkpointable ``IteratorNode``s in
    the lazy iterator graph rooted at ``root``. A checkpointable node's own
    ``state_dict`` is assumed to cover its children.
    """
    from lhotse_tpu.lazy import IteratorNode

    result: Dict[str, Any] = {"_type": type(root).__name__}
    has_children = hasattr(root, _SINGLE_CHILD) or hasattr(root, _MULTI_CHILDREN)
    is_node = isinstance(root, IteratorNode)

    if is_node and root.is_checkpointable:
        result["_state"] = root.state_dict()
        return result
    elif has_children:
        if not is_node:
            raise NotImplementedError(
                f"{type(root).__name__} participates in iterator graph traversal "
                f"(it has child iterators) but is not an IteratorNode."
            )
        raise NotImplementedError(
            f"{type(root).__name__} does not support checkpointing. Remove it "
            f"from the pipeline or implement state_dict/load_state_dict."
        )

    if hasattr(root, _SINGLE_CHILD):
        result[_SINGLE_CHILD] = collect_state_dict(getattr(root, _SINGLE_CHILD))
    if hasattr(root, _MULTI_CHILDREN):
        result[_MULTI_CHILDREN] = [
            collect_state_dict(c) for c in getattr(root, _MULTI_CHILDREN)
        ]
    return result


def restore_state_dict(root, state: dict) -> None:
    """
    Recursively restore state collected by :func:`collect_state_dict`. A
    checkpointable root restores its own children via ``load_state_dict``, so
    recursion happens only for non-checkpointable roots.
    """
    from lhotse_tpu.lazy import IteratorNode

    expected_type = state.get("_type")
    actual_type = type(root).__name__
    if expected_type is not None and actual_type != expected_type:
        raise TypeError(
            f"Type mismatch during state restoration: expected "
            f"'{expected_type}', got '{actual_type}'."
        )

    if isinstance(root, IteratorNode) and root.is_checkpointable and "_state" in state:
        root.load_state_dict(state["_state"])
        return

    if _SINGLE_CHILD in state and hasattr(root, _SINGLE_CHILD):
        restore_state_dict(getattr(root, _SINGLE_CHILD), state[_SINGLE_CHILD])
    if _MULTI_CHILDREN in state and hasattr(root, _MULTI_CHILDREN):
        children = getattr(root, _MULTI_CHILDREN)
        child_states = state[_MULTI_CHILDREN]
        if len(children) != len(child_states):
            raise ValueError(
                f"Number of children mismatch during state restoration: "
                f"expected {len(child_states)}, got {len(children)}."
            )
        for child, child_state in zip(children, child_states):
            restore_state_dict(child, child_state)


@dataclass
class DataloaderCheckpoint:
    """
    Serializable container for a full dataloader checkpoint: per-worker
    iterator graph states plus the sampler state, with topology metadata
    validated on restore.
    """

    num_workers: int
    world_size: int
    rank: int
    worker_states: List[dict] = field(default_factory=list)
    sampler_state: dict = field(default_factory=dict)

    def save(self, path: Pathlike) -> None:
        path = Path(path)
        with open(path, "w") as f:
            json.dump(asdict(self), f, indent=2, default=_json_serializer)

    @classmethod
    def load(cls, path: Pathlike) -> "DataloaderCheckpoint":
        path = Path(path)
        with open(path, "r") as f:
            data = json.load(f)
        return cls(**data)

    def validate(self, num_workers: int, world_size: int, rank: int = 0) -> None:
        if self.num_workers != num_workers:
            raise ValueError(
                f"Checkpoint num_workers={self.num_workers} does not match "
                f"current num_workers={num_workers}."
            )
        if self.world_size != world_size:
            raise ValueError(
                f"Checkpoint world_size={self.world_size} does not match "
                f"current world_size={world_size}."
            )
        if self.rank != rank:
            raise ValueError(
                f"Checkpoint rank={self.rank} does not match current rank={rank}."
            )


def _json_serializer(obj):
    if isinstance(obj, tuple):
        return list(obj)
    raise TypeError(f"Object of type {type(obj).__name__} is not JSON serializable")
