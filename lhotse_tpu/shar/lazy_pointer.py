"""
Lazy pointer addressing for Shar tar shards.

Reference behavior: `/root/reference/lhotse/shar/lazy_pointer.py`.

A Shar pointer ``<tar_path>?o=<offset>&e=<end_offset>`` identifies one
sample's data **payload** inside an indexed tar shard. In this framework the
pointer encodes the payload byte range directly (computed from the ``.idx``
sidecar plus one cached header read), so :func:`read_payload` is a single
ranged read with no tar header parsing at load time. Formats are sniffed
from the payload's magic bytes (NPY ``\\x93NUMPY`` vs LTC1/lilcom; audio via
container magic).
"""
from __future__ import annotations

import os
import re
import threading
from typing import Any, Dict, Tuple

from lhotse_tpu.serialization import open_best
from lhotse_tpu.utils import Pathlike

_POINTER_RE = re.compile(r"^(?P<tar>[^?]+)\?o=(?P<o>\d+)&e=(?P<e>\d+)$")

# Process-local handle reuse keyed by tar path. Not an LRU: typical workloads
# keep tens of shards in flight. Per-tar locks so different tars don't
# serialize; the registry lock only guards lookup/insertion.
_HANDLES: Dict[str, Tuple[Any, threading.Lock]] = {}
_REGISTRY_LOCK = threading.Lock()


def encode_pointer(tar_path: Pathlike, offset: int, end_offset: int) -> str:
    """Encode a Shar lazy-pointer string."""
    return f"{tar_path}?o={int(offset)}&e={int(end_offset)}"


def decode_pointer(s: str) -> Tuple[str, int, int]:
    """Parse a pointer into ``(tar_path, offset, end_offset)``."""
    m = _POINTER_RE.match(s)
    if m is None:
        raise ValueError(f"Not a Shar pointer: {s!r}")
    return m.group("tar"), int(m.group("o")), int(m.group("e"))


def is_shar_pointer(s: Any) -> bool:
    """True iff ``s`` is a string in Shar lazy-pointer form."""
    return isinstance(s, str) and _POINTER_RE.match(s) is not None


def _get_handle(tar_path: str) -> Tuple[Any, threading.Lock]:
    with _REGISTRY_LOCK:
        entry = _HANDLES.get(tar_path)
        if entry is None:
            entry = (open_best(tar_path, "rb"), threading.Lock())
            _HANDLES[tar_path] = entry
        return entry


def read_payload(pointer: str) -> bytes:
    """Single ranged read of the payload bytes a pointer refers to."""
    tar_path, offset, end_offset = decode_pointer(pointer)
    if end_offset <= offset:
        raise RuntimeError(f"Shar pointer {pointer!r} points at a placeholder (.nodata) member.")
    fh, fh_lock = _get_handle(tar_path)
    with fh_lock:
        fh.seek(offset)
        data = fh.read(end_offset - offset)
    return data


def close_all() -> None:
    """Close all cached tar file handles (tests / cleanup)."""
    with _REGISTRY_LOCK:
        for fh, _lock in _HANDLES.values():
            try:
                fh.close()
            except Exception:
                pass
        _HANDLES.clear()


# Forked workers inherit duplicated FDs; concurrent parent/child reads on the
# same FD corrupt each other's seek positions. Start each child fresh.
if hasattr(os, "register_at_fork"):
    os.register_at_fork(after_in_child=lambda: _HANDLES.clear())
