"""
Selectable resampling backend registry.

Mirrors the reference's backend selector
(`/root/reference/lhotse/audio/resampling_backend.py:1-45`): a process-global
choice between the built-in polyphase sinc resampler (``"default"``) and a
sox-based path (``"sox"``), settable programmatically, via the
``LHOTSE_TPU_RESAMPLING_BACKEND`` environment variable (the reference's
``LHOTSE_RESAMPLING_BACKEND`` is honoured as a fallback for drop-in
compatibility), or temporarily via the :func:`resampling_backend` context
manager. The ``Resample`` audio transform consults this registry
(`augmentation/transforms.py`), matching the reference's dispatch in
`augmentation/torchaudio.py:102-118`.

Unlike the reference we only *list* "sox" as available when the sox binary
can actually be found, so ``set_current_resampling_backend("sox")`` fails
fast instead of erroring at first use.
"""
from __future__ import annotations

import contextlib
import os
from typing import List, Optional

ResamplingBackend = str  # "default" | "sox"

CURRENT_RESAMPLING_BACKEND: Optional[ResamplingBackend] = None


def _sox_available() -> bool:
    try:
        from lhotse_tpu.tools.libsox import libsox_available

        return libsox_available()
    except Exception:
        return False


def available_resampling_backends() -> List[ResamplingBackend]:
    backends = ["default"]
    if _sox_available():
        backends.append("sox")
    return backends


def set_current_resampling_backend(backend: ResamplingBackend) -> None:
    global CURRENT_RESAMPLING_BACKEND
    if backend not in available_resampling_backends():
        raise ValueError(
            f"Invalid resampling backend: {backend}. "
            f"Available backends: {available_resampling_backends()}"
        )
    CURRENT_RESAMPLING_BACKEND = backend


def get_current_resampling_backend() -> ResamplingBackend:
    global CURRENT_RESAMPLING_BACKEND
    if CURRENT_RESAMPLING_BACKEND is not None:
        return CURRENT_RESAMPLING_BACKEND
    maybe_env_backend = os.environ.get(
        "LHOTSE_TPU_RESAMPLING_BACKEND"
    ) or os.environ.get("LHOTSE_RESAMPLING_BACKEND")
    if maybe_env_backend:
        set_current_resampling_backend(maybe_env_backend)
        return CURRENT_RESAMPLING_BACKEND
    set_current_resampling_backend("default")
    return CURRENT_RESAMPLING_BACKEND


@contextlib.contextmanager
def resampling_backend(backend: ResamplingBackend):
    """Temporarily switch the resampling backend within a ``with`` block."""
    previous = get_current_resampling_backend()
    set_current_resampling_backend(backend)
    try:
        yield
    finally:
        set_current_resampling_backend(previous)
