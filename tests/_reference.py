"""
Loader for the reference implementation at /root/reference, for DIFFERENTIAL
testing (same inputs through both implementations, outputs compared).

The environment lacks three of the reference's import-time dependencies;
functional stand-ins live as REAL module files under ``tests/_refstubs/``:

- ``soundfile``: backed by this repo's native decoders, so the reference's
  actual audio loading path executes in-env (see _refstubs/soundfile.py).
- ``intervaltree``: list-backed O(n) implementation, functionally identical
  for the subset the reference uses.
- ``cytoolz``: ``compose_left``/``sliding_window``/``groupby`` re-implemented.

The stub directory is prepended to ``sys.path`` AND ``PYTHONPATH`` (together
with the repo root and the reference root) so that worker subprocesses the
reference spawns (recipe ProcessPoolExecutors, DataLoader workers) can
re-import everything.  Import the reference ONLY through
:func:`load_reference`; it returns None when /root/reference is not mounted
(tests skip themselves).
"""
import os
import sys

_REF_ROOT = "/root/reference"
_STUB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_refstubs")
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_loaded = None


def _install_stubs() -> None:
    import importlib.util

    # Only add the stub directory when at least one stubbed package is
    # genuinely absent, and append (not prepend) to sys.path so REAL
    # installations always win over the stand-ins.
    stubbed = ("soundfile", "intervaltree", "cytoolz", "textgrid", "textgrids")
    any_missing = any(importlib.util.find_spec(m) is None for m in stubbed)
    if any_missing and _STUB_DIR not in sys.path:
        sys.path.append(_STUB_DIR)
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    wanted = ([_STUB_DIR] if any_missing else []) + [_REPO_ROOT, _REF_ROOT]
    existing = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    merged = wanted + [p for p in existing if p not in wanted]
    os.environ["PYTHONPATH"] = os.pathsep.join(merged)


def load_reference():
    """Import and return the reference ``lhotse`` package, or None if absent."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if not os.path.isdir(os.path.join(_REF_ROOT, "lhotse")):
        return None
    _install_stubs()
    import lhotse as ref_lhotse  # noqa: deferred so stubs apply

    _loaded = ref_lhotse
    return _loaded
