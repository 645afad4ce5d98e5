"""
Lazy compilation + caching of the in-repo native (C) components.

Shared by the FLAC codec and the LTC1 feature codec: each shared library is
built once with the system C compiler from ``<repo>/native/<name>/<src>`` and
cached next to the source (or under ``$LHOTSE_TPU_CACHE`` /
``~/.cache/lhotse_tpu`` when the tree is read-only). Set
``LHOTSE_TPU_NO_NATIVE=1`` to force the pure-Python fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Dict, List, Optional

_LIBS: Dict[str, ctypes.CDLL] = {}
_LOCK = threading.Lock()


def native_disabled() -> bool:
    return os.environ.get("LHOTSE_TPU_NO_NATIVE") == "1"


def _native_root() -> Path:
    here = Path(__file__).resolve()
    for base in [here.parents[1], here.parents[0]]:
        cand = base / "native"
        if cand.is_dir():
            return cand
    raise FileNotFoundError("native/ source directory not found.")


def _cache_dir() -> Path:
    env = os.environ.get("LHOTSE_TPU_CACHE")
    d = Path(env) if env else Path.home() / ".cache" / "lhotse_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d


def build_native(name: str, source: str, extra_link: Optional[List[str]] = None) -> ctypes.CDLL:
    """
    Build (if needed) and load ``native/<name>/<source>`` as ``lib<name>.so``.
    Raises on failure; callers are expected to catch and fall back.
    """
    key = f"{name}:{source}"
    lib = _LIBS.get(key)
    if lib is not None:
        return lib
    with _LOCK:
        lib = _LIBS.get(key)
        if lib is not None:
            return lib
        src = _native_root() / name / source
        if not src.is_file():
            raise FileNotFoundError(f"Native source not found: {src}")
        candidates = [src.parent / f"lib{name}.so", _cache_dir() / f"lib{name}.so"]
        so_path = None
        for so in candidates:
            if so.is_file() and so.stat().st_mtime >= src.stat().st_mtime:
                so_path = so
                break
        if so_path is None:
            cc = os.environ.get("CC", "cc")
            last_err = None
            # The .so is never shipped (built and cached per host), so
            # -march=native is safe and lets the SIMD kernels vectorize to
            # whatever the local CPU has (AVX-512/AVX2/NEON...); retry
            # without it for compilers that reject the flag.
            flag_sets = [
                ["-O3", "-march=native", "-fno-math-errno"],
                ["-O3"],
            ]
            for so in candidates:
                # Per-PID temp name: the in-process lock doesn't cover spawned
                # workers compiling concurrently, and a shared tmp path could
                # publish a half-written .so that then satisfies the mtime
                # cache check forever.
                tmp = so.with_suffix(f".so.{os.getpid()}.tmp")
                for flags in flag_sets:
                    cmd = [cc, *flags, "-shared", "-fPIC", "-o", str(tmp), str(src)]
                    cmd += extra_link or []
                    try:
                        subprocess.run(cmd, check=True, capture_output=True)
                        os.replace(tmp, so)
                        so_path = so
                        break
                    except (subprocess.CalledProcessError, OSError) as e:
                        last_err = e
                        tmp.unlink(missing_ok=True)
                        continue
                if so_path is not None:
                    break
            if so_path is None:
                raise RuntimeError(f"Failed to build native component '{name}': {last_err}")
        lib = ctypes.CDLL(str(so_path))
        _LIBS[key] = lib
        return lib
