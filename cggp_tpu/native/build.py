"""Compile-on-first-use loader for the native library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent
_SOURCES = ["covertree.cc"]
_LIB_NAME = "libcggp_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build(lib_path: Path) -> bool:
    sources = [str(_SRC_DIR / s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in sources)
    if lib_path.exists() and os.path.getmtime(lib_path) >= newest_src:
        return True
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared", "-fopenmp",
        *sources, "-o", str(lib_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as exc:
        stderr = getattr(exc, "stderr", b"") or b""
        import warnings

        warnings.warn(
            f"native build failed ({exc}); falling back to numpy. "
            f"{stderr.decode(errors='replace')[:500]}"
        )
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The compiled native library, or None when unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        lib_path = _SRC_DIR / _LIB_NAME
        if not _build(lib_path):
            _load_failed = True
            return None
        try:
            _lib = ctypes.CDLL(str(lib_path))
        except OSError as exc:  # pragma: no cover
            import warnings

            warnings.warn(f"native library load failed: {exc}")
            _load_failed = True
            return None
    return _lib


def native_available() -> bool:
    return load_library() is not None
