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

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _lib_path() -> Path:
    """Per-host .so name: -march=native binaries are ISA-specific, and the
    repo (like its XLA cache) is shared between heterogeneous hosts — a
    foreign-ISA .so would pass the freshness check, CDLL-load fine, and
    SIGILL on the first call with no fallback."""
    from cggp_tpu.utils.cache import cpu_fingerprint

    return _SRC_DIR / f"libcggp_native-{cpu_fingerprint()}.so"


def _build(lib_path: Path) -> bool:
    sources = [str(_SRC_DIR / s) for s in _SOURCES]
    # Freshness includes this file: a flag/compiler change must rebuild.
    newest_src = max(os.path.getmtime(s) for s in sources + [__file__])
    if lib_path.exists() and os.path.getmtime(lib_path) >= newest_src:
        return True
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared", "-fopenmp",
        *sources,
    ]
    # Atomic publish: compile to a private temp path, then rename.  A direct
    # -o to the final path races concurrent builders / interrupted compiles
    # into a truncated .so whose fresh mtime passes the staleness check
    # forever after.
    tmp_path = lib_path.with_suffix(f".tmp{os.getpid()}.so")
    try:
        subprocess.run(cmd + ["-o", str(tmp_path)], check=True,
                       capture_output=True, timeout=180)
        os.replace(tmp_path, lib_path)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError, OSError) as exc:
        stderr = getattr(exc, "stderr", b"") or b""
        import warnings

        warnings.warn(
            f"native build failed ({exc}); falling back to numpy. "
            f"{stderr.decode(errors='replace')[:500]}"
        )
        try:
            tmp_path.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The compiled native library, or None when unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        lib_path = _lib_path()
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
