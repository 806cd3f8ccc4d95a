"""Shared loader for the native C++ helper library.

All native components (SAH BVH builder, OBJ/MTL parser, RGBE/PNG image IO —
the TPU framework's counterparts of the reference's native C++/assimp/stb
host code) compile into ONE shared object, built on demand with g++ and
cached under ``build/``.  Callers degrade gracefully to the pure-Python
implementations when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_CSRC = os.path.join(_REPO_ROOT, "csrc")
_LIB = os.path.join(_REPO_ROOT, "build", "libpnrt_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _sources() -> list[str]:
    return sorted(glob.glob(os.path.join(_CSRC, "*.cpp")))


def _stale(sources: list[str]) -> bool:
    if not os.path.exists(_LIB):
        return True
    lib_mtime = os.path.getmtime(_LIB)
    return any(os.path.getmtime(s) > lib_mtime for s in sources)


def _compile(sources: list[str]) -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _LIB, *sources]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> ctypes.CDLL | None:
    """The native library, compiling it first if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        sources = _sources()
        if not sources:
            return None
        if _stale(sources) and not _compile(sources):
            return None
        try:
            _lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib = None
        return _lib
