"""ctypes binding to the native C++ BVH builder (csrc/bvh_builder.cpp).

The reference's BVH build is host C++ (include/BVH.hpp); this is the TPU
framework's native counterpart for large scenes where the numpy builder's
per-node Python loop dominates scene load time.  The library is compiled on
demand with g++ and cached under ``build/``; when no toolchain is available
everything transparently falls back to the numpy builder.
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

from pnraytracing_tpu.accel.bvh import BVHArrays
from pnraytracing_tpu.utils.nativelib import get_lib

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib = get_lib()
        if lib is None:
            return None
        lib.pnrt_build_bvh.restype = ctypes.c_int
        lib.pnrt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_bvh_native(
    positions: np.ndarray, indices: np.ndarray, max_leaf_size: int = 4
) -> BVHArrays:
    """Drop-in replacement for :func:`pnraytracing_tpu.accel.bvh.build_bvh`
    backed by the C++ builder (same flat layout contract)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native BVH builder unavailable (g++ missing?)")
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    num_tris = len(indices)
    cap = max(2 * num_tris, 1)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    axis = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    start = np.empty(cap, np.int32)
    end = np.empty(cap, np.int32)
    order = np.empty(num_tris, np.int32)
    num_nodes = np.zeros(1, np.int32)

    def p_f32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def p_i32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    ret = lib.pnrt_build_bvh(
        p_f32(positions), len(positions),
        p_i32(indices), num_tris, max_leaf_size,
        p_f32(node_min), p_f32(node_max),
        p_i32(axis), p_i32(right), p_i32(start), p_i32(end),
        p_i32(order), p_i32(num_nodes),
    )
    if ret != 0:
        raise RuntimeError(f"pnrt_build_bvh failed with code {ret}")
    n = int(num_nodes[0])
    return BVHArrays(
        node_min=node_min[:n].copy(),
        node_max=node_max[:n].copy(),
        axis=axis[:n].copy(),
        right_child=right[:n].copy(),
        start=start[:n].copy(),
        end=end[:n].copy(),
        order=order,
    )
