"""ctypes bindings to the native C++ host runtime (native/lidar_native.cpp).

Builds the shared library on demand with g++ and caches it; every entry
point has a pure-numpy fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "lidar_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "liblidar_native.so")

_lib: ctypes.CDLL | None = None
_tried = False


def _compile() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        # retry without OpenMP
        try:
            subprocess.run([c for c in cmd if c != "-fopenmp"], check=True,
                           capture_output=True, timeout=300)
            return True
        except (subprocess.SubprocessError, FileNotFoundError):
            return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.lbt_build_bvh.argtypes = [f32p, i64, i32p, i64, f32p, f32p, i32p, i32p]
    lib.lbt_build_bvh.restype = ctypes.c_int
    lib.lbt_parse_obj_sizes.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(i64), ctypes.POINTER(i64),
        ctypes.POINTER(i64)]
    lib.lbt_parse_obj_sizes.restype = ctypes.c_int
    lib.lbt_parse_obj_fill.argtypes = [f32p, i32p, i64p]
    lib.lbt_parse_obj_fill.restype = ctypes.c_int
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.lbt_cull.argtypes = [f32p, f32p, i32p, i32p, i64,
                             f32p, f32p, f32p, f32p, u8p, i64,
                             ctypes.c_float, i32p, i32p, f32p, i64]
    lib.lbt_cull.restype = i64
    _lib = lib
    return _lib


def build_bvh_native(vertices: np.ndarray, faces: np.ndarray):
    """Native LBVH build; returns BVH arrays or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    n = len(faces)
    total = 2 * n - 1 if n > 1 else 1
    node_min = np.empty((total, 3), np.float32)
    node_max = np.empty((total, 3), np.float32)
    node_face = np.empty(total, np.int32)
    node_skip = np.empty(total, np.int32)
    rc = lib.lbt_build_bvh(vertices.reshape(-1), len(vertices),
                           faces.reshape(-1), n,
                           node_min.reshape(-1), node_max.reshape(-1),
                           node_face, node_skip)
    if rc != 0:
        return None
    from ..core.types import BVH
    return BVH(node_min=node_min, node_max=node_max,
               node_face=node_face, node_skip=node_skip)


def parse_obj_native(path: str):
    """Fast positions+faces OBJ parse; returns (verts, faces, comp_start)
    or None.  Attribute/material resolution stays in the Python loader."""
    lib = get_lib()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    nc = ctypes.c_int64()
    if lib.lbt_parse_obj_sizes(path.encode(), ctypes.byref(nv),
                               ctypes.byref(nf), ctypes.byref(nc)) != 0:
        return None
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nf.value, 3), np.int32)
    comp_start = np.empty(nc.value, np.int64)
    if lib.lbt_parse_obj_fill(verts.reshape(-1), faces.reshape(-1),
                              comp_start) != 0:
        return None
    return verts, faces, comp_start


def cull_candidates_native(bvh, center, axis, tan_half, radius, valid,
                           t_max: float):
    """Native per-tile beam culling.

    Returns (tiles, faces, dnear, counts) in concatenated per-tile order
    (near-to-far within each tile), or None when the library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    node_min = np.ascontiguousarray(bvh.node_min, np.float32)
    node_max = np.ascontiguousarray(bvh.node_max, np.float32)
    node_face = np.ascontiguousarray(bvh.node_face, np.int32)
    node_skip = np.ascontiguousarray(bvh.node_skip, np.int32)
    center = np.ascontiguousarray(center, np.float32)
    axis = np.ascontiguousarray(axis, np.float32)
    tan_half = np.ascontiguousarray(tan_half, np.float32)
    radius = np.ascontiguousarray(radius, np.float32)
    valid = np.ascontiguousarray(valid, np.uint8)
    T = center.shape[0]
    counts = np.empty(T, np.int32)
    dummy_f = np.empty(1, np.int32)
    dummy_d = np.empty(1, np.float32)
    total = lib.lbt_cull(node_min.reshape(-1), node_max.reshape(-1),
                         node_face, node_skip, len(node_face),
                         center.reshape(-1), axis.reshape(-1), tan_half,
                         radius, valid, T, float(t_max), counts,
                         dummy_f, dummy_d, 0)
    if total < 0:
        return None
    faces = np.empty(max(int(total), 1), np.int32)
    dnear = np.empty(max(int(total), 1), np.float32)
    total2 = lib.lbt_cull(node_min.reshape(-1), node_max.reshape(-1),
                          node_face, node_skip, len(node_face),
                          center.reshape(-1), axis.reshape(-1), tan_half,
                          radius, valid, T, float(t_max), counts,
                          faces, dnear, int(total))
    if total2 != total:
        return None
    counts64 = counts.astype(np.int64)
    tiles = np.repeat(np.arange(T, dtype=np.int64), counts64)
    return tiles, faces[:total].astype(np.int64), dnear[:total], counts64
