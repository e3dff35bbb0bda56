"""ctypes bindings for the native C++ runtime helpers (built from native/).

The reference's runtime is native (Rust); here the Python/JAX side owns the
compute path and the native side owns hot host-side IO: the OBJ parser (a
1M-triangle OBJ takes ~10s in pure Python, ~0.2s in C++) and the PNG/PPM
frame encoder.  Everything degrades gracefully to the pure-Python fallbacks
when the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "native", "libashtpu.so"
    )


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ash_parse_obj.restype = ctypes.c_void_p
        lib.ash_parse_obj.argtypes = [ctypes.c_char_p]
        lib.ash_obj_counts.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ash_obj_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.ash_obj_free.argtypes = [ctypes.c_void_p]
        lib.ash_write_png.restype = ctypes.c_int
        lib.ash_write_png.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
        ]
        if hasattr(lib, "ash_build_meshlets"):  # older .so builds lack it
            lib.ash_build_meshlets.restype = ctypes.c_void_p
            lib.ash_build_meshlets.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.ash_meshlets_counts.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.ash_meshlets_fill.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.ash_meshlets_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def parse_obj(path: str):
    """Parse an OBJ via the C++ parser.  Returns (pos, uv, nrm, faces) or
    None on failure (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    handle = lib.ash_parse_obj(path.encode())
    if not handle:
        return None
    try:
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        lib.ash_obj_counts(handle, ctypes.byref(nv), ctypes.byref(nf))
        pos = np.empty((nv.value, 3), dtype=np.float32)
        uv = np.empty((nv.value, 2), dtype=np.float32)
        nrm = np.empty((nv.value, 3), dtype=np.float32)
        faces = np.empty((nf.value, 3), dtype=np.int32)
        lib.ash_obj_fill(
            handle,
            pos.ctypes.data_as(ctypes.c_void_p),
            uv.ctypes.data_as(ctypes.c_void_p),
            nrm.ctypes.data_as(ctypes.c_void_p),
            faces.ctypes.data_as(ctypes.c_void_p),
        )
        return pos, uv, nrm, faces
    finally:
        lib.ash_obj_free(handle)


def build_meshlets(tri_v: np.ndarray, order: np.ndarray,
                   num_vertices: int):
    """Greedy meshlet clustering via the C++ fast path (bit-identical to
    scene.build_meshlets' Python loop, ~200x faster at 1M tris).  tri_v:
    (T, 3) i32; order: (R,) i32 walk order (Morton-ordered real triangle
    ids).  Returns (vertex_src, local_tri, tri_perm) or None (fallback)."""
    lib = _load()
    if lib is None or not hasattr(lib, "ash_build_meshlets"):
        return None
    tv = np.ascontiguousarray(tri_v, dtype=np.int32)
    od = np.ascontiguousarray(order, dtype=np.int32)
    handle = lib.ash_build_meshlets(
        tv.ctypes.data_as(ctypes.c_void_p),
        np.int64(tv.shape[0]),
        od.ctypes.data_as(ctypes.c_void_p),
        np.int64(od.shape[0]),
        np.int64(num_vertices),
    )
    if not handle:
        return None
    try:
        nm = ctypes.c_int64()
        lib.ash_meshlets_counts(handle, ctypes.byref(nm))
        n = nm.value
        vertex_src = np.empty(n * 128, dtype=np.int32)
        local_tri = np.empty((n * 128, 3), dtype=np.int32)
        tri_perm = np.empty(n * 128, dtype=np.int32)
        lib.ash_meshlets_fill(
            handle,
            vertex_src.ctypes.data_as(ctypes.c_void_p),
            local_tri.ctypes.data_as(ctypes.c_void_p),
            tri_perm.ctypes.data_as(ctypes.c_void_p),
        )
        return vertex_src, local_tri, tri_perm
    finally:
        lib.ash_meshlets_free(handle)


def write_png(path: str, rgba8: np.ndarray) -> bool:
    """Native zlib-free PNG writer; returns False if unavailable."""
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(rgba8)
    h, w = arr.shape[:2]
    rc = lib.ash_write_png(
        path.encode(), arr.ctypes.data_as(ctypes.c_void_p), w, h
    )
    return rc == 0
