"""ctypes bindings for the native host library (tracer_tpu/native).

The C++ library mirrors the reference's Rust/C host split (ljus loader +
capture writers behind a C ABI, ljus/src/lib.rs:11-39). It is built on
demand with the in-tree Makefile; everything falls back to the pure
Python implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtracerhost.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(build: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and (not build or not _build()):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tracer_load_obj.restype = ctypes.c_int
    lib.tracer_load_obj.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.tracer_free.argtypes = [ctypes.c_void_p]
    lib.tracer_write_pcd.restype = ctypes.c_int
    lib.tracer_write_pcd.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def load_obj(path: str):
    """Native OBJ/MTL load; returns (tris (T,3,3) f32, tri_mats (T,) u32,
    mats (M,28) f32). Raises RuntimeError on parse errors."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    nt = ctypes.c_size_t()
    nm = ctypes.c_size_t()
    tri_p = ctypes.POINTER(ctypes.c_float)()
    mat_ix_p = ctypes.POINTER(ctypes.c_uint32)()
    mat_p = ctypes.POINTER(ctypes.c_float)()
    err = ctypes.create_string_buffer(512)
    rc = lib.tracer_load_obj(path.encode(), ctypes.byref(nt),
                             ctypes.byref(nm), ctypes.byref(tri_p),
                             ctypes.byref(mat_ix_p), ctypes.byref(mat_p),
                             err, len(err))
    if rc != 0:
        raise RuntimeError(f"native loader: {err.value.decode()}")
    t, m = nt.value, nm.value
    tris = np.ctypeslib.as_array(tri_p, shape=(t * 9,)).reshape(t, 3, 3).copy()
    tri_mats = np.ctypeslib.as_array(mat_ix_p, shape=(t,)).copy()
    mats = np.ctypeslib.as_array(mat_p, shape=(m * 28,)).reshape(m, 28).copy()
    lib.tracer_free(tri_p)
    lib.tracer_free(mat_ix_p)
    lib.tracer_free(mat_p)
    return tris, tri_mats.astype(np.uint32), mats


def write_pcd(path: str, points) -> None:
    """Native ASCII PCD writer."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(np.asarray(points, np.float32).reshape(-1, 4))
    err = ctypes.create_string_buffer(512)
    rc = lib.tracer_write_pcd(
        path.encode(), pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], err, len(err))
    if rc != 0:
        raise RuntimeError(f"native pcd writer: {err.value.decode()}")
