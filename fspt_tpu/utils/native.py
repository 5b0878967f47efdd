"""ctypes bindings for the native host-runtime library (csrc/).

The device compute path is JAX/XLA/Pallas; host-side heavy lifting — BVH
construction, OBJ parsing — runs native C++ like the reference's runtime
does, ~10-50× faster than the NumPy fallbacks for 100k+ element meshes.
The library auto-builds on first use (make in csrc/); every entry point has
a NumPy fallback at its call site, and tests assert native == NumPy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libfspt_native.so")
_lib = None


class _ObjCounts(ctypes.Structure):
    _fields_ = [("n_verts", ctypes.c_int64), ("n_normals", ctypes.c_int64),
                ("n_texcoords", ctypes.c_int64), ("n_tris", ctypes.c_int64)]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
    lib = ctypes.CDLL(_LIB_PATH)
    f64p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.fspt_build_bvh.restype = ctypes.c_int64
    lib.fspt_build_bvh.argtypes = [f64p, f64p, f64p, ctypes.c_int64,
                                   ctypes.c_int64, i64p, f64p, f64p, i64p,
                                   i64p, i64p]
    lib.fspt_obj_count.restype = ctypes.c_int
    lib.fspt_obj_count.argtypes = [ctypes.c_char_p, ctypes.POINTER(_ObjCounts)]
    lib.fspt_obj_parse.restype = ctypes.c_int
    lib.fspt_obj_parse.argtypes = [ctypes.c_char_p, f64p, f64p, f64p, i64p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def build_bvh(v0, v1, v2, max_leaf: int):
    """Native pre-order BVH build; same output contract as ops/bvh.py's
    ``_build_bvh_preorder``: (order, bmin, bmax, first, count, miss)."""
    lib = _load()
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    n = len(v0)
    cap = max(1, 2 * n)
    order = np.empty(n, np.int64)
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    first = np.empty(cap, np.int64)
    count = np.empty(cap, np.int64)
    miss = np.empty(cap, np.int64)
    m = lib.fspt_build_bvh(v0, v1, v2, n, max_leaf, order, bmin, bmax,
                           first, count, miss)
    return (order, bmin[:m].copy(), bmax[:m].copy(), first[:m].copy(),
            count[:m].copy(), miss[:m].copy())


def parse_obj(path: str):
    """Native OBJ parse; same output contract as scene/mesh.py's parse_obj."""
    lib = _load()
    counts = _ObjCounts()
    if lib.fspt_obj_count(path.encode(), ctypes.byref(counts)) != 0:
        raise IOError(f"cannot read {path}")
    verts = np.empty((max(counts.n_verts, 1), 3), np.float32)
    normals = np.empty((max(counts.n_normals, 1), 3), np.float32)
    texcoords = np.empty((max(counts.n_texcoords, 1), 2), np.float32)
    faces = np.empty((max(counts.n_tris, 1), 3, 3), np.int64)
    if lib.fspt_obj_parse(path.encode(), verts, normals, texcoords,
                          faces.reshape(-1)) != 0:
        raise IOError(f"cannot parse {path}")
    return dict(
        vertices=verts[: counts.n_verts],
        normals=normals[: counts.n_normals],
        texcoords=texcoords[: counts.n_texcoords],
        faces=faces[: counts.n_tris],
    )
