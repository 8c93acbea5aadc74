"""Native (C++) preprocessing kernels with ctypes bindings.

The reference keeps all host-side graph construction in Python dict loops
(``src/utils/geometry.py:64-170``); here the same contracts run through a
small C++ library (``graph_builder.cpp``) for production-size meshes, with
automatic compilation on first use and graceful fallback to the vectorized
numpy implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_builder.cpp")
_LIB_PATH = os.path.join(_HERE, "libgraph_builder.so")
_HASH_PATH = _LIB_PATH + ".srchash"
_lib = None
_lib_failed = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120)
        with open(_HASH_PATH, "w") as f:
            f.write(_src_hash())
        return True
    except Exception:
        return False


def _binary_is_current() -> bool:
    """The binary is only trusted if its recorded source hash matches the
    checked-in source — mtime comparisons are unreliable on fresh checkouts,
    and a stale/unauditable prebuilt must never load silently."""
    if not os.path.exists(_LIB_PATH) or not os.path.exists(_HASH_PATH):
        return False
    try:
        with open(_HASH_PATH) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (compiling if needed) the native library, or None."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not _binary_is_current():
        if not _compile():
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib_failed = True
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.connectivity_count.restype = ctypes.c_int64
    lib.connectivity_count.argtypes = [i64p, ctypes.c_int64]
    lib.connectivity_fill.restype = ctypes.c_int
    lib.connectivity_fill.argtypes = [
        i64p, ctypes.c_int64, f64p, i64p, i64p, i64p, f32p, i64p,
        ctypes.c_int64]
    lib.incidence_max_degree.restype = ctypes.c_int64
    lib.incidence_max_degree.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64]
    lib.incidence_fill.restype = ctypes.c_int
    lib.incidence_fill.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, i32p, i32p, u8p]
    lib.banded_band_limits.restype = None
    lib.banded_band_limits.argtypes = [i64p, i64p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       i64p, i64p]
    lib.banded_onehot_fill.restype = None
    lib.banded_onehot_fill.argtypes = [i64p, i64p, f32p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       i32p, f32p]
    lib.banded_fill_flat.restype = ctypes.c_int64
    lib.banded_fill_flat.argtypes = [i64p, i64p, f32p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     i32p, f32p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def compute_connectivity(cells: np.ndarray, vertex_pos: np.ndarray
                         ) -> Optional[Tuple[np.ndarray, ...]]:
    """Native connectivity + derived tables, or None when unavailable.

    Returns (face_index (3,C), cell_edge_index (2,F), vertex_edge_index (2,F),
    cell_face_sign (C,3), owner_local_slot (F,)).
    """
    lib = get_lib()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, np.int64)
    C = cells.shape[0]
    centroids = np.ascontiguousarray(
        vertex_pos[cells].mean(axis=1), np.float64)
    F = int(lib.connectivity_count(cells, C))
    face_index = np.zeros((3, C), np.int64)
    cei = np.zeros((2, F), np.int64)
    vei = np.zeros((2, F), np.int64)
    sign = np.zeros((C, 3), np.float32)
    slot = np.zeros(F, np.int64)
    rc = lib.connectivity_fill(cells, C, centroids, face_index, cei, vei,
                               sign, slot, F)
    if rc != 0:
        raise ValueError(f"native connectivity failed (code {rc}): "
                         "non-manifold or inconsistent mesh")
    return face_index, cei, vei, sign, slot


def build_vertex_incidence(vertex_edge_index: np.ndarray, num_vertices: int,
                           max_degree: int = 0):
    """Native incidence table, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    vei = np.ascontiguousarray(vertex_edge_index, np.int64)
    F = vei.shape[1]
    D = int(lib.incidence_max_degree(vei, F, num_vertices))
    if max_degree:
        if D > max_degree:
            raise ValueError(f"vertex degree {D} exceeds max_degree")
        D = max_degree
    edge_id = np.zeros((num_vertices, D), np.int32)
    half = np.zeros((num_vertices, D), np.int32)
    valid = np.zeros((num_vertices, D), np.uint8)
    rc = lib.incidence_fill(vei, F, num_vertices, D, edge_id, half, valid)
    if rc != 0:
        raise ValueError("native incidence fill overflow")
    return edge_id, half, valid.astype(bool)


def banded_fill(tgt, src, w, rows: int, tile: int, B: int, offsets):
    """Dense banded one-hot fill from flat (target, source, weight) triples;
    returns (rows // tile, tile, B) float32, or None when the native library
    is unavailable (callers fall back to np.add.at)."""
    lib = get_lib()
    if lib is None:
        return None
    tgt = np.ascontiguousarray(tgt, np.int64)
    src = np.ascontiguousarray(src, np.int64)
    w = np.ascontiguousarray(w, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    onehot = np.zeros((rows, B), np.float32)
    dropped = lib.banded_fill_flat(tgt, src, w, len(tgt), tile, B, offsets,
                                   onehot)
    if dropped:
        raise ValueError(
            f"banded_fill: {dropped} entries outside band width {B} — "
            "band offsets/width are inconsistent with the sources")
    return onehot.reshape(rows // tile, tile, B)
