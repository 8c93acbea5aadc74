"""Differentiable mesh-geometry ops (pure JAX).

JAX counterparts of the torch-side helpers in reference
``src/utils/geometry.py`` that run inside the model/rollout compute path
(interpolation, kNN, vertex->centroid weighting). Offline/numpy geometry lives
in :mod:`gnn_fluid_dynamics_tpu.ops.connectivity`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cell_to_face(cell_values: jax.Array, cell_edge_index: jax.Array,
                 face_pos: jax.Array, cell_pos: jax.Array) -> jax.Array:
    """Inverse-distance-weighted cell->face interpolation
    (reference ``geometry.py:460-491``, differentiable torch version).

    Boundary faces (owner == neighbour) take the owner cell value only.
    """
    c0 = cell_edge_index[0]
    c1 = cell_edge_index[1]
    d0 = jnp.linalg.norm(face_pos - cell_pos[c0], axis=1)
    d1 = jnp.linalg.norm(face_pos - cell_pos[c1], axis=1)
    w0 = 1.0 / (d0 + 1e-10)
    w1 = jnp.where(c0 == c1, 0.0, 1.0 / (d1 + 1e-10))
    total = w0 + w1
    w0, w1 = w0 / total, w1 / total
    return w0[:, None] * cell_values[c0] + w1[:, None] * cell_values[c1]


def face_to_centroid(face_values: jax.Array, face_index: jax.Array) -> jax.Array:
    """Mean of a cell's 3 face values (reference ``geometry.py:493-498``).

    face_values: (F, 1) -> (C, 1).
    """
    fv = face_values.reshape(-1)
    return jnp.mean(fv[face_index.T], axis=1, keepdims=True)


def interpolate_centroid(values: np.ndarray, cells: np.ndarray,
                         vertex_pos: np.ndarray,
                         cell_centroids: np.ndarray) -> np.ndarray:
    """Distance-proportional vertex->centroid interpolation (numpy,
    preprocessing path; reference ``geometry.py:10-51``). Note the reference's
    quirk: weights are *proportional* to squared distance (farther vertices get
    more weight) — kept for parity."""
    cell_vertex_pos = vertex_pos[cells].astype(np.float64)
    centroids = cell_centroids[:, None, :].astype(np.float64)
    d2 = np.sum((cell_vertex_pos - centroids) ** 2, axis=2)
    total = np.sum(d2, axis=1, keepdims=True) + 1e-15
    w = d2 / total
    vals = values[cells].astype(np.float64)
    return np.sum(w[:, :, None] * vals, axis=1)


def knn(pos: np.ndarray, k: int, mask: np.ndarray = None):
    """k nearest neighbours excluding self (numpy preprocessing path;
    reference ``geometry.py:500-518`` used torch.cdist+topk).

    Returns (neighbours (N, k) int64, distances (N, k) float64). If ``mask``
    is given, masked-out rows are never selected as neighbours.
    """
    pos = np.asarray(pos, dtype=np.float64)
    n = pos.shape[0]
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    if mask is not None:
        d[:, ~np.asarray(mask, bool)] = np.inf
    idx = np.argpartition(d, kth=k - 1, axis=1)[:, :k]
    dist = np.take_along_axis(d, idx, axis=1)
    order = np.argsort(dist, axis=1, kind="stable")
    idx = np.take_along_axis(idx, order, axis=1)
    dist = np.take_along_axis(dist, order, axis=1)
    return idx.astype(np.int64), dist
