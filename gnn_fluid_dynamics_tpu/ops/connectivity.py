"""Mesh connectivity construction (numpy, offline preprocessing path).

Reproduces the numerical contract of the reference's connectivity builder
(``src/utils/geometry.py:64-170``), which itself replicates DeepMind
MeshGraphNets' ``triangles_to_faces`` ordering, but fully vectorized:
the reference builds dictionaries in O(N) Python loops; here everything is
``np.unique``/argsort, ~100x faster and deterministic.

Contract being matched:

* edges are collected per cell in local order ``(v0,v1), (v1,v2), (v2,v0)``;
* each edge is packed as ``(max_vertex, min_vertex)`` = (sender, receiver);
* the unique-edge list is sorted lexicographically by (sender, receiver) —
  this ordering defines the global face ids;
* ``face_index[j, i]`` = global face id of local edge ``j`` of cell ``i``;
* ``cell_edge_index`` = ``[owner, neighbour]`` where (pre-reorder) the owner is
  the lower-indexed cell; boundary faces are self-loops ``[c, c]``;
* ``reorder_face`` then deterministically orients each cell pair so the owner
  is the cell whose centroid has larger x (ties: larger y keeps original
  orientation only when dx == 0 and dy > 0) — reference
  ``src/utils/geometry.py:173-202``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def compute_connectivity(cells: np.ndarray, vertex_pos: np.ndarray):
    """Compute (face_index, cell_edge_index, vertex_edge_index).

    Args:
        cells: (C, 3) int vertex indices of each triangle.
        vertex_pos: (V, 2) float vertex coordinates.

    Returns:
        face_index: (3, C) int64 — global face ids of each cell's local edges.
        cell_edge_index: (2, F) int64 — [owner, neighbour] cells per face,
            self-loops on boundaries, oriented by the centroid rule.
        vertex_edge_index: (2, F) int64 — [sender(max), receiver(min)] vertices.
    """
    cells = np.asarray(cells, dtype=np.int64)
    num_cells = cells.shape[0]

    # local edges in triangles_to_faces order: rows [all e0; all e1; all e2]
    edges = np.concatenate(
        [cells[:, 0:2], cells[:, 1:3], cells[:, [2, 0]]], axis=0)  # (3C, 2)
    senders = edges.max(axis=1)
    receivers = edges.min(axis=1)
    packed = np.stack([senders, receivers], axis=1)  # (3C, 2)

    # unique sorts lexicographically by (sender, receiver) — defines face ids
    unique_edges, inverse = np.unique(packed, axis=0, return_inverse=True)
    inverse = inverse.reshape(-1)
    num_faces = unique_edges.shape[0]
    vertex_edge_index = unique_edges.T.copy()  # (2, F) [sender, receiver]

    # face_index[j, i] = face id of local edge j of cell i.
    # packed row order is [e0 of all cells, e1 of all cells, e2 of all cells].
    face_index = inverse.reshape(3, num_cells)

    # owner = first cell encountered scanning cells in index order (per local
    # edge within a cell order is irrelevant: a face appears at most once per
    # cell). Emulate dict-insertion order: flatten (cell-major, local-edge
    # minor) then stable-sort by face id.
    flat_face = face_index.T.reshape(-1)          # cell-major order
    flat_cell = np.repeat(np.arange(num_cells), 3)
    order = np.argsort(flat_face, kind="stable")
    sorted_face = flat_face[order]
    sorted_cell = flat_cell[order]
    first = np.searchsorted(sorted_face, np.arange(num_faces), side="left")
    last = np.searchsorted(sorted_face, np.arange(num_faces), side="right") - 1
    owner = sorted_cell[first]
    neighbour = sorted_cell[last]  # == owner for boundary faces (count==1)
    counts = last - first + 1
    if counts.max() > 2:
        raise ValueError("non-manifold mesh: a face shared by >2 cells")
    cell_edge_index = np.stack([owner, neighbour], axis=0)

    # reorder by centroid rule (reference reorder_face)
    centroids = vertex_pos[cells].mean(axis=1)
    cell_edge_index = reorder_face(centroids, cell_edge_index.T).T

    return face_index, cell_edge_index, vertex_edge_index


def reorder_face(pos: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Deterministic edge orientation (reference ``geometry.py:173-202``).

    Keeps ``(sender, receiver)`` iff ``pos[sender].x - pos[receiver].x > 0`` or
    (``dx == 0`` and ``dy > 0``); otherwise swaps. Works on (E, 2) arrays.
    """
    edges = np.asarray(edges)
    senders, receivers = edges[:, 0], edges[:, 1]
    edge_vec = pos[senders] - pos[receivers]
    keep = (edge_vec[:, 0] > 0) | ((edge_vec[:, 0] == 0) & (edge_vec[:, 1] > 0))
    out = np.where(keep[:, None], edges, edges[:, ::-1])
    return out


def compute_cell_face_sign(face_index: np.ndarray,
                           cell_edge_index: np.ndarray) -> np.ndarray:
    """Static per-(cell, local-slot) flux signs.

    Replaces the dynamic owner/neighbour sign logic of reference
    ``src/utils/fvm.py:96-156`` (``face_flux_to_cell_flux_vectorized``): the
    sign is +1 where the cell owns the face, -1 where it is the interior
    neighbour, and +1 on boundary faces (owner side only; the reference does
    not flip boundary faces).

    Returns (C, 3) float32.
    """
    owner = cell_edge_index[0]
    neighbour = cell_edge_index[1]
    C = face_index.shape[1]
    cell_ids = np.arange(C)[:, None]            # (C, 1)
    gface = face_index.T                        # (C, 3)
    f_owner = owner[gface]                      # (C, 3)
    f_neigh = neighbour[gface]
    interior = f_owner != f_neigh
    sign = np.where(cell_ids == f_owner, 1.0,
                    np.where(interior & (cell_ids == f_neigh), -1.0, 0.0))
    if np.any(sign == 0.0):
        raise ValueError("inconsistent cell-face connectivity")
    return sign.astype(np.float32)


def compute_owner_local_slot(face_index: np.ndarray,
                             cell_edge_index: np.ndarray) -> np.ndarray:
    """For each global face, the owner cell's local slot (0..2) holding it.

    Static replacement for reference ``src/utils/fvm.py:74-92``
    (``convert_cell_flux_to_face_flux``'s argmax-over-mask).
    Returns (F,) int64.
    """
    owner = cell_edge_index[0]
    owner_faces = face_index[:, owner]                     # (3, F)
    face_ids = np.arange(face_index.max() + 1)
    mask = owner_faces == face_ids[None, :]                # (3, F)
    if not np.all(mask.sum(axis=0) == 1):
        raise ValueError("each face must appear exactly once in its owner cell")
    return np.argmax(mask, axis=0)


def compute_cell_volume(vertex_pos: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Triangle area by the shoelace formula (reference ``geometry.py:287-306``)."""
    v0 = vertex_pos[cells[:, 0]]
    v1 = vertex_pos[cells[:, 1]]
    v2 = vertex_pos[cells[:, 2]]
    return 0.5 * np.abs((v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1])
                        - (v2[:, 0] - v0[:, 0]) * (v1[:, 1] - v0[:, 1]))


def correct_normals(cell_pos, cell_edge_index, face_normal, face_pos):
    """Orient face normals owner -> neighbour (reference ``geometry.py:321-327``)."""
    owners = cell_edge_index[0]
    cell_to_face = face_pos - cell_pos[owners]
    flip = np.sum(cell_to_face * face_normal, axis=1) < 0
    out = face_normal.copy()
    out[flip] *= -1
    return out


def compute_cell_normal(cell_pos, face_index, face_normal, face_pos):
    """Outward unit normals per (cell, local face) (reference ``geometry.py:205-268``).

    Returns (C, 3, 2): the global face normal, flipped wherever it points
    toward the cell centroid.
    """
    gface = face_index.T                                  # (C, 3)
    f_uv = face_normal[gface]                             # (C, 3, 2)
    f_ctr = face_pos[gface]                               # (C, 3, 2)
    vec_to_centroid = cell_pos[:, None, :] - f_ctr        # (C, 3, 2)
    dots = np.sum(f_uv * vec_to_centroid, axis=-1)        # (C, 3)
    return np.where((dots > 0)[..., None], -f_uv, f_uv)


def classify_edges(vertex_edge_index, vertex_types, class_types) -> np.ndarray:
    """Classify faces from their two vertex types (reference ``geometry.py:389-424``).

    ``class_types`` is an enum-like namespace with NORMAL / WALL_BOUNDARY /
    INFLOW / OUTFLOW / SLIP attributes.
    """
    vertex_types = np.asarray(vertex_types).reshape(-1)
    v1 = vertex_types[vertex_edge_index[0]]
    v2 = vertex_types[vertex_edge_index[1]]
    edge_types = np.full_like(v1, class_types.NORMAL)

    same = v1 == v2
    for t in (class_types.WALL_BOUNDARY, class_types.INFLOW,
              class_types.OUTFLOW, class_types.SLIP):
        edge_types[same & (v1 == t)] = t

    wall, slip = class_types.WALL_BOUNDARY, class_types.SLIP
    inflow, outflow = class_types.INFLOW, class_types.OUTFLOW
    inflow_mask = (((v1 == wall) & (v2 == inflow)) | ((v1 == inflow) & (v2 == wall))
                   | ((v1 == slip) & (v2 == inflow)) | ((v1 == inflow) & (v2 == slip)))
    edge_types[inflow_mask] = inflow
    outflow_mask = (((v1 == wall) & (v2 == outflow)) | ((v1 == outflow) & (v2 == wall))
                    | ((v1 == slip) & (v2 == outflow)) | ((v1 == outflow) & (v2 == slip)))
    edge_types[outflow_mask] = outflow
    return edge_types


def compute_connectivity_full(cells: np.ndarray, vertex_pos: np.ndarray,
                              use_native: bool = True):
    """Connectivity + derived sign/slot tables in one pass.

    Uses the C++ builder (:mod:`gnn_fluid_dynamics_tpu.native`) when a
    compiler/library is available — identical contract, ~100x faster on large
    meshes — else the vectorized numpy path.
    """
    if use_native:
        try:
            from gnn_fluid_dynamics_tpu import native
            result = native.compute_connectivity(cells, vertex_pos)
            if result is not None:
                return result
        except Exception:
            pass
    face_index, cell_edge_index, vertex_edge_index = compute_connectivity(
        cells, vertex_pos)
    sign = compute_cell_face_sign(face_index, cell_edge_index)
    slot = compute_owner_local_slot(face_index, cell_edge_index)
    return face_index, cell_edge_index, vertex_edge_index, sign, slot


def build_geometry(vertex_pos: np.ndarray, cells: np.ndarray,
                   vertex_types: np.ndarray, class_types,
                   use_native: bool = True) -> Dict[str, np.ndarray]:
    """Full geometry pipeline — the analogue of reference
    ``DataSet.write_geometry`` (``src/datasets/DataSet.py:276-312``), plus the
    precomputed static sign/slot tables that make TPU flux ops pure gathers.
    """
    vertex_pos = np.asarray(vertex_pos, dtype=np.float64)
    cells = np.asarray(cells, dtype=np.int64)
    (face_index, cell_edge_index, vertex_edge_index, cell_face_sign,
     owner_local_slot) = compute_connectivity_full(cells, vertex_pos,
                                                   use_native=use_native)

    vertex_edge_vector = (vertex_pos[vertex_edge_index[1]]
                          - vertex_pos[vertex_edge_index[0]])
    face_area = np.linalg.norm(vertex_edge_vector, axis=1).reshape(-1, 1)
    face_pos = vertex_pos[vertex_edge_index.T].mean(axis=1)

    cell_pos = vertex_pos[cells].mean(axis=1)
    cell_volume = compute_cell_volume(vertex_pos, cells).reshape(-1, 1)

    normal = np.stack([-vertex_edge_vector[:, 1], vertex_edge_vector[:, 0]], axis=1)
    face_normal = normal / (np.linalg.norm(normal, axis=1, keepdims=True) + 1e-8)
    face_normal = correct_normals(cell_pos, cell_edge_index, face_normal, face_pos)
    face_type = classify_edges(vertex_edge_index, vertex_types, class_types)
    face_boundary_mask = cell_edge_index[0] == cell_edge_index[1]
    cell_normal = compute_cell_normal(cell_pos, face_index, face_normal, face_pos)

    return {
        "vertex_pos": vertex_pos.astype(np.float32),
        "vertex_edge_index": vertex_edge_index,
        "vertex_face": cells.T,
        "vertex_edge_vector": vertex_edge_vector.astype(np.float32),
        "face_normal": face_normal.astype(np.float32),
        "face_pos": face_pos.astype(np.float32),
        "face_area": face_area.astype(np.float32),
        "face_index": face_index,
        "face_type": face_type.reshape(-1, 1).astype(np.int64),
        "face_boundary_mask": face_boundary_mask,
        "cell_pos": cell_pos.astype(np.float32),
        "cell_edge_index": cell_edge_index,
        "cell_volume": cell_volume.astype(np.float32),
        "cell_normal": cell_normal.astype(np.float32),
        "cell_face_sign": np.asarray(cell_face_sign, np.float32),
        "owner_local_slot": np.asarray(owner_local_slot),
    }
