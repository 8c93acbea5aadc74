"""Jittable feature transforms (noise, edge flip, feature assembly).

Functional counterparts of reference ``src/utils/transforms.py`` plus the
model-specific ``transform_features`` plumbing (e.g. ``Fvgn.py:101-131``),
operating on the padded :class:`MeshGraph` with explicit PRNG keys instead of
global torch RNG, and masked where-updates instead of boolean in-place writes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from gnn_fluid_dynamics_tpu.data.node_types import NodeType
from gnn_fluid_dynamics_tpu.graph import MeshGraph


def add_noise(key: jax.Array, x: jax.Array, std) -> jax.Array:
    """Gaussian training noise (reference ``transforms.py:19-22``)."""
    return x + std * jax.random.normal(key, x.shape, x.dtype)


def random_edge_flip(key: jax.Array, graph: MeshGraph) -> Tuple[MeshGraph, jax.Array]:
    """Random per-face orientation flip augmentation.

    Reference ``transforms.py:3-7`` flips ``cell_edge_index`` columns; model
    ``transform_features`` then flips ``face_normal`` (and ``face_flux``) for
    non-boundary flipped faces (``Fvgn.py:111-114``, ``Flux.py:70-74``).

    TPU-native addition: the precomputed ``cell_face_sign`` table (which
    encodes ownership) must flip consistently, and so must ``owner_local_slot``
    (ownership swaps to the other cell). Returns (new_graph, safe_flip_mask).
    """
    F = graph.num_faces
    flip = jax.random.bernoulli(key, 0.5, (F,)) & graph.face_mask
    boundary = graph.cell_edge_index[0] == graph.cell_edge_index[1]
    safe = flip & ~boundary

    cei = jnp.where(flip[None, :], graph.cell_edge_index[::-1], graph.cell_edge_index)
    sgn = jnp.where(safe, -1.0, 1.0)
    face_normal = graph.face_normal * sgn[:, None]
    face_flux = (None if graph.face_flux is None
                 else graph.face_flux * sgn[:, None, None])
    # ownership flip: per (cell, slot) multiply by the face's flip sign
    cell_face_sign = graph.cell_face_sign * sgn[graph.face_index.T]
    # owner slot: after a flip the owner is the previous neighbour; its local
    # slot is found in the *new* owner's face list. Precomputing both slots
    # statically is possible but the search is cheap and static-shape:
    new_owner = cei[0]                                        # (F,)
    owner_faces = graph.face_index[:, new_owner]              # (3, F)
    face_ids = jnp.arange(F)[None, :]
    owner_local_slot = jnp.argmax(owner_faces == face_ids, axis=0).astype(jnp.int32)

    g = graph.replace(cell_edge_index=cei, face_normal=face_normal,
                      cell_face_sign=cell_face_sign,
                      owner_local_slot=owner_local_slot)
    if face_flux is not None:
        g = g.replace(face_flux=face_flux)
    return g, safe


def calc_face_velocity_change(cell_velocity: jax.Array,
                              cell_edge_index: jax.Array) -> jax.Array:
    """v[owner] - v[neighbour] per face (reference ``transforms.py:9-11``)."""
    return cell_velocity[cell_edge_index[0]] - cell_velocity[cell_edge_index[1]]


def calc_cell_edge_vector(cell_pos: jax.Array,
                          cell_edge_index: jax.Array) -> jax.Array:
    """pos[owner] - pos[neighbour] per face (reference ``transforms.py:13-14``)."""
    return cell_pos[cell_edge_index[0]] - cell_pos[cell_edge_index[1]]


def calc_face_type_one_hot(face_type: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(face_type.reshape(-1), num_classes)


def interior_face_mask(face_type: jax.Array) -> jax.Array:
    """'FVGN-like boundaries': interior = NORMAL|OUTFLOW|SLIP|WALL, so the
    bc mask marks INFLOW faces only (reference ``Fvgn.py:117-119``)."""
    ft = face_type.reshape(-1)
    interior = ((ft == NodeType.NORMAL) | (ft == NodeType.OUTFLOW)
                | (ft == NodeType.SLIP) | (ft == NodeType.WALL_BOUNDARY))
    return interior


def rollout_bc_mask(face_type: jax.Array) -> jax.Array:
    """Faces clamped to ground-truth BCs during rollout: INFLOW | WALL
    (reference ``Fvgn.py:142-144``)."""
    ft = face_type.reshape(-1)
    return (ft == NodeType.INFLOW) | (ft == NodeType.WALL_BOUNDARY)


def standard_face_features(graph: MeshGraph, cell_velocity: jax.Array,
                           num_types: int,
                           bc_velocity: jax.Array = None) -> Tuple[jax.Array, jax.Array]:
    """The shared face feature assembly
    [Δv_f (2) | Δpos (2) | area (1) | one-hot type (num_types)]
    with INFLOW faces' Δv overwritten by the BC face velocity
    (reference ``Fvgn.py:121-125``). Returns (face_x, bc_mask)."""
    dv = calc_face_velocity_change(cell_velocity, graph.cell_edge_index)
    bc_mask = ~interior_face_mask(graph.face_type)
    if bc_velocity is not None:
        dv = jnp.where(bc_mask[:, None], bc_velocity, dv)
    ev = calc_cell_edge_vector(graph.cell_pos, graph.cell_edge_index)
    onehot = calc_face_type_one_hot(graph.face_type, num_types)
    face_x = jnp.concatenate([dv, ev, graph.face_area, onehot], axis=1)
    return face_x, bc_mask
