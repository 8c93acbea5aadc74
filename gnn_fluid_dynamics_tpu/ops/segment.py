"""Graph aggregation primitives for TPU.

The reference's hot inner loop is ``scatter_add`` of edge features onto mesh
vertices followed by gathering each cell's 3 vertices
(``src/models/Fvgn.py:298-325``). On TPU, XLA lowers ``segment_sum`` to a
serialized scatter which wastes the VPU, so this module offers two layouts:

1. ``segment_sum`` — the portable baseline (``jax.ops.segment_sum``).
2. *incidence gather* — a precomputed, padded CSR-like table
   ``(V, max_degree)`` of (edge id, half) pairs per vertex; aggregation becomes
   pure gathers + a masked sum over a small static axis, which XLA vectorizes
   and fuses. Mesh vertex degree is ~6 for triangulations, so the padding waste
   is small and the win over scatter is large.

The incidence table is static per mesh geometry and is built offline in numpy.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def masked_mean(x: jax.Array, mask: jax.Array, axis=None, keepdims=False):
    """Mean over elements where mask is True (mask broadcasts against x)."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    s = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    n = jnp.sum(m * jnp.ones_like(x), axis=axis, keepdims=keepdims)
    return s / jnp.maximum(n, 1.0)


class VertexIncidence(NamedTuple):
    """Padded incidence table: for vertex v, ``edge_id[v, j]`` is the j-th
    incident face and ``half[v, j]`` in {0, 1} says whether v is the
    sender (0, forward half) or receiver (1, reverse half); ``valid[v, j]``
    masks padding."""
    edge_id: np.ndarray  # (V, D) int32
    half: np.ndarray     # (V, D) int32
    valid: np.ndarray    # (V, D) bool


def build_vertex_incidence(vertex_edge_index: np.ndarray, num_vertices: int,
                           max_degree: int = 0) -> VertexIncidence:
    """Build the static vertex<-edge incidence table from (2, F) sender/receiver
    pairs. ``max_degree`` pads/clips the table width (0 = use the mesh max)."""
    senders, receivers = np.asarray(vertex_edge_index)
    F = senders.shape[0]
    counts = np.zeros(num_vertices, np.int64)
    np.add.at(counts, senders, 1)
    np.add.at(counts, receivers, 1)
    D = int(counts.max()) if max_degree == 0 else max_degree
    edge_id = np.zeros((num_vertices, D), np.int32)
    half = np.zeros((num_vertices, D), np.int32)
    valid = np.zeros((num_vertices, D), bool)
    cursor = np.zeros(num_vertices, np.int64)
    for h, verts in enumerate((senders, receivers)):
        for e in range(F):
            v = verts[e]
            j = cursor[v]
            if j >= D:
                raise ValueError(f"vertex degree exceeds max_degree={D}")
            edge_id[v, j] = e
            half[v, j] = h
            valid[v, j] = True
            cursor[v] += 1
    return VertexIncidence(edge_id, half, valid)


def aggregate_edges_to_vertices_scatter(
        fwd: jax.Array, rev: jax.Array, vertex_edge_index: jax.Array,
        num_vertices: int) -> jax.Array:
    """Baseline: scatter-add the forward half onto senders and the reverse half
    onto receivers (exactly reference ``Fvgn.py:307-314``).

    fwd, rev: (F, H/2) -> (V, H/2).
    """
    senders, receivers = vertex_edge_index[0], vertex_edge_index[1]
    out = jax.ops.segment_sum(fwd, senders, num_segments=num_vertices)
    out = out + jax.ops.segment_sum(rev, receivers, num_segments=num_vertices)
    return out


def aggregate_edges_to_vertices_gather(
        edge_attr: jax.Array, incidence_edge_id: jax.Array,
        incidence_half: jax.Array, incidence_valid: jax.Array) -> jax.Array:
    """Incidence-gather aggregation: out[v] = sum_j half==0 ? fwd[e_j] : rev[e_j].

    edge_attr: (F, H) whose rows are [fwd | rev] halves; incidence arrays
    (V, D) -> (V, H/2).

    The row-major (F, H) buffer reshaped to (2F, H/2) interleaves
    [fwd_0, rev_0, fwd_1, ...], so selecting the right half is index
    arithmetic (2*edge + half) on a zero-copy view — ONE gather of V*D rows
    and a masked sum over the static degree axis. No scatter, half the gather
    traffic of the naive fwd+rev formulation.
    """
    F, H = edge_attr.shape
    half_rows = edge_attr.reshape(2 * F, H // 2)
    idx = incidence_edge_id * 2 + incidence_half            # (V, D)
    sel = half_rows[idx]                                    # (V, D, H/2)
    sel = sel * incidence_valid[..., None].astype(edge_attr.dtype)
    return jnp.sum(sel, axis=1)


def aggregate_edges_to_vertices_sum(edge_attr: jax.Array, graph) -> jax.Array:
    """Full-width edge sum onto BOTH endpoint vertices (the VertPot family's
    Vertex_Block, reference ``VertPot.py:212-222``). Uses the incidence table
    when present (one gather), else two segment sums."""
    if graph.vertex_inc_edge is not None:
        sel = edge_attr[graph.vertex_inc_edge]          # (V, D, H)
        sel = sel * graph.vertex_inc_valid[..., None].astype(edge_attr.dtype)
        return jnp.sum(sel, axis=1)
    senders, receivers = graph.vertex_edge_index[0], graph.vertex_edge_index[1]
    out = jax.ops.segment_sum(edge_attr, senders,
                              num_segments=graph.num_vertices)
    return out + jax.ops.segment_sum(edge_attr, receivers,
                                     num_segments=graph.num_vertices)


def gather_vertices_to_cells(vertex_values: jax.Array,
                             vertex_face: jax.Array) -> jax.Array:
    """Average of each cell's 3 vertex values (reference ``Fvgn.py:317-321``).

    vertex_values: (V, H), vertex_face: (3, C) -> (C, H).
    """
    return (vertex_values[vertex_face[0]] + vertex_values[vertex_face[1]]
            + vertex_values[vertex_face[2]]) / 3.0
