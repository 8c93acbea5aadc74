"""Finite-volume numerics kernels (pure JAX, jit/vmap friendly).

Re-implementation of the reference ops layer ``src/utils/fvm.py`` with one
crucial TPU-first change: the owner/neighbour sign bookkeeping that the
reference resolves dynamically per call (``fvm.py:96-156``) is precomputed into
static per-mesh tables (``cell_face_sign``, ``owner_local_slot``; see
``ops/connectivity.py``), so every flux conversion is a plain gather that XLA
fuses — no scatter, no data-dependent control flow.

All functions operate on padded arrays; contributions from padded elements are
zeroed by the masks carried in :class:`~gnn_fluid_dynamics_tpu.graph.MeshGraph`
(padded faces have ``face_area == 0`` and ``cell_face_sign == 0`` rows only for
padded cells, so sums are naturally unaffected where noted).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chain_dot_product(a: jax.Array, b: jax.Array, keepdims: bool = True) -> jax.Array:
    """Row-wise dot product (reference ``src/utils/maths.py:8-9``)."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def chain_flux_dot_product(a: jax.Array, b: jax.Array) -> jax.Array:
    """Dot each consecutive 2-column block of ``a`` with the 2-vector rows of
    ``b`` (reference ``src/utils/maths.py:12-20``).

    a: (N, 2k), b: (N, 2) -> (N, k).
    """
    n, cols = a.shape
    assert cols % 2 == 0 and b.shape[-1] == 2
    a2 = a.reshape(n, cols // 2, 2)
    return jnp.einsum("nkd,nd->nk", a2, b)


def divergence_from_face_flux(face_flux: jax.Array, face_index: jax.Array) -> jax.Array:
    """Sum of the (owner-oriented) flux over each cell's 3 faces
    (reference ``fvm.py:4-10``). face_flux: (F, 1) -> (C, 1)."""
    return (face_flux[face_index[0]] + face_flux[face_index[1]]
            + face_flux[face_index[2]])


def divergence_from_cell_flux(cell_flux: jax.Array) -> jax.Array:
    """Sum of per-cell signed local fluxes (reference ``fvm.py:13-19``).
    cell_flux: (C, 3) -> (C, 1)."""
    return jnp.sum(cell_flux, axis=1, keepdims=True)


def calc_flux_from_uf(face_velocity: jax.Array, face_normal: jax.Array,
                      face_area: jax.Array) -> jax.Array:
    """phi_f = (u_f . n_f) A_f (reference ``fvm.py:22-23``). -> (F, 1)."""
    return (chain_dot_product(face_velocity, face_normal)
            * face_area.reshape(-1, 1))


def divergence_from_uf(face_velocity: jax.Array, cell_normal: jax.Array,
                       face_area: jax.Array, face_index: jax.Array) -> jax.Array:
    """Divergence of a face-velocity field: sum_k (u_{f_k} . n_k) A_{f_k}
    over each cell's 3 faces with outward cell normals
    (reference ``fvm.py:26-37``).

    face_velocity: (F, 2), cell_normal: (C, 3, 2), face_area: (F, 1) or (F,),
    face_index: (3, C) -> (C, 1).
    """
    area = face_area.reshape(-1)
    uf = face_velocity[face_index.T]              # (C, 3, 2)
    af = area[face_index.T][..., None]            # (C, 3, 1)
    div = jnp.sum(uf * cell_normal * af, axis=(1, 2))
    return div[:, None]


def divergence_from_uc(cell_velocity: jax.Array, weights: jax.Array,
                       neighbours: jax.Array, cell_volume: jax.Array) -> jax.Array:
    """MLS divergence of a cell-velocity field (reference ``fvm.py:40-52``).

    cell_velocity: (C, 2), weights: (C, K, 2), neighbours: (C, K) ->
    (C, 1), scaled by cell volume as in the reference.
    """
    ux, uy = cell_velocity[:, 0], cell_velocity[:, 1]
    diff_x = ux[neighbours] - ux[:, None]
    diff_y = uy[neighbours] - uy[:, None]
    grad_x = jnp.sum(weights[:, :, 0] * diff_x, axis=1)
    grad_y = jnp.sum(weights[:, :, 1] * diff_y, axis=1)
    return (grad_x + grad_y)[:, None] * cell_volume.reshape(-1, 1)


def face_flux_to_cell_flux(face_flux: jax.Array, face_index: jax.Array,
                           cell_face_sign: jax.Array) -> jax.Array:
    """Owner-oriented face flux -> signed per-cell local flux.

    TPU-native replacement for reference ``fvm.py:96-156``
    (``face_flux_to_cell_flux_vectorized``): the dynamic owner/neighbour
    resolution is a precomputed ``cell_face_sign`` (C, 3) gather.

    face_flux: (F, 1) or (F,) -> (C, 3, 1).
    """
    ff = face_flux.reshape(-1)
    return (ff[face_index.T] * cell_face_sign)[..., None]


def cell_flux_to_face_flux(cell_flux: jax.Array, cell_edge_index: jax.Array,
                           owner_local_slot: jax.Array) -> jax.Array:
    """Per-cell local flux -> owner-oriented face flux.

    Replacement for reference ``fvm.py:55-94`` (``convert_cell_flux_to_face_flux``):
    the local-slot search is the precomputed ``owner_local_slot`` gather.

    cell_flux: (C, 3) or (C, 3, 1) -> (F, 1).
    """
    cf = cell_flux.reshape(cell_flux.shape[0], 3)
    owners = cell_edge_index[0]
    return cf[owners, owner_local_slot][:, None]


def cell_flux_to_face_flux_lastwrite(cell_flux: jax.Array,
                                     cell_edge_index: jax.Array,
                                     face_index: jax.Array) -> jax.Array:
    """Exact replica of the reference ``geometry.cell_flux_to_face_flux``
    (geometry.py:539-570) including its index-pairing bug: the write targets
    come from ``cell_faces.flatten()`` (slot-major: ``face_index[k // C,
    k % C]``) while the written values and the owner test use
    cell-major pairing (``cell_flux[k // 3, k % 3]``, ``cell == k // 3``), so
    value, sign, and destination belong to three DIFFERENT (cell, slot)
    pairs; duplicate writes resolve last-write-wins (torch scatter
    assignment). VertPotG feeds its converted flux through this
    (VertPot.py:679), so faithful parity requires reproducing it verbatim.

    cell_flux: (C, 3) or (C, 3, 1) -> (F, 1).
    """
    cf = cell_flux.reshape(cell_flux.shape[0], 3)
    C = cf.shape[0]
    F = cell_edge_index.shape[1]
    k = jnp.arange(3 * C)
    dest = face_index[k // C, k % C]          # slot-major flatten
    vals = cf.reshape(-1)                     # cell-major: cf[k//3, k%3]
    owner_of_dest = cell_edge_index[0][dest]
    sign = jnp.where(owner_of_dest == (k // 3), 1.0, -1.0)
    corrected = vals * sign
    # torch duplicate-index assignment keeps the LAST write in k-order
    kwin = jax.ops.segment_max(k, dest, num_segments=F)
    kwin = jnp.clip(kwin, 0, 3 * C - 1)       # faces never written: junk row
    return corrected[kwin][:, None]


def calc_gradient_tensor(value: jax.Array, weights: jax.Array,
                         neighbours: jax.Array) -> jax.Array:
    """MLS velocity-gradient tensor at faces (reference
    ``src/utils/geometry.py:520-537``).

    value: (F, 2), weights: (F, K, 2), neighbours: (F, K) -> (F, 4) as
    [g_xx, g_xy, g_yx, g_yy] with the reference's exact (quirky) pairing:
    g_xy = sum w_y * dv_y, g_yx = sum w_x * dv_y, g_yy = sum w_y * dv_x.
    """
    vx, vy = value[:, 0], value[:, 1]
    dx = vx[neighbours] - vx[:, None]
    dy = vy[neighbours] - vy[:, None]
    g_xx = jnp.sum(weights[:, :, 0] * dx, axis=1)
    g_xy = jnp.sum(weights[:, :, 1] * dy, axis=1)
    g_yx = jnp.sum(weights[:, :, 0] * dy, axis=1)
    g_yy = jnp.sum(weights[:, :, 1] * dx, axis=1)
    return jnp.stack([g_xx, g_xy, g_yx, g_yy], axis=1)


def face_flux_to_cell_flux_dummy(face_index: jax.Array,
                                 cell_face_sign: jax.Array) -> jax.Array:
    """+1 on owner slots, -1 on interior-neighbour slots — the reference's
    self-verification pattern (``fvm.py:158-206``). With the precomputed sign
    table this is just the table itself."""
    del face_index
    return cell_face_sign[..., None]


def face_flux_to_cell_flux_g(face_flux, graph):
    """Graph-aware :func:`face_flux_to_cell_flux`: uses the fc3 banded
    selector (one einsum) when the graph carries it, else the row gather."""
    if getattr(graph, "fc3_onehot", None) is not None:
        from gnn_fluid_dynamics_tpu.ops.banded import banded_matmul
        g = banded_matmul(graph.fc3_onehot, graph.fc3_start,
                          face_flux.reshape(-1, 1), graph.fc3_off)
        g = g[: 3 * graph.num_cells].reshape(-1, 3, 1)
        return g * graph.cell_face_sign[..., None]
    return face_flux_to_cell_flux(face_flux, graph.face_index,
                                  graph.cell_face_sign)
