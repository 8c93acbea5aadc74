"""Banded one-hot aggregation tables.

TPU gathers/scatters process ~1 row per cycle, which caps graph message
passing far below MXU rates. After an RCM reordering
(:mod:`gnn_fluid_dynamics_tpu.ops.reorder`), every tile of 128 consecutive
target entities touches only a narrow contiguous *band* of source rows, so
aggregation becomes

    out[tile] = S[tile] @ src[band_start[tile] : band_start[tile] + B]

— a batch of small dense matmuls on the MXU with static slice starts. ``S``
holds the 0/1 (or 1/3, or signed) incidence weights; band width ``B`` is a
compile-time constant per mesh. This turns the three hot gathers of a GN block
(half-edge->vertex, vertex->cell, cell->face owner/neighbour) into einsums.

Tables are built offline in numpy and carried in :class:`MeshGraph`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _build_table(targets_to_sources, num_targets: int, num_sources: int,
                 weights=None, tile: int = TILE):
    """Generic banded table: ``targets_to_sources[t]`` lists (source, weight)
    pairs. Returns (band_start (T,), onehot (T, tile, B)) or None if the band
    would not be materially narrower than the full source range."""
    Tn = _round_up(max(num_targets, 1), tile) // tile
    lo = np.full(Tn, num_sources, np.int64)
    hi = np.zeros(Tn, np.int64)
    for tgt in range(num_targets):
        t = tgt // tile
        for src, _ in targets_to_sources[tgt]:
            lo[t] = min(lo[t], src)
            hi[t] = max(hi[t], src)
    lo = np.minimum(lo, np.maximum(hi, 0))
    B = int((hi - lo + 1).max()) if num_targets else 1
    B = _round_up(max(B, 1), tile)
    if B >= num_sources:
        B = _round_up(num_sources, tile)
    band_start = np.minimum(lo, max(num_sources - B, 0)).astype(np.int32)
    onehot = np.zeros((Tn, tile, B), np.float32)
    for tgt in range(num_targets):
        t, r = divmod(tgt, tile)
        for src, w in targets_to_sources[tgt]:
            onehot[t, r, src - band_start[t]] += w
    return band_start, onehot


@dataclasses.dataclass
class BandedTables:
    """All banded tables for one mesh (numpy)."""
    hv_start: np.ndarray      # (Tv,)  half-edge -> vertex
    hv_onehot: np.ndarray     # (Tv, 128, Bhv)
    vc_start: np.ndarray      # (Tc,)  vertex -> cell (weights 1/3)
    vc_onehot: np.ndarray     # (Tc, 128, Bvc)
    cf_start: np.ndarray      # (Tf,)  cell -> face band (shared row/col)
    cf_row_onehot: np.ndarray  # (Tf, 128, Bcf) owner selector
    cf_col_onehot: np.ndarray  # (Tf, 128, Bcf) neighbour selector

    @property
    def max_band(self) -> int:
        return max(self.hv_onehot.shape[2], self.vc_onehot.shape[2],
                   self.cf_row_onehot.shape[2])


def build_banded_tables(geom: Dict[str, np.ndarray],
                        tile: int = TILE) -> BandedTables:
    vei = np.asarray(geom["vertex_edge_index"])
    V = geom["vertex_pos"].shape[0]
    F = vei.shape[1]
    C = geom["cell_pos"].shape[0]

    # half-edge -> vertex: vertex v sums fwd halves (2e) of edges it sends and
    # rev halves (2e+1) of edges it receives
    t2s = [[] for _ in range(V)]
    for e in range(F):
        t2s[vei[0, e]].append((2 * e, 1.0))
        t2s[vei[1, e]].append((2 * e + 1, 1.0))
    hv_start, hv_onehot = _build_table(t2s, V, 2 * F, tile=tile)

    # vertex -> cell: mean of the 3 vertices
    vface = np.asarray(geom["vertex_face"])
    t2s = [[(int(vface[j, c]), 1.0 / 3.0) for j in range(3)] for c in range(C)]
    vc_start, vc_onehot = _build_table(t2s, C, V, tile=tile)

    # cell -> face: owner (row) and neighbour (col) selectors over one band
    cei = np.asarray(geom["cell_edge_index"])
    row_t2s = [[(int(cei[0, f]), 1.0)] for f in range(F)]
    col_t2s = [[(int(cei[1, f]), 1.0)] for f in range(F)]
    cf_start_r, cf_row = _build_table(row_t2s, F, C, tile=tile)
    cf_start_c, cf_col = _build_table(col_t2s, F, C, tile=tile)
    # unify the two bands so one slice serves both selectors
    lo = np.minimum(cf_start_r, cf_start_c)
    Bu = _round_up(int(max(cf_row.shape[2] + (cf_start_r - lo).max(),
                           cf_col.shape[2] + (cf_start_c - lo).max())), tile)
    Bu = min(Bu, _round_up(C, tile))
    lo = np.minimum(lo, max(C - Bu, 0)).astype(np.int32)

    def shift(onehot, old_start, new_start, B_new):
        Tn, tl, Bo = onehot.shape
        out = np.zeros((Tn, tl, B_new), np.float32)
        for t in range(Tn):
            off = int(old_start[t] - new_start[t])
            out[t, :, off:off + Bo] = onehot[t][:, :max(0, min(Bo, B_new - off))] \
                if off + Bo <= B_new else onehot[t][:, :B_new - off]
        return out

    cf_row_u = shift(cf_row, cf_start_r, lo, Bu)
    cf_col_u = shift(cf_col, cf_start_c, lo, Bu)

    return BandedTables(hv_start, hv_onehot, vc_start, vc_onehot,
                        lo, cf_row_u, cf_col_u)


# ---------------------------------------------------------------------------
# jittable application
# ---------------------------------------------------------------------------

def _bands(src: jax.Array, starts, B: int) -> jax.Array:
    """Stack static-start slices: (T, B, H). Starts are Python ints at trace
    time (numpy array), so XLA sees static slices."""
    return jnp.stack([
        jax.lax.dynamic_slice(src, (int(s), 0), (B, src.shape[1]))
        for s in np.asarray(starts)])


def banded_matmul(onehot: jax.Array, starts, src: jax.Array) -> jax.Array:
    """out[t*tile + i] = sum_b onehot[t, i, b] * src[starts[t] + b].

    onehot: (T, tile, B); src: (N_src, H) -> (T*tile, H).
    """
    B = onehot.shape[2]
    bands = _bands(src, starts, B)
    out = jnp.einsum("tib,tbh->tih", onehot, bands)
    return out.reshape(-1, src.shape[1])
