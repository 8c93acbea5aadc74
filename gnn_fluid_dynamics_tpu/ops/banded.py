"""Banded one-hot aggregation tables.

TPU gathers/scatters process ~1 row per cycle, which caps graph message
passing far below MXU rates. After an RCM reordering
(:mod:`gnn_fluid_dynamics_tpu.ops.reorder`), every tile of 128 consecutive
target entities touches only a narrow contiguous *band* of source rows, so
aggregation becomes

    out[tile] = S[tile] @ band(tile)

— batched small dense matmuls on the MXU. ``S`` holds the 0/1 (or 1/3)
incidence weights.

Band construction is **chunk-quantized**: sources are viewed as chunks of
``stride`` rows; tile ``t``'s band is ``k`` consecutive chunks starting at a
per-tile chunk index ``q_t``. The chunked view is built from ``k`` shifted
whole-array reshapes (tiny HLO) and the per-tile selection is ONE gather of
large contiguous chunks (bandwidth-efficient, unlike row gathers). This keeps
bands per-tile tight (runtime) with O(k) ops (compile time) — the best of the
per-tile-slice and uniform-stride designs.

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
                 tile: int = TILE):
    """Generic chunk-quantized banded table.

    Returns (stride, k, q (T,), onehot (T, tile, k*stride)): tile t covers
    source rows [q_t*stride, (q_t+k)*stride).
    """
    Tn = _round_up(max(num_targets, 1), tile) // tile
    lo = np.full(Tn, num_sources, np.int64)
    hi = np.zeros(Tn, np.int64)
    for tgt in range(num_targets):
        t = tgt // tile
        for src, _ in targets_to_sources[tgt]:
            lo[t] = min(lo[t], src)
            hi[t] = max(hi[t], src)
    lo = np.minimum(lo, np.maximum(hi, 0))

    # stride ~ sources per target tile (linear growth after RCM)
    stride = max(_round_up(max(num_sources // max(Tn, 1), 1), tile), tile)
    q = lo // stride                                     # per-tile chunk start
    k = int(np.max((hi - q * stride) // stride + 1)) if num_targets else 1
    B = k * stride
    if B >= num_sources + stride:
        stride, k = _round_up(max(num_sources, 1), tile), 1
        q = np.zeros(Tn, np.int64)
        B = stride
    onehot = np.zeros((Tn, tile, B), np.float32)
    for tgt in range(num_targets):
        t, r = divmod(tgt, tile)
        for src, w in targets_to_sources[tgt]:
            onehot[t, r, src - q[t] * stride] += w
    return int(stride), int(k), q.astype(np.int32), onehot


@dataclasses.dataclass
class BandedTables:
    """All banded tables for one mesh (numpy). Each ``*_spec`` is
    (stride, k); ``*_q`` the per-tile chunk starts."""
    hv_spec: tuple            # half-edge -> vertex
    hv_q: np.ndarray
    hv_onehot: np.ndarray     # (Tv, 128, k*stride)
    vc_spec: tuple            # vertex -> cell (weights 1/3)
    vc_q: np.ndarray
    vc_onehot: np.ndarray
    cf_spec: tuple            # cell -> face (shared row/col band)
    cf_q: np.ndarray
    cf_row_onehot: np.ndarray
    cf_col_onehot: np.ndarray


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
    hv_s, hv_k, hv_q, hv_onehot = _build_table(t2s, V, 2 * F, tile=tile)

    # vertex -> cell: mean of the 3 vertices
    vface = np.asarray(geom["vertex_face"])
    t2s = [[(int(vface[j, c]), 1.0 / 3.0) for j in range(3)] for c in range(C)]
    vc_s, vc_k, vc_q, vc_onehot = _build_table(t2s, C, V, tile=tile)

    # cell -> face: owner (row) and neighbour (col) selectors sharing one band
    cei = np.asarray(geom["cell_edge_index"])
    both = [[(int(cei[0, f]), 1.0), (int(cei[1, f]), 1.0)] for f in range(F)]
    cf_s, cf_k, cf_q, _ = _build_table(both, F, C, tile=tile)
    Tf = _round_up(max(F, 1), tile) // tile
    B = cf_k * cf_s
    cf_row = np.zeros((Tf, tile, B), np.float32)
    cf_col = np.zeros((Tf, tile, B), np.float32)
    for f in range(F):
        t, r = divmod(f, tile)
        cf_row[t, r, cei[0, f] - cf_q[t] * cf_s] += 1.0
        cf_col[t, r, cei[1, f] - cf_q[t] * cf_s] += 1.0

    return BandedTables((hv_s, hv_k), hv_q, hv_onehot,
                        (vc_s, vc_k), vc_q, vc_onehot,
                        (cf_s, cf_k), cf_q, cf_row, cf_col)


# ---------------------------------------------------------------------------
# jittable application
# ---------------------------------------------------------------------------

def _bands(src: jax.Array, stride: int, k: int, q: jax.Array) -> jax.Array:
    """Per-tile chunk-quantized bands: bands[t] = src[q_t*stride :
    (q_t+k)*stride] as (T, k*stride, H). Built by one chunk gather over the
    shifted-chunk view (k shifted slices of the whole array)."""
    H = src.shape[1]
    n_chunks = -(-src.shape[0] // stride)
    pad_len = (n_chunks + k) * stride - src.shape[0]
    padded = jnp.pad(src, ((0, max(pad_len, 0)), (0, 0)))
    chunked = padded[: (n_chunks + k) * stride].reshape(-1, stride, H)
    windows = jnp.concatenate([chunked[j: j + n_chunks] for j in range(k)],
                              axis=1)                     # (n_chunks, k*s, H)
    return windows[q]                                     # (T, k*stride, H)


def banded_matmul(onehot: jax.Array, spec, q: jax.Array,
                  src: jax.Array) -> jax.Array:
    """out[g, t*tile + i] = sum_b onehot[g*Tp+t, i, b] * src_g[q_t*stride + b].

    ``spec`` = (stride, k, tiles_per_graph, sources_per_graph, num_graphs);
    per-graph application keeps chunk indices local under batching.
    """
    stride, k, Tp, Sp, n = (int(x) for x in spec)
    outs = []
    for g in range(n):
        bands = _bands(src[g * Sp: (g + 1) * Sp], stride, k,
                       q[g * Tp: (g + 1) * Tp])
        oh = onehot[g * Tp: (g + 1) * Tp]
        outs.append(jnp.einsum("tib,tbh->tih", oh, bands))
    out = jnp.concatenate(outs) if n > 1 else outs[0]
    return out.reshape(-1, src.shape[1])
