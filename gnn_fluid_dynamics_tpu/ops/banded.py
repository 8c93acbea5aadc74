"""Banded one-hot aggregation tables.

TPU gathers/scatters process ~1 row per cycle, which caps graph message
passing far below MXU rates. After an RCM reordering
(:mod:`gnn_fluid_dynamics_tpu.ops.reorder`), every tile of 128 consecutive
target entities touches only a narrow contiguous *band* of source rows, so
aggregation becomes

    out[tile] = S[tile] @ band(tile)

— batched small dense matmuls on the MXU. ``S`` holds the 0/1 (or 1/3)
incidence weights.

Band *starts* are static per tile: bands are built as a stack of
``lax.slice``-es at compile-time-constant offsets (pure DMA copies — measured
~2.5x faster than any gather formulation on v5e), then ONE batched einsum
applies the whole table. The per-tile offsets live in the MeshGraph as static
(non-pytree) tuples so XLA sees constant slice bounds; the one-hot weights are
a single (T, tile, B) leaf with a uniform band width B = max tile width
rounded to 128.

Tables are built offline in numpy and carried in :class:`MeshGraph`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _build_table(tgt: np.ndarray, src: np.ndarray, w: np.ndarray,
                 num_targets: int, num_sources: int, tile: int = TILE):
    """Generic banded table with static per-tile offsets, from flat
    (target, source, weight) triples (any order, duplicates accumulate).

    Returns (offsets (T,) python ints, onehot (T, tile, B)): tile t covers
    source rows [offsets[t], offsets[t] + B).
    """
    tgt = np.asarray(tgt, np.int64).ravel()
    src = np.asarray(src, np.int64).ravel()
    w = np.asarray(w, np.float32).ravel()
    Tn = _round_up(max(num_targets, 1), tile) // tile
    lo = np.full(Tn, num_sources, np.int64)
    hi = np.zeros(Tn, np.int64)
    tiles = tgt // tile
    np.minimum.at(lo, tiles, src)
    np.maximum.at(hi, tiles, src)
    lo = np.minimum(lo, np.maximum(hi, 0))

    # uniform band width = widest tile, rounded to a lane-friendly multiple;
    # 8-row-aligned offsets keep the slice DMAs sublane-aligned. The width is
    # measured from the ALIGNED starts (aligning lo downward widens the span
    # by up to lo % 8 — measuring from raw lo dropped entries silently when
    # the raw width was already a 128 multiple). Offsets are clamped so
    # off + B <= num_sources: the Pallas kernels DMA straight from the
    # (padded) source array, and an out-of-bounds DMA wedges the chip.
    aligned = (lo // 8) * 8
    width = int(np.max(hi - aligned + 1)) if len(tgt) else 1
    B = min(_round_up(max(width, 1), 128), _round_up(max(num_sources, 1), 128))
    offsets = np.minimum(aligned, max(num_sources - B, 0))
    if len(tgt):
        col = src - offsets[tiles]
        if col.min() < 0 or col.max() >= B:
            raise AssertionError(
                f"banded table invariant violated: column range "
                f"[{col.min()}, {col.max()}] outside band width {B}")
    onehot = _onehot_fill(tgt, src, w, Tn, tile, B, offsets, tiles)
    return tuple(int(o) for o in offsets), onehot


def _onehot_fill(tgt, src, w, Tn, tile, B, offsets, tiles):
    """Dense (Tn, tile, B) scatter-add — native C++ when available
    (``native.banded_fill``), vectorized np.add.at fallback (identical).
    Out-of-band (target, source) entries are a hard error in BOTH paths:
    a dropped entry means the aggregation loses a mesh edge silently."""
    if len(tgt):
        col = np.asarray(src) - np.asarray(offsets)[tiles]
        bad = (col < 0) | (col >= B)
        if bad.any():
            k = int(np.argmax(bad))
            raise ValueError(
                f"{int(bad.sum())} banded entries outside band width {B} "
                f"(first: target {int(tgt[k])}, source {int(src[k])}, "
                f"band start {int(offsets[tiles[k]])})")
    from gnn_fluid_dynamics_tpu import native
    out = native.banded_fill(tgt, src, w, Tn * tile, tile, B,
                             offsets.astype(np.int32))
    if out is not None:
        return out
    onehot = np.zeros((Tn, tile, B), np.float32)
    np.add.at(onehot.reshape(-1), tgt * B + (src - offsets[tiles]), w)
    return onehot


@dataclasses.dataclass
class BandedTables:
    """All banded tables for one mesh (numpy). ``*_offsets`` are static
    per-tile band start rows."""
    hv_offsets: tuple         # half-edge -> vertex
    hv_onehot: np.ndarray     # (Tv, 128, Bhv)
    vc_offsets: tuple         # vertex -> cell (weight 1; callers scale 1/3)
    vc_onehot: np.ndarray
    cf_offsets: tuple         # cell -> face (shared row/col band)
    cf_row_onehot: np.ndarray
    cf_col_onehot: np.ndarray
    es_offsets: tuple         # edge -> vertex, send/recv (Pallas backend)
    es_onehot: np.ndarray     # (Tv, 128, Bes)
    er_onehot: np.ndarray
    fc3_offsets: tuple        # face -> (cell, local slot): target row 3c+j
    fc3_onehot: np.ndarray    # (T3, 128, Bfc)
    sources: dict = None      # table -> source count (offset clamp bound)


def build_banded_tables(geom: Dict[str, np.ndarray],
                        tile: int = TILE) -> BandedTables:
    vei = np.asarray(geom["vertex_edge_index"], np.int64)
    V = geom["vertex_pos"].shape[0]
    F = vei.shape[1]
    C = geom["cell_pos"].shape[0]
    eF = np.arange(F, dtype=np.int64)
    ones2F = np.ones(2 * F, np.float32)

    # half-edge -> vertex: vertex v sums fwd halves (2e) of edges it sends and
    # rev halves (2e+1) of edges it receives
    hv_off, hv_onehot = _build_table(
        np.concatenate([vei[0], vei[1]]),
        np.concatenate([2 * eF, 2 * eF + 1]), ones2F, V, 2 * F, tile=tile)

    # vertex -> cell: mean of the 3 vertices. The table stores weight 1 so
    # int8 storage is exact; both backends apply the 1/3 as a scalar.
    vface = np.asarray(geom["vertex_face"], np.int64)
    vc_off, vc_onehot = _build_table(
        np.repeat(np.arange(C, dtype=np.int64), 3), vface.T.ravel(),
        np.ones(3 * C, np.float32), C, V, tile=tile)

    # cell -> face: owner (row) and neighbour (col) selectors sharing one band
    cei = np.asarray(geom["cell_edge_index"], np.int64)
    cf_off, cf_probe = _build_table(
        np.repeat(eF, 2), cei.T.ravel(), ones2F, F, C, tile=tile)
    Tf, B = cf_probe.shape[0], cf_probe.shape[2]
    off32 = np.asarray(cf_off, np.int64)
    onesF = np.ones(F, np.float32)
    cf_row = _onehot_fill(eF, cei[0], onesF, Tf, tile, B, off32, eF // tile)
    cf_col = _onehot_fill(eF, cei[1], onesF, Tf, tile, B, off32, eF // tile)

    # edge-space send/recv selectors sharing one band: the Pallas backend
    # aggregates full-width edge latents (lane-aligned) instead of the
    # (2F, H/2) half-edge view
    es_off, es_probe = _build_table(
        np.concatenate([vei[0], vei[1]]), np.concatenate([eF, eF]),
        ones2F, V, F, tile=tile)
    Tv, Be = es_probe.shape[0], es_probe.shape[2]
    eoff = np.asarray(es_off, np.int64)
    es = _onehot_fill(vei[0], eF, onesF, Tv, tile, Be, eoff, vei[0] // tile)
    er = _onehot_fill(vei[1], eF, onesF, Tv, tile, Be, eoff, vei[1] // tile)

    # face -> (cell, slot) selector: row 3c+j picks face_index[j, c]. One
    # einsum replaces the integrators' (C, 3) row gathers (the rollout's
    # fixed-cost hot spot: TPU row gathers run ~1 row/cycle).
    fidx = np.asarray(geom["face_index"], np.int64)        # (3, C)
    fc3_off, fc3_onehot = _build_table(
        np.arange(3 * C, dtype=np.int64), fidx.T.ravel(),
        np.ones(3 * C, np.float32), 3 * C, F, tile=tile)
    return BandedTables(hv_off, hv_onehot, vc_off, vc_onehot,
                        cf_off, cf_row, cf_col, es_off, es, er,
                        fc3_off, fc3_onehot,
                        sources={"hv": 2 * F, "vc": V, "cf": C,
                                 "es": F, "fc3": F})


# ---------------------------------------------------------------------------
# jittable application
# ---------------------------------------------------------------------------

def _bands(src: jax.Array, B: int, offsets: Sequence[int]) -> jax.Array:
    """bands[t] = src[offsets[t] : offsets[t]+B] as (T, B, H), built from T
    static-offset slices (DMA copies, no gather)."""
    need = max(o + B for o in offsets)
    pad_len = max(need - src.shape[0], 0)
    p = jnp.pad(src, ((0, pad_len), (0, 0)))
    return jnp.stack([jax.lax.slice(p, (o, 0), (o + B, p.shape[1]))
                      for o in offsets])


def _bands_dynamic(src: jax.Array, B: int, off: jax.Array) -> jax.Array:
    """Traced-offset variant (vmapped dynamic_slice): ~1.7x slower than the
    static slices but the jaxpr is independent of the mesh, so training over
    many mesh combinations compiles once instead of once per combination."""
    pad_len = max(B, 0)
    p = jnp.pad(src, ((0, pad_len), (0, 0)))
    return jax.vmap(
        lambda o: jax.lax.dynamic_slice(p, (o, 0), (B, p.shape[1])))(off)


def banded_matmul(onehot: jax.Array, specs, src: jax.Array,
                  off_arr: jax.Array = None) -> jax.Array:
    """out[row of tile t] = sum_b onehot[t, i, b] * src_g[offsets[t] + b].

    ``specs`` is a static tuple with one entry per graph in the batch —
    per-graph application keeps band offsets local under batching (graphs in
    one batch may be different meshes with different bands). Each entry is
    ``(Tp, Sp, offsets)`` for the fast static-slice path (rollout: offsets are
    compile-time constants) or ``(Tp, Sp)`` with offsets taken from the traced
    ``off_arr`` leaf (training: one jaxpr for every mesh combination).
    ``src`` is cast to the table dtype (store tables in bf16 to halve the
    dominant HBM traffic); accumulation is f32 on the MXU.
    """
    B = onehot.shape[2]
    if onehot.dtype == jnp.int8:
        # int8 storage is for the Pallas backend (in-kernel upcast); here
        # upcast the table, keep activations bf16
        onehot = onehot.astype(jnp.bfloat16)
    src = src.astype(onehot.dtype)
    outs = []
    to = so = 0
    for spec in specs:
        Tp, Sp = spec[0], spec[1]
        if len(spec) > 2:
            bands = _bands(src[so: so + Sp], B, spec[2])
        else:
            bands = _bands_dynamic(src[so: so + Sp], B,
                                   off_arr[to: to + Tp])
        oh = onehot[to: to + Tp]
        outs.append(jnp.einsum("tib,tbh->tih", oh, bands,
                               preferred_element_type=jnp.float32))
        to += Tp
        so += Sp
    out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    return out.reshape(-1, src.shape[1])


def pad_band_width(onehot: np.ndarray, B: int) -> np.ndarray:
    """Zero-pad a table's band axis to a common width (for batching graphs
    whose tables were built with different B)."""
    if onehot.shape[2] == B:
        return onehot
    pad = [(0, 0), (0, 0), (0, B - onehot.shape[2])]
    return np.pad(onehot, pad)


_TABLE_GROUPS = (("hv", "hv_offsets", ("hv_onehot",)),
                 ("vc", "vc_offsets", ("vc_onehot",)),
                 ("cf", "cf_offsets", ("cf_row_onehot", "cf_col_onehot")),
                 ("es", "es_offsets", ("es_onehot", "er_onehot")),
                 ("fc3", "fc3_offsets", ("fc3_onehot",)))


def table_meta(t: BandedTables):
    """The tiny per-mesh summary canonicalization needs: per-group
    (per-tile offsets, band width, source count). Lets the out-of-core
    dataset compute canonical offsets in a streaming pass and discard the
    (large) one-hot tables."""
    return {name: (np.asarray(getattr(t, off_key), np.int64),
                   int(getattr(t, oh_keys[0]).shape[2]),
                   int(t.sources[name]))
            for name, off_key, oh_keys in _TABLE_GROUPS}


def canonical_spec(metas):
    """Canonical per-tile offsets + band width per table group, covering
    every mesh in ``metas`` (see :func:`canonicalize_tables`)."""
    spec = {}
    for name, _, _ in _TABLE_GROUPS:
        offs = np.stack([m[name][0] for m in metas])             # (M, T)
        Bs = np.array([m[name][1] for m in metas])
        S = max(m[name][2] for m in metas)
        canon = offs.min(axis=0)
        # fixpoint: clamping canon down (off + B <= S) can widen the needed
        # band, which tightens the clamp again; iterate until stable (B is
        # capped at round_up(S, 128), so this terminates)
        while True:
            B = int(np.max(offs + Bs[:, None] - canon[None, :]))
            B = min(_round_up(B, 128), _round_up(max(S, 1), 128))
            clamped = np.minimum(canon, max(S - B, 0))
            if np.array_equal(clamped, canon):
                break
            canon = clamped
        assert int(np.max(offs + Bs[:, None] - canon[None, :])) <= B
        spec[name] = (canon, B)
    return spec


def rebase_tables(t: BandedTables, spec) -> BandedTables:
    """Shift one mesh's tables onto the canonical offsets of ``spec``."""
    out = dataclasses.replace(t)
    for name, off_key, oh_keys in _TABLE_GROUPS:
        canon, B = spec[name]
        offs = np.asarray(getattr(t, off_key), np.int64)
        shifts = offs - canon
        assert shifts.min() >= 0, (name, shifts.min())
        setattr(out, off_key, tuple(int(o) for o in canon))
        for key in oh_keys:
            old = getattr(t, key)
            assert int(np.max(shifts)) + old.shape[2] <= B, (name, B)
            new = np.zeros((old.shape[0], old.shape[1], B), old.dtype)
            for ti in range(old.shape[0]):
                sh = int(shifts[ti])
                new[ti, :, sh: sh + old.shape[2]] = old[ti]
            setattr(out, key, new)
    return out


def canonicalize_tables(tables):
    """Give every mesh's tables IDENTICAL per-tile band offsets.

    Meshes sharing a padded bucket shape get per-tile offsets = min across
    meshes and a band width covering every mesh (one-hot columns shifted
    accordingly). With shared offsets the banded specs are static AND
    batch-composition-independent, so training runs the fast constant-slice
    path with one compile per bucket — the traced-offset fallback lowers to
    a serial while loop on TPU (~100 us per table application)."""
    tables = list(tables)
    if len(tables) == 1:
        return tables
    spec = canonical_spec([table_meta(t) for t in tables])
    return [rebase_tables(t, spec) for t in tables]
