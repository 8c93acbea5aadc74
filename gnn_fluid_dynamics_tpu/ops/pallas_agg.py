"""Fused banded aggregation as Pallas TPU kernels (optional backend).

One kernel per table application: the per-tile source band is DMA'd
HBM->VMEM double-buffered at a scalar-prefetched offset, and the one-hot
weights (auto-pipelined VMEM blocks, int8 or bf16 storage, upcast on-chip)
multiply it on the MXU — the band never round-trips through HBM, unlike the
XLA path in :mod:`gnn_fluid_dynamics_tpu.ops.banded` which materializes
stacked band slices before its einsum.

End-to-end rollouts on one v5e chip (bench.py, FluxD hidden 128 mp 15,
round-3 chunked fused kernels — see the chunked section below):

=============  ===========  ==========================================
mesh           XLA banded   Pallas fused+chunked (idx-built selectors)
=============  ===========  ==========================================
~3.5k cells    1334 st/s    1585 st/s
~14k cells     368 st/s     450 st/s  (and ~5x faster compile)
=============  ===========  ==========================================

History: the per-tile kernels (one 128-row tile per grid step) lost to the
XLA path below ~10k cells — ~0.2us of compute per tile cannot hide the ~1us
band-DMA latency, so the grid stalled on bubbles (trace: 0.84us/tile vs
0.2us analytic). Chunking K tiles per grid step over ONE shared band DMA
amortizes the latency and de-duplicates adjacent tiles' band overlap; with
that fix the fused kernels win at every measured size and ``auto`` resolves
to ``pallas`` for any TPU rollout.

Safety invariant: band offsets satisfy ``off + B <= num_sources`` (enforced
in ``banded._build_table``) — an out-of-bounds DMA does not fault cleanly,
it wedges the chip.

The kernels run in interpreter mode off-TPU so CPU tests exercise them.
Rollout-only (no custom VJP): training uses the XLA dynamic-offset path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _force_dense() -> bool:
    """GFD_PALLAS_DENSE=1 forces the dense-table kernels even when the
    index vectors are present (perf comparison escape hatch)."""
    return bool(os.environ.get("GFD_PALLAS_DENSE"))


def _dual_kernel(off_ref, oh_a_ref, oh_b_ref, src_hbm, *outs_and_scratch,
                 combine_roll: int):
    """Per grid step t: band = src[off[t] : off[t]+B] (double-buffered DMA),
    then one MXU dot per table. ``combine_roll`` > 0 fuses the two results
    as ``a + roll(b, combine_roll lanes)`` — the half-latent vertex sum (see
    :func:`aggregate_edges_to_vertices_pallas`)."""
    if combine_roll:
        out_a, band2, sem2 = outs_and_scratch
    else:
        out_a, out_b, band2, sem2 = outs_and_scratch
    B = band2.shape[1]
    t = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_for(i, slot):
        off = pl.multiple_of(off_ref[i], 8)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(off, B), :], band2.at[slot], sem2.at[slot])

    @pl.when(t == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(t + 1 < n)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, t % 2).wait()
    band = band2[t % 2]
    dn = (((1,), (0,)), ((), ()))
    a = oh_a_ref[0].astype(band.dtype)
    b = oh_b_ref[0].astype(band.dtype)
    ra = jax.lax.dot_general(a, band, dimension_numbers=dn,
                             preferred_element_type=jnp.float32)
    rb = jax.lax.dot_general(b, band, dimension_numbers=dn,
                             preferred_element_type=jnp.float32)
    if combine_roll:
        out_a[:] = (ra + pltpu.roll(rb, combine_roll, 1)).astype(out_a.dtype)
    else:
        out_a[:] = ra.astype(out_a.dtype)
        out_b[:] = rb.astype(out_b.dtype)


@functools.partial(jax.jit, static_argnames=("combine_roll",))
def banded_dual_pallas(oh_a: jax.Array, oh_b: jax.Array, off: jax.Array,
                       src: jax.Array, combine_roll: int = 0):
    """Apply two banded one-hot tables sharing one band to ``src``.

    oh_* : (T, tile, B) int8/bf16; off : (T,) int32 (8-aligned,
    off+B <= src rows); src : (S, H) bf16, H a multiple of 128.
    Returns two (T*tile, H) bf16 arrays, or one when ``combine_roll``.
    """
    T, tile, B = oh_a.shape
    H = src.shape[1]
    n_out = 1 if combine_roll else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tile, B), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, B), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((tile, H), lambda t, off: (t, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        scratch_shapes=[pltpu.VMEM((2, B, H), src.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    outs = pl.pallas_call(
        functools.partial(_dual_kernel, combine_roll=combine_roll),
        out_shape=[jax.ShapeDtypeStruct((T * tile, H), src.dtype)] * n_out,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(off, oh_a, oh_b, src)
    return outs[0] if combine_roll else outs


def _dual_colidx_kernel(off_ref, tgt_a_ref, tgt_b_ref, src_hbm,
                        *outs_and_scratch, combine_roll: int):
    """Like :func:`_dual_kernel`, but the one-hot is REBUILT ON-CHIP from a
    per-column target-row vector (int32, -1 = dead column) instead of being
    streamed from HBM — every table here is a 0/1 selector, so ~1.5 KB of
    indices per tile replace ~B*tile bytes of table traffic. Valid for
    tables with at most one nonzero per column (es/er: each edge has exactly
    one sender and one receiver)."""
    if combine_roll:
        out_a, band2, sem2 = outs_and_scratch
    else:
        out_a, out_b, band2, sem2 = outs_and_scratch
    B = band2.shape[1]
    tile = out_a.shape[0]
    t = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_for(i, slot):
        off = pl.multiple_of(off_ref[i], 8)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(off, B), :], band2.at[slot], sem2.at[slot])

    @pl.when(t == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(t + 1 < n)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, t % 2).wait()
    band = band2[t % 2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, B), 0)
    dn = (((1,), (0,)), ((), ()))
    a = (tgt_a_ref[0] == rows).astype(jnp.float32).astype(band.dtype)        # (1,B) vs (tile,B)
    b = (tgt_b_ref[0] == rows).astype(jnp.float32).astype(band.dtype)
    ra = jax.lax.dot_general(a, band, dimension_numbers=dn,
                             preferred_element_type=jnp.float32)
    rb = jax.lax.dot_general(b, band, dimension_numbers=dn,
                             preferred_element_type=jnp.float32)
    if combine_roll:
        out_a[:] = (ra + pltpu.roll(rb, combine_roll, 1)).astype(out_a.dtype)
    else:
        out_a[:] = ra.astype(out_a.dtype)
        out_b[:] = rb.astype(out_b.dtype)


@functools.partial(jax.jit, static_argnames=("combine_roll",))
def banded_dual_colidx_pallas(tgt_a: jax.Array, tgt_b: jax.Array,
                              off: jax.Array, src: jax.Array,
                              combine_roll: int = 0):
    """Index-built variant of :func:`banded_dual_pallas`.

    tgt_* : (T, 1, B) int32 — local target row of each band column, -1 dead;
    off : (T,) int32; src : (S, H). Returns (T*128, H) bf16 array(s).
    """
    T, _, B = tgt_a.shape
    tile = 128
    H = src.shape[1]
    n_out = 1 if combine_roll else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, B), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((tile, H), lambda t, off: (t, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        scratch_shapes=[pltpu.VMEM((2, B, H), src.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    outs = pl.pallas_call(
        functools.partial(_dual_colidx_kernel, combine_roll=combine_roll),
        out_shape=[jax.ShapeDtypeStruct((T * tile, H), src.dtype)] * n_out,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(off, tgt_a, tgt_b, src)
    return outs[0] if combine_roll else outs


def _dual_rowidx_kernel(off_ref, idx_a_ref, idx_b_ref, src_hbm, out_a, out_b,
                        band2, sem2):
    """Gather formulation: one nonzero per TARGET row (cf owner/neighbour
    lookups). idx refs hold the local band column per target row (-1 none);
    the (tile, B) one-hot is an iota compare, never touching HBM."""
    B = band2.shape[1]
    tile = out_a.shape[0]
    t = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_for(i, slot):
        off = pl.multiple_of(off_ref[i], 8)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(off, B), :], band2.at[slot], sem2.at[slot])

    @pl.when(t == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(t + 1 < n)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, t % 2).wait()
    band = band2[t % 2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, B), 1)
    dn = (((1,), (0,)), ((), ()))
    a = (idx_a_ref[0] == cols).astype(jnp.float32).astype(band.dtype)        # (tile,1) vs cols
    b = (idx_b_ref[0] == cols).astype(jnp.float32).astype(band.dtype)
    out_a[:] = jax.lax.dot_general(
        a, band, dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(out_a.dtype)
    out_b[:] = jax.lax.dot_general(
        b, band, dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(out_b.dtype)


@functools.partial(jax.jit, static_argnames=("band",))
def banded_dual_rowidx_pallas(idx_a: jax.Array, idx_b: jax.Array,
                              off: jax.Array, src: jax.Array, band: int):
    """Index-built dual gather: idx_* (T, tile, 1) int32 local band column
    per target row; one shared band DMA; returns two (T*tile, H) arrays."""
    T, tile, _ = idx_a.shape
    H = src.shape[1]
    B = band
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((tile, H), lambda t, off: (t, 0),
                                memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((2, B, H), src.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _dual_rowidx_kernel,
        out_shape=[jax.ShapeDtypeStruct((T * tile, H), src.dtype)] * 2,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(off, idx_a, idx_b, src)


def _rowidx3_kernel(off_ref, i0_ref, i1_ref, i2_ref, src_hbm, out,
                    band2, sem2):
    """Three-gather sum (vc: each cell averages its 3 distinct vertices)."""
    B = band2.shape[1]
    tile = out.shape[0]
    t = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_for(i, slot):
        off = pl.multiple_of(off_ref[i], 8)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(off, B), :], band2.at[slot], sem2.at[slot])

    @pl.when(t == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(t + 1 < n)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, t % 2).wait()
    band = band2[t % 2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, B), 1)
    mask = ((i0_ref[0] == cols).astype(jnp.float32)
            + (i1_ref[0] == cols).astype(jnp.float32)
            + (i2_ref[0] == cols).astype(jnp.float32)).astype(band.dtype)
    out[:] = jax.lax.dot_general(
        mask, band, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out.dtype)


@functools.partial(jax.jit, static_argnames=("band",))
def banded_rowidx3_pallas(i0: jax.Array, i1: jax.Array, i2: jax.Array,
                          off: jax.Array, src: jax.Array, band: int):
    """Index-built 3-source sum: i* (T, tile, 1) int32; -> (T*tile, H)."""
    T, tile, _ = i0.shape
    H = src.shape[1]
    B = band
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, H), lambda t, off: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, B, H), src.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _rowidx3_kernel,
        out_shape=jax.ShapeDtypeStruct((T * tile, H), src.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(off, i0, i1, i2, src)


def _single_kernel(off_ref, oh_ref, src_hbm, out, band2, sem2):
    B = band2.shape[1]
    t = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_for(i, slot):
        off = pl.multiple_of(off_ref[i], 8)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(off, B), :], band2.at[slot], sem2.at[slot])

    @pl.when(t == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(t + 1 < n)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, t % 2).wait()
    band = band2[t % 2]
    out[:] = jax.lax.dot_general(
        oh_ref[0].astype(band.dtype), band,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out.dtype)


@jax.jit
def banded_single_pallas(oh: jax.Array, off: jax.Array, src: jax.Array):
    """One banded one-hot table: (T, tile, B) x (S, H) -> (T*tile, H)."""
    T, tile, B = oh.shape
    H = src.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tile, B), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, H), lambda t, off: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, B, H), src.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _single_kernel,
        out_shape=jax.ShapeDtypeStruct((T * tile, H), src.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(off, oh, src)


# ---------------------------------------------------------------------------
# model-facing wrappers (the "pallas" aggregation backend)
# ---------------------------------------------------------------------------

def aggregate_edges_to_vertices_pallas(edge_attr: jax.Array, graph):
    """Twice-message-passing vertex sum from full-width edge latents.

    The edge latent rows are [fwd_half (lanes 0:64) || rev_half (64:128)];
    a vertex sums fwd halves of edges it sends and rev halves of edges it
    receives. Two edge-space tables (send/recv) share one band; the kernel
    returns ``send_result + roll(recv_result, 64)`` so lanes 0:64 hold the
    vertex sum. Replaces the XLA path's (2F, H/2) reshape, which would put
    sub-128-lane operands into the kernel (unsupported DMA alignment)."""
    use_idx = graph.es_tgt is not None and not _force_dense()
    outs = []
    to = so = 0
    for spec in graph.es_start:
        Tp, Sp = spec[0], spec[1]
        off = graph.es_off[to: to + Tp]
        src = edge_attr[so: so + Sp].astype(jnp.bfloat16)
        roll = edge_attr.shape[1] // 2
        # band width from the table the kernel actually slices with
        # (es_tgt), not the dense one-hot it happens to be derived from
        plan = (_chunk_plan(tuple(spec[2]), graph.es_tgt.shape[2], Sp)
                if use_idx and len(spec) > 2
                and not os.environ.get("GFD_PALLAS_NOCHUNK") else None)
        if plan is not None:
            K, Bk, co, dl = plan
            outs.append(banded_dual_colidx_chunked(
                graph.es_tgt[to: to + Tp], graph.er_tgt[to: to + Tp],
                jnp.asarray(co), jnp.asarray(dl), src, band_k=Bk, K=K,
                combine_roll=roll))
        elif use_idx:
            outs.append(banded_dual_colidx_pallas(
                graph.es_tgt[to: to + Tp], graph.er_tgt[to: to + Tp],
                off, src, combine_roll=roll))
        else:
            outs.append(banded_dual_pallas(
                graph.es_onehot[to: to + Tp], graph.er_onehot[to: to + Tp],
                off, src, combine_roll=roll))
        to += Tp
        so += Sp
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def aggregate_vertices_to_cells_pallas(vtx128: jax.Array, graph):
    """vc mean on a (V, H) vertex latent whose payload is in lanes 0:H/2;
    returns (C, H/2) f32 like the XLA path. The shared vc table stores
    weight 1; the 1/3 vertex mean is a scalar epilogue."""
    use_idx = graph.vc_idx0 is not None and not _force_dense()
    B = graph.vc_onehot.shape[2]
    outs = []
    to = so = 0
    for spec in graph.vc_start:
        Tp, Sp = spec[0], spec[1]
        off = graph.vc_off[to: to + Tp]
        if use_idx:
            outs.append(banded_rowidx3_pallas(
                graph.vc_idx0[to: to + Tp], graph.vc_idx1[to: to + Tp],
                graph.vc_idx2[to: to + Tp], off, vtx128[so: so + Sp],
                band=B))
        else:
            outs.append(banded_single_pallas(
                graph.vc_onehot[to: to + Tp], off, vtx128[so: so + Sp]))
        to += Tp
        so += Sp
    out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    H2 = vtx128.shape[1] // 2
    return out[:, :H2].astype(jnp.float32) / 3.0


def gather_face_cells_pallas(cell_attr: jax.Array, graph):
    """(x[owner], x[neighbour]) per face via the shared cf band."""
    use_idx = graph.cf_row_idx is not None and not _force_dense()
    B = graph.cf_row_onehot.shape[2]
    rows, cols = [], []
    to = so = 0
    for spec in graph.cf_start:
        Tp, Sp = spec[0], spec[1]
        off = graph.cf_off[to: to + Tp]
        src = cell_attr[so: so + Sp].astype(jnp.bfloat16)
        if use_idx:
            a, b = banded_dual_rowidx_pallas(
                graph.cf_row_idx[to: to + Tp],
                graph.cf_col_idx[to: to + Tp], off, src, band=B)
        else:
            a, b = banded_dual_pallas(
                graph.cf_row_onehot[to: to + Tp],
                graph.cf_col_onehot[to: to + Tp], off, src)
        rows.append(a)
        cols.append(b)
        to += Tp
        so += Sp
    x_row = (jnp.concatenate(rows) if len(rows) > 1
             else rows[0]).astype(jnp.float32)
    x_col = (jnp.concatenate(cols) if len(cols) > 1
             else cols[0]).astype(jnp.float32)
    return x_row, x_col


# ---------------------------------------------------------------------------
# Fused GN-block kernels: gather + 3-layer MLP + LayerNorm + residual in one
# kernel. Eliminates the concat materialization, both MLP intermediates, and
# the separate gather outputs from HBM — the remaining traffic per block is
# one band read + one latent read + one latent write.
# ---------------------------------------------------------------------------

def _silu(x):
    return x * jax.nn.sigmoid(x)


def _mlp_ln_tail(e, h0, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref):
    """Shared tail: h0 (f32) pre-activation -> silu -> dense -> silu ->
    dense -> LayerNorm(eps 1e-5). ALL elementwise math stays f32 — Mosaic
    cannot lower bf16 transcendentals (vector.broadcast f32->bf16 verifier
    error); only MXU dot inputs and the final store are bf16. Returns (raw
    block output, residualed output) — the reference GN_Block feeds the RAW
    cell output to its face block and residuals afterwards
    (Fvgn.py:274-284)."""
    dn = (((1,), (0,)), ((), ()))
    wdt = w1_ref.dtype
    h = _silu(h0)                                             # f32
    h = jax.lax.dot_general(h.astype(wdt), w1_ref[...],
                            dimension_numbers=dn,
                            preferred_element_type=jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    h = _silu(h)
    h = jax.lax.dot_general(h.astype(wdt), w2_ref[...],
                            dimension_numbers=dn,
                            preferred_element_type=jnp.float32) \
        + b2_ref[...].astype(jnp.float32)
    mu = jnp.mean(h, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(h), axis=1, keepdims=True) - jnp.square(mu)
    hn = (h - mu) * jax.lax.rsqrt(var + 1e-5) * g_ref[...].astype(jnp.float32) \
        + be_ref[...].astype(jnp.float32)
    return hn.astype(e.dtype), (e.astype(jnp.float32) + hn).astype(e.dtype)


def _fused_face_kernel(off_ref, idxr_ref, idxc_ref, e_ref, w0e_ref, w0r_ref,
                       w0c_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       g_ref, be_ref, cells_hbm, *outs_and_scratch,
                       dual_out: bool):
    if dual_out:
        raw_ref, out_ref, band2, sem2 = outs_and_scratch
    else:
        out_ref, band2, sem2 = outs_and_scratch
    B = band2.shape[1]
    tile = out_ref.shape[0]
    t = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_for(i, slot):
        off = pl.multiple_of(off_ref[i], 8)
        return pltpu.make_async_copy(
            cells_hbm.at[pl.ds(off, B), :], band2.at[slot], sem2.at[slot])

    @pl.when(t == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(t + 1 < n)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, t % 2).wait()
    band = band2[t % 2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, B), 1)
    dn = (((1,), (0,)), ((), ()))
    mr = (idxr_ref[0] == cols).astype(jnp.float32).astype(band.dtype)
    mc = (idxc_ref[0] == cols).astype(jnp.float32).astype(band.dtype)
    crow = jax.lax.dot_general(mr, band, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    ccol = jax.lax.dot_general(mc, band, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    e = e_ref[...]
    h0 = (jax.lax.dot_general(e, w0e_ref[...], dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(crow.astype(band.dtype), w0r_ref[...],
                                dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
          + jax.lax.dot_general(ccol.astype(band.dtype), w0c_ref[...],
                                dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
          ) + b0_ref[...].astype(jnp.float32)
    raw, res = _mlp_ln_tail(e, h0, w1_ref, b1_ref, w2_ref, b2_ref,
                            g_ref, be_ref)
    if dual_out:
        raw_ref[:] = raw
    out_ref[:] = res


def _fused_cell_kernel(off_ref, i0_ref, i1_ref, i2_ref, c_ref, w0c_ref,
                       w0a_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       g_ref, be_ref, vtx_hbm, *outs_and_scratch,
                       dual_out: bool):
    if dual_out:
        raw_ref, out_ref, band2, sem2 = outs_and_scratch
    else:
        out_ref, band2, sem2 = outs_and_scratch
    B = band2.shape[1]
    tile = out_ref.shape[0]
    t = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_for(i, slot):
        off = pl.multiple_of(off_ref[i], 8)
        return pltpu.make_async_copy(
            vtx_hbm.at[pl.ds(off, B), :], band2.at[slot], sem2.at[slot])

    @pl.when(t == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(t + 1 < n)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, t % 2).wait()
    band = band2[t % 2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, B), 1)
    dn = (((1,), (0,)), ((), ()))
    mask = ((i0_ref[0] == cols).astype(jnp.float32)
            + (i1_ref[0] == cols).astype(jnp.float32)
            + (i2_ref[0] == cols).astype(jnp.float32)).astype(band.dtype)
    # (tile, 128) vertex sum; payload lanes 0:H/2, w0a rows H/2: are zeroed
    agg = ((jax.lax.dot_general(mask, band, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
            * jnp.float32(1.0 / 3.0))).astype(band.dtype)
    c = c_ref[...]
    h0 = (jax.lax.dot_general(c, w0c_ref[...], dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(agg, w0a_ref[...], dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
          ) + b0_ref[...].astype(jnp.float32)
    raw, res = _mlp_ln_tail(c, h0, w1_ref, b1_ref, w2_ref, b2_ref,
                            g_ref, be_ref)
    if dual_out:
        raw_ref[:] = raw
    out_ref[:] = res


def _weight_specs(shapes):
    return [pl.BlockSpec(s, (lambda t, off, n=len(s): (0,) * n),
                         memory_space=pltpu.VMEM) for s in shapes]


@functools.partial(jax.jit, static_argnames=("band", "dual_out"))
def fused_face_tiles_pallas(idx_r, idx_c, off, edge_attr, cell_attr, p,
                            band: int, dual_out: bool = False):
    """One fused FaceBlock chunk: edge latents (F, H) + banded cell gathers
    -> residualed new edge latents (F, H). ``p`` is the dict from
    ``MLP(..., raw=True)`` with w0 pre-split into [edge|row|col] thirds."""
    T, tile, _ = idx_r.shape
    H = edge_attr.shape[1]
    wdt = edge_attr.dtype
    w0e, w0r, w0c = (p["w0"][:H].astype(wdt), p["w0"][H:2 * H].astype(wdt),
                     p["w0"][2 * H:3 * H].astype(wdt))
    args = [w0e, w0r, w0c, p["b0"].astype(wdt).reshape(1, -1),
            p["w1"].astype(wdt), p["b1"].astype(wdt).reshape(1, -1),
            p["w2"].astype(wdt), p["b2"].astype(wdt).reshape(1, -1),
            p["ln_scale"].astype(wdt).reshape(1, -1),
            p["ln_bias"].astype(wdt).reshape(1, -1)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, H), lambda t, off: (t, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs([a.shape for a in args]) + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((tile, H), lambda t, off: (t, 0),
                                memory_space=pltpu.VMEM)
                   ] * (2 if dual_out else 1),
        scratch_shapes=[pltpu.VMEM((2, band, H), cell_attr.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    outs = pl.pallas_call(
        functools.partial(_fused_face_kernel, dual_out=dual_out),
        out_shape=[jax.ShapeDtypeStruct((T * tile, H), edge_attr.dtype)
                   ] * (2 if dual_out else 1),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(off, idx_r, idx_c, edge_attr, *args, cell_attr)
    return tuple(outs) if dual_out else outs[0]


@functools.partial(jax.jit, static_argnames=("band", "dual_out"))
def fused_cell_tiles_pallas(i0, i1, i2, off, cell_attr, vtx128, p, band: int,
                            dual_out: bool = False):
    """One fused CellBlock chunk: cell latents (C, H) + banded 3-vertex mean
    -> residualed new cell latents. w0 rows are [cell H | agg H/2]; the agg
    rows are zero-padded to H so the garbage lanes H/2: of the combined
    vertex latent contribute nothing."""
    T, tile, _ = i0.shape
    H = cell_attr.shape[1]
    wdt = cell_attr.dtype
    w0c = p["w0"][:H].astype(wdt)
    w0a = jnp.zeros((H, H), wdt).at[: H // 2].set(
        p["w0"][H: H + H // 2].astype(wdt))
    args = [w0c, w0a, p["b0"].astype(wdt).reshape(1, -1),
            p["w1"].astype(wdt), p["b1"].astype(wdt).reshape(1, -1),
            p["w2"].astype(wdt), p["b2"].astype(wdt).reshape(1, -1),
            p["ln_scale"].astype(wdt).reshape(1, -1),
            p["ln_bias"].astype(wdt).reshape(1, -1)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda t, off: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, H), lambda t, off: (t, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs([a.shape for a in args]) + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((tile, H), lambda t, off: (t, 0),
                                memory_space=pltpu.VMEM)
                   ] * (2 if dual_out else 1),
        scratch_shapes=[pltpu.VMEM((2, band, H), vtx128.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    outs = pl.pallas_call(
        functools.partial(_fused_cell_kernel, dual_out=dual_out),
        out_shape=[jax.ShapeDtypeStruct((T * tile, H), cell_attr.dtype)
                   ] * (2 if dual_out else 1),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(off, i0, i1, i2, cell_attr, *args, vtx128)
    return tuple(outs) if dual_out else outs[0]


def fused_face_block_pallas(cell_attr, edge_attr, graph, p,
                            dual_out: bool = False):
    """FaceBlock over all chunks of a (possibly batched) graph. Returns the
    residualed new edge latents; with ``dual_out`` also the raw (un-
    residualed) block output as (raw, residualed)."""
    B = graph.cf_row_onehot.shape[2]
    raws, outs = [], []
    to = so = eo = 0
    for spec, espec in zip(graph.cf_start, graph.es_start):
        Tp, Sp = spec[0], spec[1]
        Fp = espec[1]
        plan = (_chunk_plan(tuple(spec[2]), B, Sp)
                if len(spec) > 2 and not os.environ.get("GFD_PALLAS_NOCHUNK")
                else None)
        if plan is not None:
            K, Bk, co, dl = plan
            r = fused_face_tiles_chunked(
                graph.cf_row_idx[to: to + Tp], graph.cf_col_idx[to: to + Tp],
                jnp.asarray(co), jnp.asarray(dl), edge_attr[eo: eo + Fp],
                cell_attr[so: so + Sp], p, band=B, band_k=Bk, K=K,
                dual_out=dual_out)
        else:
            r = fused_face_tiles_pallas(
                graph.cf_row_idx[to: to + Tp], graph.cf_col_idx[to: to + Tp],
                graph.cf_off[to: to + Tp], edge_attr[eo: eo + Fp],
                cell_attr[so: so + Sp], p, band=B, dual_out=dual_out)
        if dual_out:
            raws.append(r[0])
            outs.append(r[1])
        else:
            outs.append(r)
        to += Tp
        so += Sp
        eo += Fp
    res = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    if dual_out:
        raw = jnp.concatenate(raws) if len(raws) > 1 else raws[0]
        return raw, res
    return res


def fused_cell_block_pallas(cell_attr, edge_attr, graph, p,
                            dual_out: bool = False):
    """CellBlock: es/er vertex sum (existing kernel) + fused vc-mean + MLP +
    LayerNorm. Returns the residualed cell latents; with ``dual_out`` also
    the raw block output as (raw, residualed)."""
    vtx = aggregate_edges_to_vertices_pallas(edge_attr, graph)
    B = graph.vc_onehot.shape[2]
    raws, outs = [], []
    to = co = vo = 0
    for spec in graph.vc_start:
        Tp, Vp = spec[0], spec[1]
        Cp = Tp * 128
        plan = (_chunk_plan(tuple(spec[2]), B, Vp)
                if len(spec) > 2 and not os.environ.get("GFD_PALLAS_NOCHUNK")
                else None)
        if plan is not None:
            K, Bk, cof, dl = plan
            r = fused_cell_tiles_chunked(
                graph.vc_idx0[to: to + Tp], graph.vc_idx1[to: to + Tp],
                graph.vc_idx2[to: to + Tp], jnp.asarray(cof),
                jnp.asarray(dl), cell_attr[co: co + Cp], vtx[vo: vo + Vp],
                p, band=B, band_k=Bk, K=K, dual_out=dual_out)
        else:
            r = fused_cell_tiles_pallas(
                graph.vc_idx0[to: to + Tp], graph.vc_idx1[to: to + Tp],
                graph.vc_idx2[to: to + Tp], graph.vc_off[to: to + Tp],
                cell_attr[co: co + Cp], vtx[vo: vo + Vp], p, band=B,
                dual_out=dual_out)
        if dual_out:
            raws.append(r[0])
            outs.append(r[1])
        else:
            outs.append(r)
        to += Tp
        co += Cp
        vo += Vp
    res = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    if dual_out:
        raw = jnp.concatenate(raws) if len(raws) > 1 else raws[0]
        return raw, res
    return res


# ---------------------------------------------------------------------------
# Chunked fused kernels: K consecutive tiles per grid step sharing ONE band
# DMA. The per-tile kernels above run ~0.2us of compute per 128-row tile —
# far below the ~1us HBM DMA latency, so double buffering cannot hide the
# band fetch and the grid stalls on bubbles (trace: 0.84us/tile vs 0.2us
# analytic). Chunking K tiles (i) amortizes the latency behind K tiles of
# compute and (ii) de-duplicates the overlap between adjacent tiles' bands,
# cutting band traffic ~(K*B)/Bk times. Index tables stay per-tile at the
# ORIGINAL width B and are never rebased: each tile's band is taken as an
# 8-aligned dynamic sublane slice of the chunk band at a static prefetched
# delta, so masks compare against columns in [0, B) exactly like the
# per-tile kernels (and dead idx == -1 can never alias a live column).
# Do NOT "simplify" to rebased indices over the full chunk width — that
# inflates both the mask-build VPU cost and the gather-dot FLOPs by Bk/B
# (measured 349 vs 450 steps/s at 13.7k cells) and reintroduces the -1
# aliasing hazard.
# ---------------------------------------------------------------------------


def _round_up_pl(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=4096)
def _chunk_plan(offsets: tuple, B: int, S: int, max_k: int = 8,
                max_band: int = 2048):
    """Static chunk plan from static per-tile band starts.

    Returns ``(K, Bk, chunk_off (T//K,) int32, delta (T,) int32)`` for the
    largest K in {max_k, ..., 2} dividing T whose chunk band width Bk stays
    within ``max_band`` (wider bands raise the mask-build VPU cost and the
    gather-dot FLOPs per chunk), or ``None`` when per-tile kernels should be
    used. All alignment invariants of ops/banded.py hold: chunk offsets are
    mins of 8-aligned starts clamped to ``S - Bk`` with S a multiple of 128.
    """
    T = len(offsets)
    off = np.asarray(offsets, np.int64)
    for k in range(max_k, 1, -1):  # every K in {max_k..2} dividing T
        if T % k == 0:
            co = off.reshape(-1, k).min(axis=1)
            Bk = int(np.max(off.reshape(-1, k) + B - co[:, None]))
            Bk = min(_round_up_pl(Bk, 128), _round_up_pl(max(S, 1), 128))
            co = np.minimum(co, max(S - Bk, 0))
            if (int(np.max(off.reshape(-1, k) + B - co[:, None])) <= Bk
                    and Bk <= max(max_band, B)):
                dl = (off - np.repeat(co, k)).astype(np.int32)
                return k, int(Bk), co.astype(np.int32), dl
    return None


def _chunk_band_wait(co_ref, src_hbm, band2, sem2):
    """Shared double-buffered chunk-band DMA schedule: start chunk 0 on grid
    step 0, prefetch chunk j+1, wait chunk j. Returns (j, ready slot)."""
    Bk = band2.shape[1]
    j = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_for(i, slot):
        off = pl.multiple_of(co_ref[i], 8)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(off, Bk), :], band2.at[slot], sem2.at[slot])

    @pl.when(j == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(j + 1 < n)
    def _():
        dma_for(j + 1, (j + 1) % 2).start()

    dma_for(j, j % 2).wait()
    return j, j % 2


def _fused_face_kernel_chunk(co_ref, dl_ref, idxr_ref, idxc_ref, e_ref,
                             w0e_ref, w0r_ref, w0c_ref, b0_ref, w1_ref,
                             b1_ref, w2_ref, b2_ref, g_ref, be_ref,
                             cells_hbm, *outs_and_scratch, dual_out: bool,
                             K: int, B: int):
    if dual_out:
        raw_ref, out_ref, band2, sem2 = outs_and_scratch
    else:
        out_ref, band2, sem2 = outs_and_scratch
    tile = idxr_ref.shape[1]
    j, slot = _chunk_band_wait(co_ref, cells_hbm, band2, sem2)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, B), 1)
    dn = (((1,), (0,)), ((), ()))
    crows, ccols = [], []
    for k in range(K):
        # narrow per-tile mask over the ORIGINAL band width B; the tile's
        # band is an 8-aligned dynamic slice of the chunk band, so the idx
        # columns need no rebasing (and dead idx == -1 never matches)
        rel = pl.multiple_of(dl_ref[j * K + k], 8)
        band_k = band2[slot, pl.ds(rel, B), :]               # (B, H)
        mr = (idxr_ref[k] == cols).astype(jnp.float32)
        mc = (idxc_ref[k] == cols).astype(jnp.float32)
        crows.append(jax.lax.dot_general(
            mr.astype(band_k.dtype), band_k, dimension_numbers=dn,
            preferred_element_type=jnp.float32))
        ccols.append(jax.lax.dot_general(
            mc.astype(band_k.dtype), band_k, dimension_numbers=dn,
            preferred_element_type=jnp.float32))
    wdt = band2.dtype
    crow = jnp.concatenate(crows, axis=0)                    # (K*tile, H) f32
    ccol = jnp.concatenate(ccols, axis=0)
    e = e_ref[...]
    h0 = (jax.lax.dot_general(e, w0e_ref[...], dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(crow.astype(wdt), w0r_ref[...],
                                dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
          + jax.lax.dot_general(ccol.astype(wdt), w0c_ref[...],
                                dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
          ) + b0_ref[...].astype(jnp.float32)
    raw, res = _mlp_ln_tail(e, h0, w1_ref, b1_ref, w2_ref, b2_ref,
                            g_ref, be_ref)
    if dual_out:
        raw_ref[:] = raw
    out_ref[:] = res


def _fused_cell_kernel_chunk(co_ref, dl_ref, i0_ref, i1_ref, i2_ref, c_ref,
                             w0c_ref, w0a_ref, b0_ref, w1_ref, b1_ref,
                             w2_ref, b2_ref, g_ref, be_ref, vtx_hbm,
                             *outs_and_scratch, dual_out: bool, K: int,
                             B: int):
    if dual_out:
        raw_ref, out_ref, band2, sem2 = outs_and_scratch
    else:
        out_ref, band2, sem2 = outs_and_scratch
    tile = i0_ref.shape[1]
    j, slot = _chunk_band_wait(co_ref, vtx_hbm, band2, sem2)
    wdt = band2.dtype
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, B), 1)
    dn = (((1,), (0,)), ((), ()))
    aggs = []
    for k in range(K):
        rel = pl.multiple_of(dl_ref[j * K + k], 8)
        band_k = band2[slot, pl.ds(rel, B), :]               # (B, H)
        m = ((i0_ref[k] == cols).astype(jnp.float32)
             + (i1_ref[k] == cols).astype(jnp.float32)
             + (i2_ref[k] == cols).astype(jnp.float32))
        aggs.append(jax.lax.dot_general(
            m.astype(wdt), band_k, dimension_numbers=dn,
            preferred_element_type=jnp.float32) * jnp.float32(1.0 / 3.0))
    agg = jnp.concatenate(aggs, axis=0).astype(wdt)          # (K*tile, H)
    c = c_ref[...]
    h0 = (jax.lax.dot_general(c, w0c_ref[...], dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(agg, w0a_ref[...], dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
          ) + b0_ref[...].astype(jnp.float32)
    raw, res = _mlp_ln_tail(c, h0, w1_ref, b1_ref, w2_ref, b2_ref,
                            g_ref, be_ref)
    if dual_out:
        raw_ref[:] = raw
    out_ref[:] = res


def _weight_specs2(shapes):
    """Weight BlockSpecs for kernels with TWO scalar-prefetch operands."""
    return [pl.BlockSpec(s, (lambda j, co, dl, n=len(s): (0,) * n),
                         memory_space=pltpu.VMEM) for s in shapes]


@functools.partial(jax.jit,
                   static_argnames=("band", "band_k", "K", "dual_out"))
def fused_face_tiles_chunked(idx_r, idx_c, co, dl, edge_attr, cell_attr, p,
                             band: int, band_k: int, K: int,
                             dual_out: bool = False):
    """Chunked fused FaceBlock: K tiles per grid step over one shared band."""
    T, tile, _ = idx_r.shape
    H = edge_attr.shape[1]
    wdt = edge_attr.dtype
    w0e, w0r, w0c = (p["w0"][:H].astype(wdt), p["w0"][H:2 * H].astype(wdt),
                     p["w0"][2 * H:3 * H].astype(wdt))
    args = [w0e, w0r, w0c, p["b0"].astype(wdt).reshape(1, -1),
            p["w1"].astype(wdt), p["b1"].astype(wdt).reshape(1, -1),
            p["w2"].astype(wdt), p["b2"].astype(wdt).reshape(1, -1),
            p["ln_scale"].astype(wdt).reshape(1, -1),
            p["ln_bias"].astype(wdt).reshape(1, -1)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // K,),
        in_specs=[
            pl.BlockSpec((K, tile, 1), lambda j, co, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile, 1), lambda j, co, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * tile, H), lambda j, co, dl: (j, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs2([a.shape for a in args]) + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((K * tile, H), lambda j, co, dl: (j, 0),
                                memory_space=pltpu.VMEM)
                   ] * (2 if dual_out else 1),
        scratch_shapes=[pltpu.VMEM((2, band_k, H), cell_attr.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    outs = pl.pallas_call(
        functools.partial(_fused_face_kernel_chunk, dual_out=dual_out, K=K,
                          B=band),
        out_shape=[jax.ShapeDtypeStruct((T * tile, H), edge_attr.dtype)
                   ] * (2 if dual_out else 1),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(co, dl, idx_r, idx_c, edge_attr, *args, cell_attr)
    return tuple(outs) if dual_out else outs[0]


@functools.partial(jax.jit,
                   static_argnames=("band", "band_k", "K", "dual_out"))
def fused_cell_tiles_chunked(i0, i1, i2, co, dl, cell_attr, vtx128, p,
                             band: int, band_k: int, K: int,
                             dual_out: bool = False):
    """Chunked fused CellBlock: K tiles per grid step over one shared band."""
    T, tile, _ = i0.shape
    H = cell_attr.shape[1]
    wdt = cell_attr.dtype
    w0c = p["w0"][:H].astype(wdt)
    w0a = jnp.zeros((H, H), wdt).at[: H // 2].set(
        p["w0"][H: H + H // 2].astype(wdt))
    args = [w0c, w0a, p["b0"].astype(wdt).reshape(1, -1),
            p["w1"].astype(wdt), p["b1"].astype(wdt).reshape(1, -1),
            p["w2"].astype(wdt), p["b2"].astype(wdt).reshape(1, -1),
            p["ln_scale"].astype(wdt).reshape(1, -1),
            p["ln_bias"].astype(wdt).reshape(1, -1)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // K,),
        in_specs=[
            pl.BlockSpec((K, tile, 1), lambda j, co, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile, 1), lambda j, co, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile, 1), lambda j, co, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * tile, H), lambda j, co, dl: (j, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs2([a.shape for a in args]) + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((K * tile, H), lambda j, co, dl: (j, 0),
                                memory_space=pltpu.VMEM)
                   ] * (2 if dual_out else 1),
        scratch_shapes=[pltpu.VMEM((2, band_k, H), vtx128.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    outs = pl.pallas_call(
        functools.partial(_fused_cell_kernel_chunk, dual_out=dual_out, K=K,
                          B=band),
        out_shape=[jax.ShapeDtypeStruct((T * tile, H), cell_attr.dtype)
                   ] * (2 if dual_out else 1),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(co, dl, i0, i1, i2, cell_attr, *args, vtx128)
    return tuple(outs) if dual_out else outs[0]


def _dual_colidx_kernel_chunk(co_ref, dl_ref, tgt_a_ref, tgt_b_ref, src_hbm,
                              *outs_and_scratch, combine_roll: int, K: int,
                              B: int):
    """Chunked :func:`_dual_colidx_kernel`: K tiles per grid step over one
    shared band DMA, each tile's band an 8-aligned dynamic slice."""
    if combine_roll:
        out_a, band2, sem2 = outs_and_scratch
    else:
        out_a, out_b, band2, sem2 = outs_and_scratch
    tile = out_a.shape[0] // K
    j, slot = _chunk_band_wait(co_ref, src_hbm, band2, sem2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, B), 0)
    dn = (((1,), (0,)), ((), ()))
    ras, rbs = [], []
    for k in range(K):
        rel = pl.multiple_of(dl_ref[j * K + k], 8)
        band_k = band2[slot, pl.ds(rel, B), :]
        a = (tgt_a_ref[k] == rows).astype(jnp.float32).astype(band_k.dtype)
        b = (tgt_b_ref[k] == rows).astype(jnp.float32).astype(band_k.dtype)
        ras.append(jax.lax.dot_general(a, band_k, dimension_numbers=dn,
                                       preferred_element_type=jnp.float32))
        rbs.append(jax.lax.dot_general(b, band_k, dimension_numbers=dn,
                                       preferred_element_type=jnp.float32))
    ra = jnp.concatenate(ras, axis=0)
    rb = jnp.concatenate(rbs, axis=0)
    if combine_roll:
        out_a[:] = (ra + pltpu.roll(rb, combine_roll, 1)).astype(out_a.dtype)
    else:
        out_a[:] = ra.astype(out_a.dtype)
        out_b[:] = rb.astype(out_b.dtype)


@functools.partial(jax.jit,
                   static_argnames=("combine_roll", "band_k", "K"))
def banded_dual_colidx_chunked(tgt_a: jax.Array, tgt_b: jax.Array,
                               co: jax.Array, dl: jax.Array, src: jax.Array,
                               band_k: int, K: int, combine_roll: int = 0):
    T, _, B = tgt_a.shape
    tile = 128
    H = src.shape[1]
    n_out = 1 if combine_roll else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // K,),
        in_specs=[
            pl.BlockSpec((K, 1, B), lambda j, co, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, B), lambda j, co, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((K * tile, H), lambda j, co, dl: (j, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        scratch_shapes=[pltpu.VMEM((2, band_k, H), src.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    outs = pl.pallas_call(
        functools.partial(_dual_colidx_kernel_chunk,
                          combine_roll=combine_roll, K=K, B=B),
        out_shape=[jax.ShapeDtypeStruct((T * tile, H), src.dtype)] * n_out,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(co, dl, tgt_a, tgt_b, src)
    return outs[0] if combine_roll else outs
