"""Fused banded aggregation as Pallas TPU kernels (optional backend).

One kernel per table application: the per-tile source band is DMA'd
HBM->VMEM double-buffered at a scalar-prefetched offset, and the one-hot
weights (auto-pipelined VMEM blocks, int8 or bf16 storage, upcast on-chip)
multiply it on the MXU — the band never round-trips through HBM, unlike the
XLA path in :mod:`gnn_fluid_dynamics_tpu.ops.banded` which materializes
stacked band slices before its einsum.

Measured on one v5e chip (cylinder mesh, ~3.5k cells, H=128, per MP-block):

==============  ============  ===========================
table           XLA banded    Pallas fused (int8 tables)
==============  ============  ===========================
hv (via es/er)  17.8 us       17.7 us
cf (row+col)    20.0 us       22.5 us (tile=256)
==============  ============  ===========================

End-to-end 600-step rollouts (bench.py, FluxD hidden 128 mp 15):

=============  ===========  ============================
mesh           XLA banded   Pallas fused (int8 tables)
=============  ===========  ============================
~3.5k cells    1320 st/s    688 st/s
~14k cells     261 st/s     314 st/s (and 3x faster compile)
=============  ===========  ============================

At small scale the XLA static-slice path is near the memory-bound floor
and Pallas per-program overhead (~0.3us x T tiles) eats the savings from
skipping band materialization; past ~10k cells band traffic (linear in
mesh size) dominates the fixed overhead and the fused kernels win. The
default stays ``aggregation="banded"``; switch to ``"pallas"`` for
production-size meshes.

Safety invariant: band offsets satisfy ``off + B <= num_sources`` (enforced
in ``banded._build_table``) — an out-of-bounds DMA does not fault cleanly,
it wedges the chip.

The kernels run in interpreter mode off-TPU so CPU tests exercise them.
Rollout-only (no custom VJP): training uses the XLA dynamic-offset path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


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
    outs = []
    to = so = 0
    for spec in graph.es_start:
        Tp, Sp = spec[0], spec[1]
        oh_s = graph.es_onehot[to: to + Tp]
        oh_r = graph.er_onehot[to: to + Tp]
        off = graph.es_off[to: to + Tp]
        outs.append(banded_dual_pallas(
            oh_s, oh_r, off, edge_attr[so: so + Sp].astype(jnp.bfloat16),
            combine_roll=edge_attr.shape[1] // 2))
        to += Tp
        so += Sp
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def aggregate_vertices_to_cells_pallas(vtx128: jax.Array, graph):
    """vc mean on a (V, H) vertex latent whose payload is in lanes 0:H/2;
    returns (C, H/2) f32 like the XLA path. The shared vc table stores
    weight 1; the 1/3 vertex mean is a scalar epilogue."""
    outs = []
    to = so = 0
    for spec in graph.vc_start:
        Tp, Sp = spec[0], spec[1]
        oh = graph.vc_onehot[to: to + Tp]
        off = graph.vc_off[to: to + Tp]
        outs.append(banded_single_pallas(oh, off, vtx128[so: so + Sp]))
        to += Tp
        so += Sp
    out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    H2 = vtx128.shape[1] // 2
    return out[:, :H2].astype(jnp.float32) / 3.0


def gather_face_cells_pallas(cell_attr: jax.Array, graph):
    """(x[owner], x[neighbour]) per face via the shared cf band."""
    rows, cols = [], []
    to = so = 0
    for spec in graph.cf_start:
        Tp, Sp = spec[0], spec[1]
        off = graph.cf_off[to: to + Tp]
        a, b = banded_dual_pallas(
            graph.cf_row_onehot[to: to + Tp],
            graph.cf_col_onehot[to: to + Tp], off,
            cell_attr[so: so + Sp].astype(jnp.bfloat16))
        rows.append(a)
        cols.append(b)
        to += Tp
        so += Sp
    x_row = (jnp.concatenate(rows) if len(rows) > 1
             else rows[0]).astype(jnp.float32)
    x_col = (jnp.concatenate(cols) if len(cols) > 1
             else cols[0]).astype(jnp.float32)
    return x_row, x_col
