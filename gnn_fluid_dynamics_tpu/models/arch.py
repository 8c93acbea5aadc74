"""Core neural architecture: MLPs, GN blocks, encode-process-decode, integrators.

Flax re-design of the reference's encoder/processor/decoder stack
(``src/models/Fvgn.py:214-333``, ``src/models/Mgn.py:199-275``). One
parameterized module family replaces the reference's 30 copy-pasted inner
classes; variant wiring (block order, weight sharing, aggregation layout,
conservative/vertex-potential blocks) is selected by a frozen
:class:`ArchConfig`, so each jit sees fully static structure.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_fluid_dynamics_tpu.graph import MeshGraph
from gnn_fluid_dynamics_tpu.ops import segment as seg_ops


@dataclasses.dataclass(frozen=True)
class ArchConfig:
    hidden: int = 128
    mp_num: int = 15
    dropout_rate: float = 0.0
    block_order: str = "cell_first"   # "cell_first" (FVGN) | "face_first" (MGN)
    share_blocks: bool = False        # FvgnF: one GN block applied mp_num times
    aggregation: str = "segment"      # "segment" | "gather" edge->vertex layout
    step_scalar: bool = False         # FvgnF: append normalized step index
    remat: bool = False               # jax.checkpoint each GN block: trades
    #                                   ~mp_num x block FLOPs in backward for
    #                                   O(1) activation memory — deep
    #                                   processors / big meshes fit in HBM
    compute_dtype: str = "float32"    # "bfloat16" runs the MLP stack on the
    #                                   MXU in bf16 (params stay fp32); the
    #                                   physics/integrator path stays fp32

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class MLP(nn.Module):
    """Linear-SiLU-[Dropout]-Linear-SiLU-[Dropout]-Linear [+LayerNorm]
    (reference ``Model.build_mlp``, Model.py:12-40). ``dtype`` is the compute
    dtype (params remain float32); outputs are cast back to float32 so the
    physics path downstream is unaffected."""
    hidden: int
    out_size: int
    layer_norm: bool = True
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, raw: bool = False):
        dt = self.dtype or jnp.float32
        d0 = nn.Dense(self.hidden, dtype=dt, name="Dense_0")
        d1 = nn.Dense(self.hidden, dtype=dt, name="Dense_1")
        d2 = nn.Dense(self.out_size, dtype=dt, name="Dense_2")
        # epsilon matches torch.nn.LayerNorm (1e-5): the reference's
        # build_mlp (Model.py:12-40) uses the torch default, and the eps
        # gap vs flax's 1e-6 is measurable (~0.2% outputs) on
        # low-variance latents — required for one-step loss parity.
        ln = (nn.LayerNorm(dtype=dt, epsilon=1e-5, name="LayerNorm_0")
              if self.layer_norm else None)
        if raw:
            # materialize the params without real compute (zero-row pass,
            # DCE'd by XLA) and hand them to a fused Pallas kernel
            z = d2(nn.silu(d1(nn.silu(d0(x[:0])))))
            if ln is not None:
                ln(z)
            pr = {"w0": d0.variables["params"]["kernel"],
                  "b0": d0.variables["params"]["bias"],
                  "w1": d1.variables["params"]["kernel"],
                  "b1": d1.variables["params"]["bias"],
                  "w2": d2.variables["params"]["kernel"],
                  "b2": d2.variables["params"]["bias"]}
            if ln is not None:
                pr["ln_scale"] = ln.variables["params"]["scale"]
                pr["ln_bias"] = ln.variables["params"]["bias"]
            return pr
        x = x.astype(dt)
        x = d0(x)
        x = nn.silu(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = d1(x)
        x = nn.silu(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = d2(x)
        if ln is not None:
            x = ln(x)
        return x.astype(jnp.float32)


class AntisymMLP(nn.Module):
    """Bias-free tanh MLP for antisymmetric edge features — odd activation and
    no bias keep f(-x) = -f(x) (reference ``Conservative.build_mlp_antisym``,
    Conservative.py:31-43)."""
    hidden: int
    out_size: int
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden, use_bias=False)(x)
        x = nn.tanh(x)
        x = nn.Dense(self.hidden, use_bias=False)(x)
        x = nn.tanh(x)
        x = nn.Dense(self.out_size, use_bias=False)(x)
        if self.layer_norm:
            x = nn.LayerNorm(use_bias=False, epsilon=1e-5)(x)
        return x


def aggregate_faces_to_cells(edge_attr: jax.Array, graph: MeshGraph,
                             antisym: bool) -> jax.Array:
    """Direct face->cell two-way aggregation (the Conservative family's
    Cell_Block scatter, reference ``Conservative.py:243-254, 636-652``),
    expressed as a static gather over each cell's 3 faces.

    The reference scatters ``[e, -e]`` (antisym) or ``[e, e]`` (symm) onto
    ``[col, row]``; with the precomputed ``cell_face_sign`` table the per-slot
    weight is known statically:

    * antisym: +1 where the cell is the neighbour, -1 where owner (=-sign),
      and 0 on boundary self-loops (the +e/-e pair cancels);
    * symm: 1 everywhere, 2 on boundary self-loops (the cell receives both
      copies).
    """
    gface = graph.face_index.T                              # (C, 3)
    e = edge_attr[gface]                                    # (C, 3, H)
    boundary = graph.face_boundary_mask[gface]              # (C, 3)
    if antisym:
        w = jnp.where(boundary, 0.0, -graph.cell_face_sign)
    else:
        w = jnp.where(boundary, 2.0, 1.0)
    return jnp.sum(e * w[..., None], axis=1)


AUTO_PALLAS_MIN_CELLS = 10240   # crossover for the DENSE-TABLE per-tile
#                                 kernels only (graphs without index vectors,
#                                 e.g. trainer validation's derive_idx=False
#                                 path): those lose to XLA banded below ~10k
#                                 cells. With index vectors present
#                                 (to_static_bands), the idx/chunked kernels
#                                 win at every measured size (1575 vs 1334
#                                 steps/s at 3.5k, 450 vs 368 at 13.7k —
#                                 PERF.md round 3), so ``auto`` takes them
#                                 unconditionally.


def _resolve_aggregation(aggregation: str, graph: MeshGraph,
                         train: bool = False) -> str:
    # the Pallas kernels are rollout-only (no custom VJP,
    # ops/pallas_agg.py); any gradient path downgrades to the XLA banded
    # formulation, which is differentiable and numerically identical
    if aggregation == "pallas" and train:
        return "banded" if graph.hv_onehot is not None else "segment"
    if aggregation != "auto":
        return aggregation
    if graph.hv_onehot is None:
        return "segment"
    if not train and jax.default_backend() == "tpu" and (
            graph.es_tgt is not None
            or graph.num_cells >= AUTO_PALLAS_MIN_CELLS):
        return "pallas"
    return "banded"


def aggregate_twice_mp(edge_attr: jax.Array, graph: MeshGraph,
                       aggregation: str, train: bool = False) -> jax.Array:
    """The reference's 'twice message passing': chunk edge latents into
    forward/reverse halves, scatter onto vertices, average each cell's 3
    vertices (``Fvgn.py:305-321``). Returns (C, H/2)."""
    H = edge_attr.shape[-1]
    aggregation = _resolve_aggregation(aggregation, graph, train)
    if aggregation == "pallas" and graph.es_onehot is not None:
        from gnn_fluid_dynamics_tpu.ops.pallas_agg import (
            aggregate_edges_to_vertices_pallas,
            aggregate_vertices_to_cells_pallas)
        vtx = aggregate_edges_to_vertices_pallas(edge_attr, graph)
        return aggregate_vertices_to_cells_pallas(vtx, graph)
    if aggregation in ("banded", "pallas") and graph.hv_onehot is not None:
        from gnn_fluid_dynamics_tpu.ops.banded import banded_matmul
        hr = edge_attr.reshape(2 * edge_attr.shape[0], H // 2)
        vtx = banded_matmul(graph.hv_onehot, graph.hv_start, hr, graph.hv_off)
        return banded_matmul(graph.vc_onehot, graph.vc_start, vtx,
                             graph.vc_off) / 3.0
    if aggregation == "gather" and graph.vertex_inc_edge is not None:
        vtx = seg_ops.aggregate_edges_to_vertices_gather(
            edge_attr, graph.vertex_inc_edge, graph.vertex_inc_half,
            graph.vertex_inc_valid)
    else:
        fwd, rev = edge_attr[:, : H // 2], edge_attr[:, H // 2:]
        vtx = seg_ops.aggregate_edges_to_vertices_scatter(
            fwd, rev, graph.vertex_edge_index, graph.num_vertices)
    return seg_ops.gather_vertices_to_cells(vtx, graph.vertex_face)


def gather_face_cells(cell_attr: jax.Array, graph: MeshGraph,
                      aggregation: str, train: bool = False):
    """(x[owner], x[neighbour]) per face — banded einsum when available, else
    row gathers."""
    aggregation = _resolve_aggregation(aggregation, graph, train)
    if aggregation == "pallas" and graph.cf_row_onehot is not None:
        from gnn_fluid_dynamics_tpu.ops.pallas_agg import (
            gather_face_cells_pallas)
        return gather_face_cells_pallas(cell_attr, graph)
    if aggregation in ("banded", "pallas") and graph.cf_row_onehot is not None:
        from gnn_fluid_dynamics_tpu.ops.banded import _bands, _bands_dynamic
        B = graph.cf_row_onehot.shape[2]
        cell_attr_b = cell_attr.astype(graph.cf_row_onehot.dtype)
        rows, cols = [], []
        to = so = 0
        for spec in graph.cf_start:
            Tp, Sp = spec[0], spec[1]
            if len(spec) > 2:
                bands = _bands(cell_attr_b[so: so + Sp], B, spec[2])
            else:
                bands = _bands_dynamic(cell_attr_b[so: so + Sp], B,
                                       graph.cf_off[to: to + Tp])
            rows.append(jnp.einsum(
                "tib,tbh->tih", graph.cf_row_onehot[to: to + Tp],
                bands, preferred_element_type=jnp.float32))
            cols.append(jnp.einsum(
                "tib,tbh->tih", graph.cf_col_onehot[to: to + Tp],
                bands, preferred_element_type=jnp.float32))
            to += Tp
            so += Sp
        x_row = (jnp.concatenate(rows) if len(rows) > 1
                 else rows[0]).reshape(-1, cell_attr.shape[1])
        x_col = (jnp.concatenate(cols) if len(cols) > 1
                 else cols[0]).reshape(-1, cell_attr.shape[1])
        return x_row, x_col
    row, col = graph.cell_edge_index[0], graph.cell_edge_index[1]
    return cell_attr[row], cell_attr[col]


def _fused_block_ok(cfg: ArchConfig, graph: MeshGraph, extra,
                    train: bool) -> bool:
    """Fused Pallas GN-block path (gather+MLP+LN+residual in one kernel,
    ops/pallas_agg.py): rollout-only, plain blocks (no step-scalar extra),
    index vectors present. GFD_PALLAS_UNFUSED=1 disables for A/B."""
    import os
    if train or extra is not None or os.environ.get("GFD_PALLAS_UNFUSED"):
        return False
    if _resolve_aggregation(cfg.aggregation, graph, train) != "pallas":
        return False
    return graph.cf_row_idx is not None and graph.vc_idx0 is not None \
        and graph.es_tgt is not None


class CellBlock(nn.Module):
    """Edge->vertex->cell aggregation + cell MLP (reference ``Cell_Block``,
    Fvgn.py:298-325)."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_attr, edge_attr, graph: MeshGraph,
                 extra=None, train: bool = False, fused_dual: bool = False):
        mlp = MLP(self.cfg.hidden, self.cfg.hidden,
                  dropout_rate=self.cfg.dropout_rate, dtype=self.cfg.dtype,
                  name="MLP_0")
        if _fused_block_ok(self.cfg, graph, extra, train):
            from gnn_fluid_dynamics_tpu.ops.pallas_agg import (
                fused_cell_block_pallas)
            H = self.cfg.hidden
            p = mlp(jnp.zeros((0, H + H // 2)), train, raw=True)
            return fused_cell_block_pallas(
                cell_attr.astype(jnp.bfloat16),
                edge_attr.astype(jnp.bfloat16), graph, p,
                dual_out=fused_dual)
        cell_agg = aggregate_twice_mp(edge_attr, graph, self.cfg.aggregation,
                                      train)
        parts = [cell_attr, cell_agg]
        if extra is not None:
            parts.append(jnp.broadcast_to(extra, (cell_attr.shape[0], extra.shape[-1])))
        collected = jnp.concatenate(parts, axis=-1)
        return mlp(collected, train)


class FaceBlock(nn.Module):
    """[edge | cell_owner | cell_neighbour] -> face MLP (reference
    ``Face_Block``, Fvgn.py:286-296)."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_attr, edge_attr, graph: MeshGraph,
                 extra=None, train: bool = False, fused_dual: bool = False):
        mlp = MLP(self.cfg.hidden, self.cfg.hidden,
                  dropout_rate=self.cfg.dropout_rate, dtype=self.cfg.dtype,
                  name="MLP_0")
        if _fused_block_ok(self.cfg, graph, extra, train):
            from gnn_fluid_dynamics_tpu.ops.pallas_agg import (
                fused_face_block_pallas)
            p = mlp(jnp.zeros((0, 3 * self.cfg.hidden)), train, raw=True)
            return fused_face_block_pallas(
                cell_attr.astype(jnp.bfloat16),
                edge_attr.astype(jnp.bfloat16), graph, p,
                dual_out=fused_dual)
        x_row, x_col = gather_face_cells(cell_attr, graph,
                                         self.cfg.aggregation, train)
        parts = [edge_attr, x_row, x_col]
        if extra is not None:
            parts.append(jnp.broadcast_to(extra, (edge_attr.shape[0], extra.shape[-1])))
        agg = jnp.concatenate(parts, axis=-1)
        return mlp(agg, train)


class GNBlock(nn.Module):
    """One processor block with residual connections. FVGN order: cell block
    then face block (Fvgn.py:274-284); MGN order: face first (Mgn.py:216-226)."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_attr, edge_attr, graph: MeshGraph,
                 extra=None, train: bool = False):
        if _fused_block_ok(self.cfg, graph, extra, train):
            # fused kernels: residual applied in-register; the SECOND block
            # consumes the FIRST block's RAW (un-residualed) output, matching
            # the reference GN_Block dataflow (Fvgn.py:274-284)
            if self.cfg.block_order == "cell_first":
                c_raw, c_res = CellBlock(self.cfg)(
                    cell_attr, edge_attr, graph, extra, train,
                    fused_dual=True)
                e_res = FaceBlock(self.cfg)(c_raw, edge_attr, graph, extra,
                                            train)
                return c_res, e_res
            e_raw, e_res = FaceBlock(self.cfg)(cell_attr, edge_attr, graph,
                                               extra, train, fused_dual=True)
            c_res = CellBlock(self.cfg)(cell_attr, e_raw, graph, extra,
                                        train)
            return c_res, e_res
        prev_cell, prev_edge = cell_attr, edge_attr
        if self.cfg.block_order == "cell_first":
            cell_attr = CellBlock(self.cfg)(cell_attr, edge_attr, graph, extra, train)
            edge_attr = FaceBlock(self.cfg)(cell_attr, edge_attr, graph, extra, train)
        else:
            edge_attr = FaceBlock(self.cfg)(cell_attr, edge_attr, graph, extra, train)
            cell_attr = CellBlock(self.cfg)(cell_attr, edge_attr, graph, extra, train)
        return prev_cell + cell_attr, prev_edge + edge_attr


class Encoder(nn.Module):
    """Independent face/cell input MLPs (reference ``Encoder``, Fvgn.py:257-266)."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_x, face_x, train: bool = False):
        face_attr = MLP(self.cfg.hidden, self.cfg.hidden,
                        dropout_rate=self.cfg.dropout_rate,
                        dtype=self.cfg.dtype, name="face_mlp")(face_x, train)
        cell_attr = MLP(self.cfg.hidden, self.cfg.hidden,
                        dropout_rate=self.cfg.dropout_rate,
                        dtype=self.cfg.dtype, name="cell_mlp")(cell_x, train)
        return cell_attr, face_attr


class EncodeProcessDecode(nn.Module):
    """Encoder -> mp_num GN blocks -> decoder head(s).

    ``face_out``/``cell_out`` of 0 disable that head. The decoder face head is
    called ``face_mlp`` for checkpoint naming parity with the reference decoder
    (Fvgn.py:327-333)."""
    cfg: ArchConfig
    face_out: int = 0
    cell_out: int = 0

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False):
        cell_attr, edge_attr = Encoder(self.cfg)(cell_x, face_x, train)

        # explicit names keep the param tree (and checkpoints) identical
        # with and without rematerialization
        # static_argnums counts the module as arg 0: train is arg 5. Leaving
        # it traced breaks the fused-block dispatch (`if train` on a tracer).
        maybe_remat = (nn.remat(GNBlock, static_argnums=(5,))
                       if self.cfg.remat else GNBlock)
        if self.cfg.share_blocks:
            block = maybe_remat(self.cfg, name="GNBlock_0")
            for i in range(self.cfg.mp_num):
                extra = None
                if self.cfg.step_scalar:
                    extra = jnp.array([(i + 1) / self.cfg.mp_num],
                                      dtype=cell_attr.dtype)[None, :]
                cell_attr, edge_attr = block(cell_attr, edge_attr, graph,
                                             extra, train)
        else:
            for i in range(self.cfg.mp_num):
                cell_attr, edge_attr = maybe_remat(
                    self.cfg, name=f"GNBlock_{i}")(
                    cell_attr, edge_attr, graph, None, train)

        face_out = cell_out = None
        if self.face_out:
            face_out = MLP(self.cfg.hidden, self.face_out, layer_norm=False,
                           dropout_rate=self.cfg.dropout_rate,
                           dtype=self.cfg.dtype,
                           name="decoder_face")(edge_attr, train)
        if self.cell_out:
            cell_out = MLP(self.cfg.hidden, self.cell_out, layer_norm=False,
                           dropout_rate=self.cfg.dropout_rate,
                           dtype=self.cfg.dtype,
                           name="decoder_cell")(cell_attr, train)
        return cell_out, face_out


# -----------------------------------------------------------------------------
# Geometric batch norms + integrators
# -----------------------------------------------------------------------------

class MaskedBatchNorm(nn.Module):
    """1-channel batch norm over valid elements only — the counterpart of the
    reference's ``torch.nn.BatchNorm1d(1)`` inside integrators
    (``normalisation.py:325-365``), with padding masked out of the batch
    statistics. momentum 0.9 matches torch's default 0.1 update rate."""
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool):
        bn = nn.BatchNorm(use_running_average=not train,
                          momentum=self.momentum, epsilon=self.epsilon,
                          axis_name=None)
        m = mask.reshape(-1, 1) if mask is not None else None
        return bn(x, mask=m)


def _vol_dt_coeff(graph: MeshGraph) -> jax.Array:
    """mean(dt) / mean-adjacent-cell-volume per face (reference
    ``normalize_vol_dt`` core, normalisation.py:346-365)."""
    vol = graph.cell_volume.reshape(-1)
    v_avg = 0.5 * (vol[graph.cell_edge_index[0]] + vol[graph.cell_edge_index[1]])
    # padded faces point at padded cells with zero volume; clamp so no inf/nan
    # can enter downstream gathers (valid faces are unaffected)
    v_avg = jnp.maximum(v_avg, 1e-12)
    return (jnp.mean(graph.dt) / v_avg).reshape(-1, 1)


class FaceAreaNorm(nn.Module):
    """BatchNorm'd face_area * dt / V̄ scaling (reference
    ``normalize_face_area``, normalisation.py:325-344)."""
    @nn.compact
    def __call__(self, graph: MeshGraph, train: bool):
        scaled = graph.face_area.reshape(-1, 1) * _vol_dt_coeff(graph)
        return MaskedBatchNorm()(scaled, graph.face_mask, train)


class VolDtNorm(nn.Module):
    """BatchNorm'd dt / V̄ (reference ``normalize_vol_dt``)."""
    @nn.compact
    def __call__(self, graph: MeshGraph, train: bool):
        return MaskedBatchNorm()(_vol_dt_coeff(graph), graph.face_mask, train)


def _gather3(x: jax.Array, face_index: jax.Array) -> jax.Array:
    """x: (F, D) -> (C, 3, D) gathered by each cell's 3 faces."""
    return x[face_index.T]


def gather3(x: jax.Array, graph: MeshGraph) -> jax.Array:
    """(F, D) -> (C, 3, D) per-cell face gather. When the graph carries the
    fc3 banded selector, one einsum replaces the row gather — TPU row gathers
    run ~1 row/cycle and the integrators' (C, 3) gathers dominated the
    rollout's fixed per-step cost (~0.5 ms of a 1.2 ms step)."""
    if graph.fc3_onehot is not None:
        from gnn_fluid_dynamics_tpu.ops.banded import banded_matmul
        out = banded_matmul(graph.fc3_onehot, graph.fc3_start, x,
                            graph.fc3_off)
        return out[: 3 * graph.num_cells].reshape(-1, 3, x.shape[1])
    return x[graph.face_index.T]


class FvgnIntegrator(nn.Module):
    """Normalized-space momentum flux balance (reference ``FvgnA.Integrator``,
    Fvgn.py:214-255): acc = -Phi_A - Phi_P/rho + Phi_D with BatchNorm'd
    area*dt/V̄ face weights. ``edge_output`` = [u_f, v_f, p_f, D_x, D_y].

    Also returns the normalized face area for reuse by the continuity loss
    (reference re-applies the same BatchNorm in ``FvgnA.loss``, Fvgn.py:180)."""
    rho: float = 1.0

    @nn.compact
    def __call__(self, edge_output, graph: MeshGraph, train: bool):
        face_area = FaceAreaNorm(name="face_area_norm")(graph, train)
        unv = graph.cell_normal                               # (C, 3, 2)
        uv = edge_output[:, :2]
        p = edge_output[:, 2:3]
        flux_d = edge_output[:, 3:]

        uu_vu = jnp.concatenate([uv[:, 0:1] * uv, uv[:, 1:2] * uv], axis=-1)  # (F,4)
        # ONE fused per-cell face gather of every face quantity
        g = gather3(jnp.concatenate([face_area, uu_vu, flux_d, p], axis=1),
                    graph)                                    # (C, 3, 8)
        e, uu, d, pf = g[..., 0:1], g[..., 1:5], g[..., 5:7], g[..., 7:8]
        # advective: per local face, chain_flux_dot([uu,uv,vu,vv], n) * area
        a = jnp.einsum("cfkd,cfd->cfk",
                       uu.reshape(-1, 3, 2, 2), unv)          # (C, 3, 2)
        phi_a = jnp.sum(a * e, axis=1)                        # (C, 2)
        phi_d = jnp.sum(d, axis=1)
        phi_p = jnp.sum(pf * unv * e, axis=1)                 # (C, 2)

        acc = -phi_a - phi_p / self.rho + phi_d
        acc = jnp.where(graph.cell_mask[:, None], acc, 0.0)
        return acc, {"norm_face_area": face_area}


class PhysicalIntegrator(nn.Module):
    """Real-space integrator (reference ``FvgnB.Integrator``, Fvgn.py:425-460):
    true dt/V scaling, viscous term from the MLS face velocity gradient.
    ``edge_output`` = [u_f, v_f, p_f] in physical units."""
    rho: float = 1.0
    nu: float = 1e-3

    @nn.compact
    def __call__(self, edge_output, graph: MeshGraph, train: bool):
        from gnn_fluid_dynamics_tpu.ops.fvm import calc_gradient_tensor
        unv = graph.cell_normal
        area = graph.face_area.reshape(-1, 1)
        uv = edge_output[:, :2]
        p = edge_output[:, 2:3]

        uu_vu = jnp.concatenate([uv[:, 0:1] * uv, uv[:, 1:2] * uv], axis=-1)
        grad = calc_gradient_tensor(uv, graph.face_grad_weights,
                                    graph.face_grad_neighbours)   # (F, 4)
        gg = gather3(jnp.concatenate([area, uu_vu, grad, p], axis=1), graph)
        e, uu, gr, pf = (gg[..., 0:1], gg[..., 1:5].reshape(-1, 3, 2, 2),
                         gg[..., 5:9].reshape(-1, 3, 2, 2), gg[..., 9:10])
        phi_a = jnp.sum(jnp.einsum("cfkd,cfd->cfk", uu, unv) * e, axis=1)
        phi_d = jnp.sum(jnp.einsum("cfkd,cfd->cfk", gr, unv) * e, axis=1)
        phi_p = jnp.sum(pf * unv * e, axis=1)

        coeff = jnp.mean(graph.dt) / jnp.maximum(
            graph.cell_volume.reshape(-1, 1), 1e-12)
        acc = coeff * (-phi_a - phi_p / self.rho + self.nu * phi_d)
        acc = jnp.where(graph.cell_mask[:, None], acc, 0.0)
        return acc, {}


class FluxIntegrator(nn.Module):
    """Flux-based advection (reference ``FluxA.Integrator``, Flux.py:158-206):
    the advective momentum flux uses the *predicted face flux* converted to
    signed per-cell flux, with BatchNorm'd dt/V̄ weights; pressure uses
    BatchNorm'd area weights. ``edge_output`` =
    [u_f, v_f, p_f, phi_f, D_x, D_y]."""
    rho: float = 1.0

    @nn.compact
    def __call__(self, edge_output, graph: MeshGraph, train: bool):
        uv = edge_output[:, :2]
        p = edge_output[:, 2:3]
        phi = edge_output[:, 3:4]
        flux_d = edge_output[:, 4:6]

        n = VolDtNorm(name="vol_dt_norm")(graph, train)             # (F, 1)
        face_area = FaceAreaNorm(name="face_area_norm")(graph, train)
        g = gather3(jnp.concatenate([phi, n, uv, flux_d, face_area, p],
                                    axis=1), graph)                 # (C, 3, 8)
        phif, nf, uvf = g[..., 0:1], g[..., 1:2], g[..., 2:4]
        df, e, pf = g[..., 4:6], g[..., 6:7], g[..., 7:8]
        # signed per-cell flux (reference fvm.face_flux_to_cell_flux)
        cell_flux = phif * graph.cell_face_sign[..., None]          # (C, 3, 1)
        phi_a = jnp.sum(uvf * cell_flux * nf, axis=1)               # (C, 2)
        phi_d = jnp.sum(df, axis=1)
        phi_p = jnp.sum(pf * graph.cell_normal * e, axis=1)

        acc = -phi_a - phi_p / self.rho + phi_d
        acc = jnp.where(graph.cell_mask[:, None], acc, 0.0)
        return acc, {"norm_face_area": face_area,
                     "cell_flux": cell_flux[..., 0]}


class LearnedScaleDenorm(nn.Module):
    """Learned per-channel scale/bias output denormalization replacing the
    z-score inverse (reference ``FvgnJ``, Fvgn.py:1149-1157). FluxD disables
    the biases (constant 0, Flux.py:471-475) — ``learn_bias=False``."""
    channels: int
    init_scale: float = 1.0          # scalar or per-channel tuple (FvgnJ)
    learn_bias: bool = True

    @nn.compact
    def __call__(self, x):
        init = jnp.broadcast_to(jnp.asarray(self.init_scale, jnp.float32),
                                (self.channels,))
        scale = self.param("scale", lambda key, shape: init.astype(jnp.float32),
                           (self.channels,))
        if not self.learn_bias:
            return x * scale
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return x * scale + bias
