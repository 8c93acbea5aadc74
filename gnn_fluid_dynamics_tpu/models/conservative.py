"""Conservative model family (reference ``src/models/Conservative.py``) —
FVGN/MGN variants with symmetry-aware message passing: symmetric edge features
(area, angle, distance, type) and antisymmetric ones (Δv, normal) are processed
by even/odd network branches so that flipping a face's orientation flips the
learned flux sign exactly.

========  ====================================================================
ConsA     asym-gated face block (gate active in the FIRST block only — the
          reference drops ``edge_attr_asym`` after block 1, a preserved
          quirk), two-way signed cell aggregation (Conservative.py:49-262)
ConsB     same blocks on the MGN cell-output head (265-414)
ConsD     parallel symm+asym streams every block; antisymmetric decoder
          ``final_mlp(symm + asym)`` (417-658)
ConsE     FVGN features; edge latent chunked into sym/asym halves for the
          cell aggregation (661-733)
ConsF     vertex-mediated symm + edge-wise antisym aggregation, 3H face block
          (734-823)
ConsG     F with sum-combined 2H face block (824-898)
ConsH     strict parity separation; even/odd decoder with softplus·tanh
          signed flux; std_scale normalization for odd inputs (899-1210)
ConsI     BC-frozen edge latents each block (INFLOW/WALL rows keep their
          previous value) (1211-1319)
ConsJ     H wiring + learned scale/bias output params + physical integrator
          (1320-1684)
ConsK     H with the antisymmetric branch at H/2 width (1685-1954)
========  ====================================================================
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_fluid_dynamics_tpu.graph import MeshGraph
from gnn_fluid_dynamics_tpu.models import normalizer as norm
from gnn_fluid_dynamics_tpu.models import transforms as T
from gnn_fluid_dynamics_tpu.models.arch import (MLP, AntisymMLP, ArchConfig,
                                                FvgnIntegrator,
                                                LearnedScaleDenorm,
                                                aggregate_faces_to_cells,
                                                aggregate_twice_mp, gather3)
from gnn_fluid_dynamics_tpu.models.base import FluidModel
from gnn_fluid_dynamics_tpu.models.fvgn import FvgnA, _f, _z
from gnn_fluid_dynamics_tpu.models.losses import combined_log_loss, mse_per_element
from gnn_fluid_dynamics_tpu.models.mgn import MgnA
from gnn_fluid_dynamics_tpu.models.transforms import rollout_bc_mask
from gnn_fluid_dynamics_tpu.ops import fvm


def _ms(tensor, s, e):
    return norm.StatSpec("mean_scale", ("norm", tensor, s, e))


def _ss(tensor, s, e):
    return norm.StatSpec("std_scale", (tensor, s, e))


def conservative_face_features(graph: MeshGraph, cell_velocity, num_types,
                               bc_velocity):
    """x_symm = [area | angle(n̂,Δpos) | |Δpos| | one-hot];
    x_asym = [Δv (BC-overridden) | n̂] (reference Conservative.py:86-97)."""
    dv = T.calc_face_velocity_change(cell_velocity, graph.cell_edge_index)
    bc_mask = ~T.interior_face_mask(graph.face_type)
    if bc_velocity is not None:
        dv = jnp.where(bc_mask[:, None], bc_velocity, dv)
    ev = T.calc_cell_edge_vector(graph.cell_pos, graph.cell_edge_index)
    onehot = T.calc_face_type_one_hot(graph.face_type, num_types)
    ev_n = ev / jnp.maximum(jnp.linalg.norm(ev, axis=1, keepdims=True), 1e-12)
    dist = jnp.linalg.norm(ev, axis=1, keepdims=True)
    n_n = graph.face_normal / jnp.maximum(
        jnp.linalg.norm(graph.face_normal, axis=1, keepdims=True), 1e-12)
    dot = jnp.sum(ev_n * n_n, axis=1, keepdims=True)
    angle = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    face_xs = jnp.concatenate([graph.face_area, angle, dist, onehot], axis=1)
    face_xa = jnp.concatenate([dv, n_n], axis=1)
    return face_xs, face_xa, bc_mask


class _ConsEncoder(nn.Module):
    """Symm MLP + bias-free odd asym MLP + cell MLP (Conservative.py:191-202)."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_x, face_xs, face_xa, train):
        e_s = MLP(self.cfg.hidden, self.cfg.hidden,
                  dropout_rate=self.cfg.dropout_rate, name="faceS_mlp")(face_xs, train)
        e_a = AntisymMLP(self.cfg.hidden, self.cfg.hidden,
                         name="faceA_mlp")(face_xa, train)
        c = MLP(self.cfg.hidden, self.cfg.hidden,
                dropout_rate=self.cfg.dropout_rate, name="cell_mlp")(cell_x, train)
        return c, e_s, e_a


class _ConsABlock(nn.Module):
    """face: mlp([e, x_r + x_c]) [* gate]; cell: mlp([x, two-way ±agg]);
    residuals (Conservative.py:204-254)."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_attr, edge_attr, gate, graph: MeshGraph, train):
        prev_cell, prev_edge = cell_attr, edge_attr
        row, col = graph.cell_edge_index[0], graph.cell_edge_index[1]
        e = MLP(self.cfg.hidden, self.cfg.hidden,
                dropout_rate=self.cfg.dropout_rate, name="face_mlp")(
            jnp.concatenate([edge_attr, cell_attr[row] + cell_attr[col]],
                            axis=1), train)
        if gate is not None:
            e = e * gate
        agg = aggregate_faces_to_cells(e, graph, antisym=True)
        c = MLP(self.cfg.hidden, self.cfg.hidden,
                dropout_rate=self.cfg.dropout_rate, name="cell_mlp")(
            jnp.concatenate([cell_attr, agg], axis=-1), train)
        return prev_cell + c, prev_edge + e


class _ConsAModule(nn.Module):
    cfg: ArchConfig
    face_out: int = 0
    cell_out: int = 0
    integrate: bool = True

    @nn.compact
    def __call__(self, cell_x, face_xs, face_xa, graph: MeshGraph,
                 train: bool = False):
        cell_attr, edge_attr, gate = _ConsEncoder(self.cfg)(
            cell_x, face_xs, face_xa, train)
        for i in range(self.cfg.mp_num):
            # reference quirk: the asym gate survives only the first block
            cell_attr, edge_attr = _ConsABlock(self.cfg)(
                cell_attr, edge_attr, gate if i == 0 else None, graph, train)
        face_out = cell_out = None
        if self.face_out:
            face_out = MLP(self.cfg.hidden, self.face_out, layer_norm=False,
                           dropout_rate=self.cfg.dropout_rate,
                           name="decoder_face")(edge_attr, train)
        if self.cell_out:
            cell_out = MLP(self.cfg.hidden, self.cell_out, layer_norm=False,
                           dropout_rate=self.cfg.dropout_rate,
                           name="decoder_cell")(cell_attr, train)
        extras = {}
        acc = None
        if self.integrate:
            acc, extras = FvgnIntegrator(name="integrator")(face_out, graph,
                                                            train)
        return acc if self.integrate else cell_out, face_out, extras


class ConservativeA(FvgnA):
    """Conservative message passing on the FVGN head (Conservative.py:49-262)."""

    name = "ConservativeA"

    def build_module(self):
        return _ConsAModule(self.arch, face_out=5)

    def module_inputs(self, nfeats):
        return (nfeats["cell_x"], nfeats["face_xs"], nfeats["face_xa"])

    def normalisation_map(self) -> norm.NormalizationMap:
        registry = {
            "cell_velocity_x": _z("cell_x", 0, 1),
            "cell_velocity_y": _z("cell_x", 1, 2),
            "cell_velocity_change_x": _z("cell_y", 0, 1),
            "cell_velocity_change_y": _z("cell_y", 1, 2),
            "face_area": _z("face_xs", 0, 1),
            "face_adjacent_distance": _z("face_xs", 2, 3),
            "face_velocity_x": _z("face_y", 0, 1),
            "face_velocity_y": _z("face_y", 1, 2),
            "face_pressure": _z("face_y", 2, 3),
            "face_velocity_diff_char": _ms("face_xa", 0, 2),
        }
        inputs = (
            _f("cell_velocity_x", "cell_x", 0, 1),
            _f("cell_velocity_y", "cell_x", 1, 2),
            _f("face_velocity_diff", "face_xa", 0, 2, "face_velocity_diff_char"),
            _f("face_area", "face_xs", 0, 1),
            _f("face_adjacent_distance", "face_xs", 2, 3),
            _f("cell_velocity_change_x", "cell_y", 0, 1),
            _f("cell_velocity_change_y", "cell_y", 1, 2),
            _f("face_velocity_x", "face_y", 0, 1),
            _f("face_velocity_y", "face_y", 1, 2),
            _f("face_pressure", "face_y", 2, 3),
        )
        outputs = (
            _f("cell_velocity_change_x", "cell_out", 0, 1),
            _f("cell_velocity_change_y", "cell_out", 1, 2),
            _f("face_velocity_x", "face_out", 0, 1),
            _f("face_velocity_y", "face_out", 1, 2),
            _f("face_pressure", "face_out", 2, 3),
        )
        return norm.NormalizationMap(registry, inputs, outputs)

    # ---- features (Conservative.py:67-103) ---------------------------------
    def transform_features(self, graph, rng, mode="train", noise_std=0.0):
        cell_velocity = graph.cell_velocity[:, 0]
        if mode == "train" and rng is not None and noise_std:
            k_noise, k_flip = jax.random.split(rng)
            cell_velocity = T.add_noise(k_noise, cell_velocity, noise_std)
        elif rng is not None:
            k_flip = rng
        cell_y = graph.cell_velocity[:, -1] - cell_velocity
        if mode == "train" and rng is not None:
            graph, _ = T.random_edge_flip(k_flip, graph)
        face_xs, face_xa, bc_mask = conservative_face_features(
            graph, cell_velocity, self.config.num_face_types,
            bc_velocity=graph.face_velocity[:, 0])
        face_y = jnp.concatenate(
            [graph.face_velocity[:, -1], graph.face_pressure[:, -1]], axis=1)
        feats = {"cell_x": cell_velocity, "cell_y": cell_y,
                 "face_xs": face_xs, "face_xa": face_xa, "face_y": face_y,
                 "face_bc_mask": bc_mask}
        return graph, feats

    def update_features(self, solutions, feats, graph):
        """Rollout feedback writes into x_asym (Conservative.py:147-162)."""
        new_feats = dict(feats)
        v = solutions["cell_velocity"]
        new_feats["cell_x"] = v
        dv = T.calc_face_velocity_change(v[:, :2], graph.cell_edge_index)
        mask = rollout_bc_mask(graph.face_type)
        dv = jnp.where(mask[:, None], feats["face_y"][:, 0:2], dv)
        new_feats["face_xa"] = feats["face_xa"].at[:, 0:2].set(dv)
        return new_feats


class _ConsBModule(_ConsAModule):
    pass


class ConservativeB(MgnA):
    """Conservative blocks on the MGN (cell-output) head
    (Conservative.py:265-414)."""

    name = "ConservativeB"

    def build_module(self):
        return _ConsAModule(self.arch, cell_out=3, integrate=False)

    def module_inputs(self, nfeats):
        return (nfeats["cell_x"], nfeats["face_xs"], nfeats["face_xa"])

    def normalisation_map(self) -> norm.NormalizationMap:
        base = ConservativeA.normalisation_map(self)
        registry = dict(base.registry)
        del registry["face_pressure"]
        registry["cell_pressure"] = _z("cell_y", 2, 3)
        inputs = tuple(f for f in base.inputs if f.name != "face_pressure") + (
            _f("cell_pressure", "cell_y", 2, 3),)
        outputs = (
            _f("cell_velocity_change_x", "cell_out", 0, 1),
            _f("cell_velocity_change_y", "cell_out", 1, 2),
            _f("cell_pressure", "cell_out", 2, 3),
        )
        return norm.NormalizationMap(registry, inputs, outputs)

    def transform_features(self, graph, rng, mode="train", noise_std=0.0):
        graph, feats = ConservativeA.transform_features(self, graph, rng, mode,
                                                        noise_std)
        feats["cell_y"] = jnp.concatenate(
            [feats["cell_y"], graph.cell_pressure[:, -1]], axis=1)
        feats["face_y"] = graph.face_velocity[:, -1]   # BC targets only
        return graph, feats

    update_features = ConservativeA.update_features


class _ConsDBlock(nn.Module):
    """Parallel symm+asym streams (Conservative.py:572-645)."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_attr, e_s, e_a, graph: MeshGraph, train):
        row, col = graph.cell_edge_index[0], graph.cell_edge_index[1]
        new_s = MLP(self.cfg.hidden, self.cfg.hidden,
                    dropout_rate=self.cfg.dropout_rate, name="face_symm")(
            jnp.concatenate([e_s, cell_attr[row] + cell_attr[col]], axis=1),
            train)
        new_a = AntisymMLP(self.cfg.hidden, self.cfg.hidden, name="face_asym")(
            jnp.concatenate([e_a, cell_attr[row] - cell_attr[col]], axis=1),
            train)
        symm_agg = aggregate_faces_to_cells(new_s, graph, antisym=False)
        asym_agg = aggregate_faces_to_cells(new_a, graph, antisym=True)
        new_c = MLP(self.cfg.hidden, self.cfg.hidden,
                    dropout_rate=self.cfg.dropout_rate, name="cell_mlp")(
            jnp.concatenate([cell_attr, symm_agg, asym_agg], axis=-1), train)
        return cell_attr + new_c, e_s + new_s, e_a + new_a


class _ConsDModule(nn.Module):
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_x, face_xs, face_xa, graph: MeshGraph,
                 train: bool = False):
        cell_attr, e_s, e_a = _ConsEncoder(self.cfg)(cell_x, face_xs, face_xa,
                                                     train)
        for _ in range(self.cfg.mp_num):
            cell_attr, e_s, e_a = _ConsDBlock(self.cfg)(cell_attr, e_s, e_a,
                                                        graph, train)
        # antisymmetric decoder: final_mlp(symm_mlp(e_s) + asym_mlp(e_a))
        # (Conservative.py:647-658)
        s = MLP(self.cfg.hidden, self.cfg.hidden, layer_norm=False,
                name="symm_mlp")(e_s, train)
        a = AntisymMLP(self.cfg.hidden, self.cfg.hidden, name="asym_mlp")(
            e_a, train)
        face_out = AntisymMLP(self.cfg.hidden, 5, name="decoder_face")(
            s + a, train)
        acc, extras = FvgnIntegrator(name="integrator")(face_out, graph, train)
        return acc, face_out, extras


class ConservativeD(ConservativeA):
    """Parallel symm/asym streams with antisymmetric decoder
    (Conservative.py:417-658)."""
    name = "ConservativeD"

    def build_module(self):
        return _ConsDModule(self.arch)


class _ConsEBlock(nn.Module):
    """FVGN features; edge latent chunked into sym/asym halves for the cell
    aggregation (Conservative.py:671-732)."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_attr, edge_attr, graph: MeshGraph, train):
        prev_cell, prev_edge = cell_attr, edge_attr
        row, col = graph.cell_edge_index[0], graph.cell_edge_index[1]
        e = MLP(self.cfg.hidden, self.cfg.hidden,
                dropout_rate=self.cfg.dropout_rate, name="face_mlp")(
            jnp.concatenate([edge_attr, cell_attr[row] + cell_attr[col]],
                            axis=1), train)
        H = self.cfg.hidden
        e_sym, e_asym = e[:, : H // 2], e[:, H // 2:]
        sym_msg = aggregate_faces_to_cells(e_sym, graph, antisym=False)
        asym_msg = aggregate_faces_to_cells(e_asym, graph, antisym=True)
        c = MLP(self.cfg.hidden, self.cfg.hidden,
                dropout_rate=self.cfg.dropout_rate, name="cell_mlp")(
            jnp.concatenate([cell_attr, sym_msg, asym_msg], axis=-1), train)
        return prev_cell + c, prev_edge + e


class _StdEPDWithBlocks(nn.Module):
    """FvgnA-style encoder/decoder/integrator around custom block modules."""
    cfg: ArchConfig
    block_cls: type
    out_size: int = 5

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False):
        from gnn_fluid_dynamics_tpu.models.arch import Encoder
        cell_attr, edge_attr = Encoder(self.cfg)(cell_x, face_x, train)
        for _ in range(self.cfg.mp_num):
            cell_attr, edge_attr = self.block_cls(self.cfg)(
                cell_attr, edge_attr, graph, train)
        face_out = MLP(self.cfg.hidden, self.out_size, layer_norm=False,
                       dropout_rate=self.cfg.dropout_rate,
                       name="decoder_face")(edge_attr, train)
        acc, extras = FvgnIntegrator(name="integrator")(face_out, graph, train)
        return acc, face_out, extras


class ConservativeE(FvgnA):
    """FvgnA with sym/asym-chunked cell aggregation (Conservative.py:661-733)."""
    name = "ConservativeE"

    def build_module(self):
        return _StdEPDWithBlocks(self.arch, _ConsEBlock)


class _ConsFBlock(nn.Module):
    """cell-first: vertex-mediated symm + edge antisym aggregation, then a 3H
    face block (Conservative.py:757-821)."""
    cfg: ArchConfig
    face_combine: str = "concat"    # F: [e, x_r, x_c]; G: [e, x_r + x_c]

    @nn.compact
    def __call__(self, cell_attr, edge_attr, graph: MeshGraph, train):
        prev_cell, prev_edge = cell_attr, edge_attr
        H = self.cfg.hidden
        e_sym, e_asym = edge_attr[:, : H // 2], edge_attr[:, H // 2:]
        # symmetric half via vertices: duplicate (not fwd/rev-chunked) halves
        sym2 = jnp.concatenate([e_sym, e_sym], axis=-1)
        cell_agg = aggregate_twice_mp(sym2, graph, self.cfg.aggregation,
                                      train)
        asym_agg = aggregate_faces_to_cells(e_asym, graph, antisym=True)
        c = MLP(H, H, dropout_rate=self.cfg.dropout_rate, name="cell_mlp")(
            jnp.concatenate([cell_attr, cell_agg, asym_agg], axis=-1), train)
        row, col = graph.cell_edge_index[0], graph.cell_edge_index[1]
        if self.face_combine == "concat":
            face_in = jnp.concatenate([edge_attr, c[row], c[col]], axis=1)
        else:
            face_in = jnp.concatenate([edge_attr, c[row] + c[col]], axis=1)
        e = MLP(H, H, dropout_rate=self.cfg.dropout_rate, name="face_mlp")(
            face_in, train)
        return prev_cell + c, prev_edge + e


class ConservativeF(FvgnA):
    """Vertex symm + edge antisym aggregation (Conservative.py:734-823)."""
    name = "ConservativeF"

    def build_module(self):
        return _StdEPDWithBlocks(self.arch, _ConsFBlock)


class _ConsGBlock(_ConsFBlock):
    face_combine: str = "sum"


class ConservativeG(FvgnA):
    """F with sum-combined face block (Conservative.py:824-898)."""
    name = "ConservativeG"

    def build_module(self):
        return _StdEPDWithBlocks(self.arch, _ConsGBlock)


class _ConsIBlock(nn.Module):
    """ConsE-style block + BC freeze: INFLOW/WALL edge rows revert to their
    pre-block value after the residual (Conservative.py:1247-1269)."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_attr, edge_attr, graph: MeshGraph, train):
        prev_edge = edge_attr
        H = self.cfg.hidden
        e_sym, e_asym = edge_attr[:, : H // 2], edge_attr[:, H // 2:]
        sym2 = jnp.concatenate([e_sym, e_sym], axis=-1)
        cell_agg = aggregate_twice_mp(sym2, graph, self.cfg.aggregation,
                                      train)
        asym_agg = aggregate_faces_to_cells(e_asym, graph, antisym=True)
        c_new = MLP(H, H, dropout_rate=self.cfg.dropout_rate, name="cell_mlp")(
            jnp.concatenate([cell_attr, cell_agg, asym_agg], axis=-1), train)
        cell_out = cell_attr + c_new
        row, col = graph.cell_edge_index[0], graph.cell_edge_index[1]
        e_new = MLP(H, H, dropout_rate=self.cfg.dropout_rate, name="face_mlp")(
            jnp.concatenate([edge_attr, c_new[row] + c_new[col]], axis=1),
            train)
        edge_out = prev_edge + e_new
        bc = rollout_bc_mask(graph.face_type)
        edge_out = jnp.where(bc[:, None], prev_edge, edge_out)
        return cell_out, edge_out


class ConservativeI(FvgnA):
    """BC-aware blocks: boundary edge latents frozen through the processor
    (Conservative.py:1211-1319)."""
    name = "ConservativeI"

    def build_module(self):
        return _StdEPDWithBlocks(self.arch, _ConsIBlock)


# ---------------------------------------------------------------------------
# H / J / K: strict parity separation
# ---------------------------------------------------------------------------

class _ConsHBlock(nn.Module):
    """cell-first parity block (Conservative.py:1098-1184). ``asym_width``
    halves the antisymmetric branch for ConservativeK."""
    cfg: ArchConfig
    asym_width: int = 0

    @nn.compact
    def __call__(self, cell_attr, e_s, e_a, graph: MeshGraph, train):
        H = self.cfg.hidden
        Ha = self.asym_width or H
        sym2 = jnp.concatenate([e_s, e_s], axis=-1)
        cell_agg = aggregate_twice_mp(sym2, graph, self.cfg.aggregation,
                                      train)
        asym_agg = aggregate_faces_to_cells(e_a, graph, antisym=True)
        c_new = MLP(H, H, dropout_rate=self.cfg.dropout_rate, name="cell_mlp")(
            jnp.concatenate([cell_attr, cell_agg, asym_agg], axis=-1), train)
        row, col = graph.cell_edge_index[0], graph.cell_edge_index[1]
        s_new = MLP(H, H, dropout_rate=self.cfg.dropout_rate, name="face_symm")(
            jnp.concatenate([e_s, c_new[row] + c_new[col]], axis=1), train)
        a_new = AntisymMLP(H, Ha, name="face_asym")(
            jnp.concatenate([e_a, c_new[row] - c_new[col]], axis=1), train)
        return cell_attr + c_new, e_s + s_new, e_a + a_new


class _ParityDecoder(nn.Module):
    """Even head [h⁺, (h⁻)²] -> (u,v,p,|q|); odd head [h⁻, h⁺] -> sign;
    q_n = softplus(|q|)·tanh(odd) (Conservative.py:1186-1208)."""
    cfg: ArchConfig
    asym_width: int = 0

    @nn.compact
    def __call__(self, e_s, e_a, train):
        H = self.cfg.hidden
        even_feats = jnp.concatenate([e_s, e_a ** 2], axis=-1)
        odd_feats = jnp.concatenate([e_a, e_s], axis=-1)
        uvp_qmag = MLP(H, 5, layer_norm=False, name="even_mlp")(even_feats, train)
        s_odd = jnp.tanh(AntisymMLP(H, 2, name="odd_mlp")(odd_feats, train))
        uv = uvp_qmag[:, 0:2]
        p = uvp_qmag[:, 2:3]
        q_mag = jax.nn.softplus(uvp_qmag[:, 3:5])
        return jnp.concatenate([uv, p, q_mag * s_odd], axis=-1)


class _ConsHIntegrator(nn.Module):
    """FvgnA-style normalized integrator whose diffusive term is the signed
    scalar flux times the outward normal (Conservative.py:1041-1082)."""
    rho: float = 1.0

    @nn.compact
    def __call__(self, edge_output, graph: MeshGraph, train):
        from gnn_fluid_dynamics_tpu.models.arch import FaceAreaNorm
        face_area = FaceAreaNorm(name="face_area_norm")(graph, train)
        unv = graph.cell_normal
        uv = edge_output[:, :2]
        p = edge_output[:, 2:3]
        q = edge_output[:, 3:5]
        uu_vu = jnp.concatenate([uv[:, 0:1] * uv, uv[:, 1:2] * uv], axis=-1)
        g = gather3(jnp.concatenate([face_area, uu_vu, q, p], axis=1), graph)
        e, uu = g[..., 0:1], g[..., 1:5].reshape(-1, 3, 2, 2)
        qf, pf = g[..., 5:7], g[..., 7:8]
        phi_a = jnp.sum(jnp.einsum("cfkd,cfd->cfk", uu, unv) * e, axis=1)
        phi_d = jnp.sum(qf * unv * e, axis=1)
        phi_p = jnp.sum(pf * unv * e, axis=1)
        acc = -phi_a - phi_p / self.rho + phi_d
        acc = jnp.where(graph.cell_mask[:, None], acc, 0.0)
        return acc, {"norm_face_area": face_area}


class _ConsHModule(nn.Module):
    cfg: ArchConfig
    asym_width: int = 0
    learned_scale: bool = False     # ConservativeJ
    physical: bool = False          # ConservativeJ integrator

    @nn.compact
    def __call__(self, cell_x, face_xs, face_xa, graph: MeshGraph,
                 train: bool = False):
        Ha = self.asym_width or self.cfg.hidden
        e_s = MLP(self.cfg.hidden, self.cfg.hidden,
                  dropout_rate=self.cfg.dropout_rate, name="faceS_mlp")(face_xs, train)
        e_a = AntisymMLP(self.cfg.hidden, Ha, name="faceA_mlp")(face_xa, train)
        cell_attr = MLP(self.cfg.hidden, self.cfg.hidden,
                        dropout_rate=self.cfg.dropout_rate, name="cell_mlp")(cell_x, train)
        for _ in range(self.cfg.mp_num):
            cell_attr, e_s, e_a = _ConsHBlock(self.cfg, self.asym_width)(
                cell_attr, e_s, e_a, graph, train)
        face_out = _ParityDecoder(self.cfg, self.asym_width,
                                  name="decoder")(e_s, e_a, train)
        if self.learned_scale:
            # ConservativeJ (Conservative.py:1336-1343, 1496-1502)
            u = LearnedScaleDenorm(1, 1.0, name="velocity_scale_x")(face_out[:, 0:1])
            v = LearnedScaleDenorm(1, 0.01, name="velocity_scale_y")(face_out[:, 1:2])
            p = LearnedScaleDenorm(1, 1.0, name="pressure_scale")(face_out[:, 2:3])
            d = face_out[:, 3:5] * self.param(
                "diffusion_scale", nn.initializers.ones, (1,))
            face_out = jnp.concatenate([u, v, p, d], axis=-1)
        if self.physical:
            # physical q·n integrator (Conservative.py:1520-1556)
            unv = graph.cell_normal
            area = graph.face_area.reshape(-1, 1)
            uv = face_out[:, :2]
            pr = face_out[:, 2:3]
            q = face_out[:, 3:5]
            uu_vu = jnp.concatenate([uv[:, 0:1] * uv, uv[:, 1:2] * uv], axis=-1)
            g = gather3(jnp.concatenate([area, uu_vu, q, pr], axis=1), graph)
            e, uu = g[..., 0:1], g[..., 1:5].reshape(-1, 3, 2, 2)
            phi_a = jnp.sum(jnp.einsum("cfkd,cfd->cfk", uu, unv) * e, axis=1)
            phi_d = jnp.sum(g[..., 5:7] * unv * e, axis=1)
            phi_p = jnp.sum(g[..., 7:8] * unv * e, axis=1)
            coeff = jnp.mean(graph.dt) / jnp.maximum(
                graph.cell_volume.reshape(-1, 1), 1e-12)
            acc = coeff * (-phi_a - phi_p + 0.001 * phi_d)
            acc = jnp.where(graph.cell_mask[:, None], acc, 0.0)
            return acc, face_out, {}
        acc, extras = _ConsHIntegrator(name="integrator")(face_out, graph, train)
        return acc, face_out, extras


class ConservativeH(ConservativeA):
    """Strict parity separation with even/odd decoder
    (Conservative.py:899-1210)."""
    name = "ConservativeH"

    def build_module(self):
        return _ConsHModule(self.arch)

    def normalisation_map(self) -> norm.NormalizationMap:
        registry = {
            "cell_velocity_x": _z("cell_x", 0, 1),
            "cell_velocity_y": _z("cell_x", 1, 2),
            "cell_velocity_change_x": _z("cell_y", 0, 1),
            "cell_velocity_change_y": _z("cell_y", 1, 2),
            "face_area": _z("face_xs", 0, 1),
            "face_velocity_x": _z("face_y", 0, 1),
            "face_velocity_y": _z("face_y", 1, 2),
            "face_pressure": _z("face_y", 2, 3),
            # odd inputs use std_scale (zero-mean preserving)
            "face_velocity_diff_x": _ss("face_xa", 0, 1),
            "face_velocity_diff_y": _ss("face_xa", 1, 2),
            "face_edge_vector_x": _ss("face_xa", 2, 3),
            "face_edge_vector_y": _ss("face_xa", 3, 4),
        }
        inputs = (
            _f("cell_velocity_x", "cell_x", 0, 1),
            _f("cell_velocity_y", "cell_x", 1, 2),
            _f("face_velocity_diff_x", "face_xa", 0, 1),
            _f("face_velocity_diff_y", "face_xa", 1, 2),
            _f("face_area", "face_xs", 0, 1),
            _f("face_edge_vector_x", "face_xa", 2, 3),
            _f("face_edge_vector_y", "face_xa", 3, 4),
            _f("cell_velocity_change_x", "cell_y", 0, 1),
            _f("cell_velocity_change_y", "cell_y", 1, 2),
            _f("face_velocity_x", "face_y", 0, 1),
            _f("face_velocity_y", "face_y", 1, 2),
            _f("face_pressure", "face_y", 2, 3),
        )
        outputs = (
            _f("cell_velocity_change_x", "cell_out", 0, 1),
            _f("cell_velocity_change_y", "cell_out", 1, 2),
            _f("face_velocity_x", "face_out", 0, 1),
            _f("face_velocity_y", "face_out", 1, 2),
            _f("face_pressure", "face_out", 2, 3),
        )
        return norm.NormalizationMap(registry, inputs, outputs)

    # ---- features (Conservative.py:916-945): x_symm = [area | one-hot],
    # x_asym = [Δv | Δpos] --------------------------------------------------
    def transform_features(self, graph, rng, mode="train", noise_std=0.0):
        cell_velocity = graph.cell_velocity[:, 0]
        if mode == "train" and rng is not None and noise_std:
            k_noise, k_flip = jax.random.split(rng)
            cell_velocity = T.add_noise(k_noise, cell_velocity, noise_std)
        elif rng is not None:
            k_flip = rng
        cell_y = graph.cell_velocity[:, -1] - cell_velocity
        if mode == "train" and rng is not None:
            graph, _ = T.random_edge_flip(k_flip, graph)
        dv = T.calc_face_velocity_change(cell_velocity, graph.cell_edge_index)
        bc_mask = ~T.interior_face_mask(graph.face_type)
        dv = jnp.where(bc_mask[:, None], graph.face_velocity[:, 0], dv)
        ev = T.calc_cell_edge_vector(graph.cell_pos, graph.cell_edge_index)
        onehot = T.calc_face_type_one_hot(graph.face_type,
                                          self.config.num_face_types)
        face_xs = jnp.concatenate([graph.face_area, onehot], axis=1)
        face_xa = jnp.concatenate([dv, ev], axis=1)
        face_y = jnp.concatenate(
            [graph.face_velocity[:, -1], graph.face_pressure[:, -1]], axis=1)
        feats = {"cell_x": cell_velocity, "cell_y": cell_y,
                 "face_xs": face_xs, "face_xa": face_xa, "face_y": face_y,
                 "face_bc_mask": bc_mask}
        return graph, feats


class ConservativeJ(ConservativeH):
    """H + learned output scales + physical integrator; train-mode outputs
    re-normalized for the loss (Conservative.py:1320-1684)."""
    name = "ConservativeJ"

    def build_module(self):
        return _ConsHModule(self.arch, learned_scale=True, physical=True)

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (acc, face_phys, extras), updates = self._apply(
            variables, nfeats, graph, train, rngs)
        bundle = {"cell_out": acc, "face_out": face_phys}
        if mode != "rollout":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats)
        outputs = {
            "cell_velocity_change": bundle["cell_out"][:, 0:2],
            "face_velocity": bundle["face_out"][:, 0:2],
            "face_pressure": bundle["face_out"][:, 2:3],
            "_nfeats": nfeats,
        }
        return outputs, updates

    def loss(self, outputs, feats, graph):
        # continuity uses the normalized face area from x_symm
        # (Conservative.py:1445-1450)
        nfeats = outputs["_nfeats"]
        cmask, fmask = graph.cell_mask, graph.face_mask
        farea = nfeats["face_xs"][:, 0:1]
        div = fvm.divergence_from_uf(outputs["face_velocity"], graph.cell_normal,
                                     farea, graph.face_index)
        comps = {
            "continuity": mse_per_element(div, jnp.zeros_like(div), cmask),
            "cell_velocity_change": mse_per_element(
                outputs["cell_velocity_change"], nfeats["cell_y"], cmask),
            "face_velocity": mse_per_element(
                outputs["face_velocity"], nfeats["face_y"][:, :2],
                fmask & ~feats["face_bc_mask"]),
            "face_pressure": mse_per_element(
                outputs["face_pressure"], nfeats["face_y"][:, 2:3], fmask),
        }
        total = combined_log_loss(comps, self.loss_weights)
        return {"total_log_loss": total,
                **{f"{k}_loss": v for k, v in comps.items()}}


class ConservativeK(ConservativeH):
    """H with the antisymmetric branch at half width
    (Conservative.py:1685-1954)."""
    name = "ConservativeK"

    def build_module(self):
        return _ConsHModule(self.arch, asym_width=self.arch.hidden // 2)
