"""FVGN model family (reference ``src/models/Fvgn.py``).

Canonical FVGN (FvgnA) plus variants, expressed as composition flags over the
shared :mod:`arch` stack instead of 12 subclasses:

========  ====================================================================
variant   distinctive behavior (reference location)
========  ====================================================================
FvgnA     normalized-space integrator + 4-term log loss (Fvgn.py:31-333)
FvgnB     physical integrator, MLS viscous term (Fvgn.py:336-460)
FvgnC     temporal bundling: k-step decoder outputs (Fvgn.py:463-786)
FvgnD     pushforward training flag (Fvgn.py:789-836)
FvgnE     characteristic-scale (dimensional) normalization (Fvgn.py:839-880)
FvgnF     weight-shared processor + step scalar (Fvgn.py:883-1010)
FvgnH     augmented face features (Fvgn.py:1013-1114)
FvgnI     rollout BC clamp on INFLOW+WALL only (Fvgn.py:1117-1137)
FvgnJ     learned output scale/bias denormalization (Fvgn.py:1140-1273)
FvgnK     per-graph dimensionless scaling (Fvgn.py:1276-1416)
========  ====================================================================
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_fluid_dynamics_tpu.graph import MeshGraph
from gnn_fluid_dynamics_tpu.models import normalizer as norm
from gnn_fluid_dynamics_tpu.models import transforms as T
from gnn_fluid_dynamics_tpu.models.arch import (ArchConfig, EncodeProcessDecode,
                                                FvgnIntegrator,
                                                LearnedScaleDenorm,
                                                PhysicalIntegrator)
from gnn_fluid_dynamics_tpu.models.base import FluidModel, ModelConfig
from gnn_fluid_dynamics_tpu.models.losses import combined_log_loss, mse_per_element
from gnn_fluid_dynamics_tpu.ops import fvm


def _z(tensor, s, e):
    return norm.StatSpec("z_score", (tensor, s, e))


def _f(name, tensor, s, e, stat_key=None):
    return norm.Field(name, tensor, s, e, stat_key or name)


class _FvgnAModule(nn.Module):
    """EPD + normalized integrator. Returns (acc, face_out, extras)."""
    cfg: ArchConfig
    out_size: int = 5

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False):
        _, face_out = EncodeProcessDecode(self.cfg, face_out=self.out_size)(
            cell_x, face_x, graph, train)
        acc, extras = FvgnIntegrator(name="integrator")(face_out, graph, train)
        return acc, face_out, extras


class FvgnA(FluidModel):
    """Canonical FVGN: decoder predicts [u_f, v_f, p_f, D_x, D_y] per face;
    integrator turns them into cell acceleration (Fvgn.py:31-333)."""

    name = "FvgnA"
    face_out_size = 5

    def build_module(self):
        return _FvgnAModule(self.arch, out_size=self.face_out_size)

    def normalisation_map(self) -> norm.NormalizationMap:
        registry = {
            "cell_velocity_x": _z("cell_x", 0, 1),
            "cell_velocity_y": _z("cell_x", 1, 2),
            "cell_velocity_change_x": _z("cell_y", 0, 1),
            "cell_velocity_change_y": _z("cell_y", 1, 2),
            "face_velocity_difference_x": _z("face_x", 0, 1),
            "face_velocity_difference_y": _z("face_x", 1, 2),
            "face_edge_vector_x": _z("face_x", 2, 3),
            "face_edge_vector_y": _z("face_x", 3, 4),
            "face_area": _z("face_x", 4, 5),
            "face_velocity_x": _z("face_y", 0, 1),
            "face_velocity_y": _z("face_y", 1, 2),
            "face_pressure": _z("face_y", 2, 3),
        }
        inputs = tuple(_f(k, *registry[k].extractor) for k in registry)
        outputs = (
            _f("cell_velocity_change_x", "cell_out", 0, 1),
            _f("cell_velocity_change_y", "cell_out", 1, 2),
            _f("face_velocity_x", "face_out", 0, 1),
            _f("face_velocity_y", "face_out", 1, 2),
            _f("face_pressure", "face_out", 2, 3),
        )
        return norm.NormalizationMap(registry, inputs, outputs)

    # ---- features (Fvgn.py:101-131) ----------------------------------------
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

        face_x, bc_mask = T.standard_face_features(
            graph, cell_velocity, self.config.num_face_types,
            bc_velocity=graph.face_velocity[:, 0])
        face_y = jnp.concatenate(
            [graph.face_velocity[:, -1], graph.face_pressure[:, -1]], axis=1)
        feats = {"cell_x": cell_velocity, "cell_y": cell_y,
                 "face_x": face_x, "face_y": face_y, "face_bc_mask": bc_mask}
        return graph, feats

    # ---- forward (Fvgn.py:150-174) -----------------------------------------
    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (acc, face_out, extras), updates = self._apply(
            variables, nfeats, graph, train, rngs)
        bundle = {"cell_out": acc, "face_out": face_out}
        if mode == "rollout":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats,
                                            inverse=True)
        outputs = {
            "cell_velocity_change": bundle["cell_out"][:, 0:2],
            "face_velocity": bundle["face_out"][:, 0:2],
            "face_pressure": bundle["face_out"][:, 2:3],
            "_nfeats": nfeats,
            **{f"_{k}": v for k, v in extras.items()},
        }
        return outputs, updates

    # ---- loss (Fvgn.py:176-212) --------------------------------------------
    def loss(self, outputs, feats, graph):
        nfeats = outputs["_nfeats"]
        cmask, fmask = graph.cell_mask, graph.face_mask
        div = fvm.divergence_from_uf(outputs["face_velocity"], graph.cell_normal,
                                     outputs["_norm_face_area"], graph.face_index)
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


class _FvgnBModule(nn.Module):
    """EPD -> denormalize -> physical integrator (Fvgn.py:360-385)."""
    cfg: ArchConfig
    nmap: norm.NormalizationMap
    stats: Dict
    out_size: int = 3

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False):
        _, face_out = EncodeProcessDecode(self.cfg, face_out=self.out_size)(
            cell_x, face_x, graph, train)
        phys = norm.normalize_outputs({"face_out": face_out, "cell_out": None},
                                      self.nmap, self.stats, inverse=True)
        acc, extras = PhysicalIntegrator(name="integrator")(
            phys["face_out"], graph, train)
        return acc, phys["face_out"], extras


class FvgnB(FvgnA):
    """Real-space integration: physical dt/V, nu=1e-3 viscous term from MLS
    face velocity gradients; decoder predicts only [u_f, v_f, p_f]
    (Fvgn.py:336-460). Train-mode outputs are re-normalized for the loss."""

    name = "FvgnB"
    face_out_size = 3
    face_grad_weights_use = True

    def build_module(self):
        return _FvgnBModule(self.arch, self.nmap, self.stats,
                            out_size=self.face_out_size)

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (acc, face_phys, extras), updates = self._apply(
            variables, nfeats, graph, train, rngs)
        bundle = {"cell_out": acc, "face_out": face_phys}
        if mode == "train":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats)
        outputs = {
            "cell_velocity_change": bundle["cell_out"][:, 0:2],
            "face_velocity": bundle["face_out"][:, 0:2],
            "face_pressure": bundle["face_out"][:, 2:3],
            "_nfeats": nfeats,
        }
        return outputs, updates

    def loss(self, outputs, feats, graph):
        nfeats = outputs["_nfeats"]
        cmask, fmask = graph.cell_mask, graph.face_mask
        # normalized face_area comes straight from the (normalized) features
        # (Fvgn.py:391)
        farea = nfeats["face_x"][:, 4:5]
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


class FvgnD(FvgnA):
    """Pushforward trick: trainer unrolls no-grad steps before the supervised
    step (Fvgn.py:789-836 + train.py:247-252). Model math == FvgnA; the
    dataset window carries the extra steps."""
    name = "FvgnD"
    pushforward_use = True


class FvgnF(FvgnA):
    """Weight-shared single GN block applied mp_num times with a normalized
    step scalar appended to both block inputs (Fvgn.py:883-1010)."""
    name = "FvgnF"

    def share_blocks(self):
        return True

    def step_scalar(self):
        return True


class FvgnI(FvgnA):
    """Rollout BC variant: identical training; update_features clamps only
    INFLOW+WALL faces (Fvgn.py:1117-1137) — which is also the base behavior
    here, so the class is nominal for registry parity."""
    name = "FvgnI"


class _FvgnJModule(nn.Module):
    """EPD -> learned scale/bias denorm -> normalized integrator
    (Fvgn.py:1140-1273)."""
    cfg: ArchConfig
    out_size: int = 5

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False):
        _, raw = EncodeProcessDecode(self.cfg, face_out=self.out_size)(
            cell_x, face_x, graph, train)
        # per-channel learned scales replacing output z-score (Fvgn.py:1149-1157)
        uv = LearnedScaleDenorm(2, init_scale=0.1, name="velocity_scale")(raw[:, 0:2])
        p = LearnedScaleDenorm(1, init_scale=0.01, name="pressure_scale")(raw[:, 2:3])
        d = LearnedScaleDenorm(2, init_scale=0.01, name="diffusion_scale")(raw[:, 3:5])
        face_out = jnp.concatenate([uv, p, d], axis=-1)
        acc, extras = FvgnIntegrator(name="integrator")(face_out, graph, train)
        return acc, face_out, extras


class FvgnJ(FvgnA):
    """Learned per-channel output scale/bias instead of output z-score
    (Fvgn.py:1140-1273): outputs are physical; train-mode loss re-normalizes."""
    name = "FvgnJ"

    def build_module(self):
        return _FvgnJModule(self.arch, out_size=self.face_out_size)

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (acc, face_phys, extras), updates = self._apply(
            variables, nfeats, graph, train, rngs)
        bundle = {"cell_out": acc, "face_out": face_phys}
        if mode == "train":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats)
        outputs = {
            "cell_velocity_change": bundle["cell_out"][:, 0:2],
            "face_velocity": bundle["face_out"][:, 0:2],
            "face_pressure": bundle["face_out"][:, 2:3],
            "_nfeats": nfeats,
            **{f"_{k}": v for k, v in extras.items()},
        }
        return outputs, updates
