"""MGN model family (reference ``src/models/Mgn.py``).

MeshGraphNets-style: cell decoder predicts state directly, no integrator.
Block order is face-first (Mgn.py:216-226), unlike FVGN.

========  ====================================================================
MgnA      predicts [Δu, Δv, p] on cells; losses on Δv & p (Mgn.py:40-275)
MgnB      direct velocity prediction + MLS divergence (continuity) loss
          (Mgn.py:278-391); needs cell grad weights
MgnC      physics-based normalization: velocity scaled by characteristic
          |v| mean-scale (Mgn.py:394-424)
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
from gnn_fluid_dynamics_tpu.models.arch import ArchConfig, EncodeProcessDecode
from gnn_fluid_dynamics_tpu.models.base import FluidModel
from gnn_fluid_dynamics_tpu.models.fvgn import _f, _z
from gnn_fluid_dynamics_tpu.models.losses import combined_log_loss, mse_per_element
from gnn_fluid_dynamics_tpu.ops import fvm


class _MgnModule(nn.Module):
    cfg: ArchConfig
    out_size: int = 3

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False):
        cell_out, _ = EncodeProcessDecode(self.cfg, cell_out=self.out_size)(
            cell_x, face_x, graph, train)
        return cell_out, None, {}


class MgnA(FluidModel):
    """MGN predicting [Δu, Δv, p] on cells (Mgn.py:40-275)."""

    name = "MgnA"
    cell_grad_weights_use = True  # for rollout divergence metric (Mgn.py:46)

    def block_order(self):
        return "face_first"

    def build_module(self):
        return _MgnModule(self.arch, out_size=3)

    def normalisation_map(self) -> norm.NormalizationMap:
        registry = {
            "cell_velocity_x": _z("cell_x", 0, 1),
            "cell_velocity_y": _z("cell_x", 1, 2),
            "cell_velocity_change_x": _z("cell_y", 0, 1),
            "cell_velocity_change_y": _z("cell_y", 1, 2),
            "cell_pressure": _z("cell_y", 2, 3),
            "face_velocity_difference_x": _z("face_x", 0, 1),
            "face_velocity_difference_y": _z("face_x", 1, 2),
            "face_edge_vector_x": _z("face_x", 2, 3),
            "face_edge_vector_y": _z("face_x", 3, 4),
            "face_area": _z("face_x", 4, 5),
        }
        inputs = (
            _f("cell_velocity_x", "cell_x", 0, 1),
            _f("cell_velocity_y", "cell_x", 1, 2),
            _f("face_velocity_difference_x", "face_x", 0, 1),
            _f("face_velocity_difference_y", "face_x", 1, 2),
            _f("face_edge_vector_x", "face_x", 2, 3),
            _f("face_edge_vector_y", "face_x", 3, 4),
            _f("face_area", "face_x", 4, 5),
            _f("cell_velocity_change_x", "cell_y", 0, 1),
            _f("cell_velocity_change_y", "cell_y", 1, 2),
            _f("cell_pressure", "cell_y", 2, 3),
            # BC face velocities normalized with *cell* velocity stats
            # (Mgn.py:126-127)
            _f("face_velocity_x", "face_y", 0, 1, "cell_velocity_x"),
            _f("face_velocity_y", "face_y", 1, 2, "cell_velocity_y"),
        )
        outputs = (
            _f("cell_velocity_change_x", "cell_out", 0, 1),
            _f("cell_velocity_change_y", "cell_out", 1, 2),
            _f("cell_pressure", "cell_out", 2, 3),
        )
        return norm.NormalizationMap(registry, inputs, outputs)

    # ---- features (Mgn.py:64-95) -------------------------------------------
    def transform_features(self, graph, rng, mode="train", noise_std=0.0):
        cell_velocity = graph.cell_velocity[:, 0]
        if mode == "train" and rng is not None and noise_std:
            k_noise, k_flip = jax.random.split(rng)
            cell_velocity = T.add_noise(k_noise, cell_velocity, noise_std)
        elif rng is not None:
            k_flip = rng
        cell_y = jnp.concatenate(
            [graph.cell_velocity[:, -1] - cell_velocity,
             graph.cell_pressure[:, -1]], axis=1)

        if mode == "train" and rng is not None:
            graph, _ = T.random_edge_flip(k_flip, graph)

        face_x, bc_mask = T.standard_face_features(
            graph, cell_velocity, self.config.num_face_types,
            bc_velocity=graph.face_velocity[:, 0])
        face_y = graph.face_velocity[:, -1]   # BC targets (Mgn.py:90)
        feats = {"cell_x": cell_velocity, "cell_y": cell_y,
                 "face_x": face_x, "face_y": face_y, "face_bc_mask": bc_mask}
        return graph, feats

    # ---- forward (Mgn.py:153-173) ------------------------------------------
    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (cell_out, _, _), updates = self._apply(variables, nfeats, graph,
                                                train, rngs)
        bundle = {"cell_out": cell_out}
        if mode == "rollout":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats,
                                            inverse=True)
        outputs = {
            "cell_velocity_change": bundle["cell_out"][:, 0:2],
            "cell_pressure": bundle["cell_out"][:, 2:3],
            "_nfeats": nfeats,
        }
        return outputs, updates

    # ---- loss (Mgn.py:175-197) ---------------------------------------------
    def loss(self, outputs, feats, graph):
        nfeats = outputs["_nfeats"]
        cmask = graph.cell_mask
        comps = {
            "cell_velocity_change": mse_per_element(
                outputs["cell_velocity_change"], nfeats["cell_y"][:, 0:2], cmask),
            "cell_pressure": mse_per_element(
                outputs["cell_pressure"], nfeats["cell_y"][:, 2:3], cmask),
        }
        total = combined_log_loss(comps, self.loss_weights)
        return {"total_log_loss": total,
                **{f"{k}_loss": v for k, v in comps.items()}}

    # ---- rollout feedback (Mgn.py:139-151): clamp INFLOW faces only --------
    def update_features(self, solutions, feats, graph):
        new_feats = dict(feats)
        v = solutions["cell_velocity"]
        new_feats["cell_x"] = v
        dv = T.calc_face_velocity_change(v[:, :2], graph.cell_edge_index)
        mask = feats["face_bc_mask"]
        dv = jnp.where(mask[:, None], feats["face_y"][:, 0:2], dv)
        new_feats["face_x"] = feats["face_x"].at[:, 0:2].set(dv)
        return new_feats


class MgnB(MgnA):
    """Direct velocity prediction + continuity (MLS divergence) loss
    (Mgn.py:278-391)."""

    name = "MgnB"

    def normalisation_map(self) -> norm.NormalizationMap:
        nmap = super().normalisation_map()
        inputs = tuple(f for f in nmap.inputs
                       if f.name not in ("cell_velocity_change_x",
                                         "cell_velocity_change_y")) + (
            _f("cell_velocity_target_x", "cell_y", 0, 1, "cell_velocity_x"),
            _f("cell_velocity_target_y", "cell_y", 1, 2, "cell_velocity_y"),
        )
        outputs = tuple(f for f in nmap.outputs
                        if f.name not in ("cell_velocity_change_x",
                                          "cell_velocity_change_y")) + (
            _f("cell_velocity_x", "cell_out", 0, 1),
            _f("cell_velocity_y", "cell_out", 1, 2),
        )
        return nmap.replace(inputs=inputs, outputs=outputs)

    def transform_features(self, graph, rng, mode="train", noise_std=0.0):
        # direct target: [v_target, p_target] (Mgn.py:287-316)
        graph, feats = super().transform_features(graph, rng, mode, noise_std)
        cell_y = jnp.concatenate(
            [graph.cell_velocity[:, -1], graph.cell_pressure[:, -1]], axis=1)
        feats["cell_y"] = cell_y
        return graph, feats

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        outputs, updates = super().forward(variables, graph, feats, mode, rngs)
        outputs["cell_velocity"] = outputs.pop("cell_velocity_change")
        return outputs, updates

    def loss(self, outputs, feats, graph):
        nfeats = outputs["_nfeats"]
        cmask = graph.cell_mask
        div = fvm.divergence_from_uc(outputs["cell_velocity"],
                                     graph.cell_grad_weights,
                                     graph.cell_grad_neighbours,
                                     graph.cell_volume)
        div = jnp.where(cmask[:, None], div, 0.0)
        comps = {
            "continuity": mse_per_element(div, jnp.zeros_like(div), cmask),
            "cell_velocity": mse_per_element(
                outputs["cell_velocity"], nfeats["cell_y"][:, 0:2], cmask),
            "cell_pressure": mse_per_element(
                outputs["cell_pressure"], nfeats["cell_y"][:, 2:3], cmask),
        }
        total = combined_log_loss(comps, self.loss_weights)
        return {"total_log_loss": total,
                **{f"{k}_loss": v for k, v in comps.items()}}


class MgnC(MgnB):
    """Physics-based normalization: velocity fields scaled by the dataset's
    characteristic |v| via mean-scale (Mgn.py:394-424)."""

    name = "MgnC"

    def normalisation_map(self) -> norm.NormalizationMap:
        nmap = super().normalisation_map()
        registry = dict(nmap.registry)
        registry["cell_velocity_char"] = norm.StatSpec(
            "mean_scale", ("norm", "cell_x", 0, 2))

        def retarget(fields):
            out = []
            for f in fields:
                if f.name in ("cell_velocity_x", "cell_velocity_y",
                              "cell_velocity_target_x", "cell_velocity_target_y"):
                    f = norm.Field(f.name, f.tensor, f.start, f.stop,
                                   "cell_velocity_char")
                out.append(f)
            return tuple(out)

        return norm.NormalizationMap(registry, retarget(nmap.inputs),
                                     retarget(nmap.outputs))
