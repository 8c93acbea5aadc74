"""StreamFunc model family (reference ``src/models/StreamFunc.py``).

MGN-style cell decoders that predict a scalar stream function psi (+pressure);
velocity is the rotated MLS gradient of psi (perp-grad => divergence-free by
construction, ``DivergenceLayer``, StreamFunc.py:93-106).

========  ====================================================================
SFA       psi -> velocity in normalized space (StreamFunc.py:109-135)
SFB       psi denormalized first, curl, renormalize for loss (138-167)
SFC       no normalization in forward (MgnB base) (170-192)
SFD       + kNN smoothing on psi and Laplacian smoothness regularizer
          (195-287)
========  ====================================================================
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_fluid_dynamics_tpu.graph import MeshGraph
from gnn_fluid_dynamics_tpu.models import normalizer as norm
from gnn_fluid_dynamics_tpu.models.arch import ArchConfig, EncodeProcessDecode
from gnn_fluid_dynamics_tpu.models.losses import combined_log_loss, mse_per_element
from gnn_fluid_dynamics_tpu.models.mgn import MgnB, MgnC, _MgnModule
from gnn_fluid_dynamics_tpu.ops import fvm


def divergence_layer(cell_potential: jax.Array, weights: jax.Array,
                     neighbours: jax.Array) -> jax.Array:
    """velocity = rotate90(MLS grad psi) = (-dpsi/dy, +dpsi/dx)
    (reference ``DivergenceLayer``, StreamFunc.py:93-106)."""
    psi = cell_potential.reshape(-1)
    diff = psi[neighbours] - psi[:, None]
    gx = jnp.sum(weights[:, :, 0] * diff, axis=1)
    gy = jnp.sum(weights[:, :, 1] * diff, axis=1)
    return jnp.stack([-gy, gx], axis=1)


def smoothing_layer(potential: jax.Array, neighbours: jax.Array,
                    k: int = 8) -> jax.Array:
    """kNN mean smoothing of psi (reference ``SmoothingLayer``,
    StreamFunc.py:277-287)."""
    psi = potential.reshape(-1)
    return jnp.mean(psi[neighbours[:, :k]], axis=1)


class _StreamFuncRolloutMixin:
    """Rollout feedback per ``BaseStreamFunc.update_features``
    (StreamFunc.py:77-91): clamp INFLOW|WALL faces only — NOT the full
    boundary mask the Mgn base uses (Mgn.py:147). OUTFLOW faces keep the
    predicted Δv."""

    def update_features(self, solutions, feats, graph):
        from gnn_fluid_dynamics_tpu.models.transforms import (
            calc_face_velocity_change, rollout_bc_mask)
        new_feats = dict(feats)
        v = solutions["cell_velocity"]
        new_feats["cell_x"] = v
        dv = calc_face_velocity_change(v[:, :2], graph.cell_edge_index)
        mask = rollout_bc_mask(graph.face_type)
        dv = jnp.where(mask[:, None], feats["face_y"][:, 0:2], dv)
        new_feats["face_x"] = feats["face_x"].at[:, 0:2].set(dv)
        return new_feats


class StreamFuncA(_StreamFuncRolloutMixin, MgnC):
    """psi -> perp-grad velocity in normalized space (StreamFunc.py:109-135)."""

    name = "StreamFuncA"
    cell_grad_weights_use = True

    def build_module(self):
        return _MgnModule(self.arch, out_size=2)   # [psi, p]

    def _curl(self, cell_out, graph):
        v = divergence_layer(cell_out[:, 0], graph.cell_grad_weights,
                             graph.cell_grad_neighbours)
        v = jnp.where(graph.cell_mask[:, None], v, 0.0)
        return jnp.concatenate([v, cell_out[:, 1:2]], axis=1)

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (cell_out, _, _), updates = self._apply(variables, nfeats, graph,
                                                train, rngs)
        bundle = {"cell_out": self._curl(cell_out, graph)}
        if mode == "rollout":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats,
                                            inverse=True)
        outputs = {
            "cell_velocity": bundle["cell_out"][:, 0:2],
            "cell_pressure": bundle["cell_out"][:, 2:3],
            "_nfeats": nfeats,
        }
        return outputs, updates

    def loss(self, outputs, feats, graph):
        """(StreamFunc.py:45-75): continuity reported but unweighted."""
        nfeats = outputs["_nfeats"]
        cmask = graph.cell_mask
        div = fvm.divergence_from_uc(outputs["cell_velocity"],
                                     graph.cell_grad_weights,
                                     graph.cell_grad_neighbours,
                                     graph.cell_volume)
        div = jnp.where(cmask[:, None], div, 0.0)
        continuity = mse_per_element(div, jnp.zeros_like(div), cmask)
        comps = {
            "cell_velocity": mse_per_element(
                outputs["cell_velocity"], nfeats["cell_y"][:, 0:2], cmask),
            "cell_pressure": mse_per_element(
                outputs["cell_pressure"], nfeats["cell_y"][:, 2:3], cmask),
        }
        total = combined_log_loss(comps, self.loss_weights)
        return {"total_log_loss": total, "continuity_loss": continuity,
                **{f"{k}_loss": v for k, v in comps.items()}}


class StreamFuncB(StreamFuncA):
    """psi denormalized before the curl; outputs renormalized for training
    (StreamFunc.py:138-167)."""

    name = "StreamFuncB"

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (cell_out, _, _), updates = self._apply(variables, nfeats, graph,
                                                train, rngs)
        # expand [psi, p] -> [psi, 0, p], denormalize (psi rides the
        # velocity-x stats — a preserved reference quirk), then curl
        expanded = jnp.concatenate(
            [cell_out[:, 0:1], jnp.zeros_like(cell_out[:, 0:1]),
             cell_out[:, 1:2]], axis=1)
        phys = norm.normalize_outputs({"cell_out": expanded}, self.nmap,
                                      self.stats, inverse=True)["cell_out"]
        v = divergence_layer(phys[:, 0], graph.cell_grad_weights,
                             graph.cell_grad_neighbours)
        v = jnp.where(graph.cell_mask[:, None], v, 0.0)
        phys = phys.at[:, 0:2].set(v)
        bundle = {"cell_out": phys}
        if mode == "train":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats)
        outputs = {
            "cell_velocity": bundle["cell_out"][:, 0:2],
            "cell_pressure": bundle["cell_out"][:, 2:3],
            "_nfeats": nfeats,
        }
        return outputs, updates


class StreamFuncC(_StreamFuncRolloutMixin, MgnB):
    """No normalization in the forward pass (StreamFunc.py:170-192)."""

    name = "StreamFuncC"
    cell_grad_weights_use = True

    def build_module(self):
        return _MgnModule(self.arch, out_size=2)

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        (cell_out, _, _), updates = self._apply(variables, feats, graph,
                                                train, rngs)
        v = divergence_layer(cell_out[:, 0], graph.cell_grad_weights,
                             graph.cell_grad_neighbours)
        v = jnp.where(graph.cell_mask[:, None], v, 0.0)
        outputs = {
            "cell_velocity": v,
            "cell_pressure": cell_out[:, 1:2],
            "_nfeats": feats,     # unnormalized: loss runs in physical space
        }
        return outputs, updates

    loss = StreamFuncA.loss


class StreamFuncD(StreamFuncB):
    """+ kNN psi smoothing and Laplacian smoothness regularizer
    (StreamFunc.py:195-287)."""

    name = "StreamFuncD"

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (cell_out, _, _), updates = self._apply(variables, nfeats, graph,
                                                train, rngs)
        raw_potential = cell_out[:, 0:1]
        smoothed = smoothing_layer(raw_potential, graph.cell_grad_neighbours,
                                   k=8)[:, None]
        expanded = jnp.concatenate(
            [smoothed, jnp.zeros_like(smoothed), cell_out[:, 1:2]], axis=1)
        phys = norm.normalize_outputs({"cell_out": expanded}, self.nmap,
                                      self.stats, inverse=True)["cell_out"]
        v = divergence_layer(phys[:, 0], graph.cell_grad_weights,
                             graph.cell_grad_neighbours)
        v = jnp.where(graph.cell_mask[:, None], v, 0.0)
        phys = phys.at[:, 0:2].set(v)
        bundle = {"cell_out": phys}
        if mode == "train":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats)
        outputs = {
            "cell_velocity": bundle["cell_out"][:, 0:2],
            "cell_pressure": bundle["cell_out"][:, 2:3],
            "cell_potential": raw_potential,
            "_nfeats": nfeats,
        }
        return outputs, updates

    def loss(self, outputs, feats, graph):
        """Base loss + psi Laplacian smoothness (StreamFunc.py:237-275)."""
        losses = StreamFuncA.loss(self, outputs, feats, graph)
        psi = outputs["cell_potential"].reshape(-1)
        nb = graph.cell_grad_neighbours[:, :4]
        lap = jnp.mean(psi[nb], axis=1) - psi
        lap = jnp.where(graph.cell_mask, lap, 0.0)
        n = jnp.maximum(jnp.sum(graph.cell_mask), 1)
        smooth = jnp.sum(lap ** 2) / n
        w = self.loss_weights
        total = (w.get("cell_velocity", 0.0) * losses["cell_velocity_loss"]
                 + w.get("cell_pressure", 0.0) * losses["cell_pressure_loss"]
                 + 0.1 * smooth)
        losses["total_log_loss"] = jnp.mean(jnp.log(total))
        losses["potential_smoothness_loss"] = smooth
        return losses
