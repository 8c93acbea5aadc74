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
        if self.pushforward_use and graph.cell_velocity.shape[1] > 2:
            # pushforward window: the supervised target is rebuilt after the
            # no-grad unroll (trainer.pushforward_retarget); here cell_y only
            # feeds the Delta-v statistics, which the reference pins to the
            # LAST single step of the window (FvgnD.get_normalisation_map,
            # Fvgn.py:833-835), not the whole-window change
            cell_y = (graph.cell_velocity[:, -1]
                      - graph.cell_velocity[:, -2])
        else:
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


class _FvgnCModule(nn.Module):
    """EPD with a k-step decoder + per-step integrator loop whose outputs are
    scaled by (k+1) — a preserved reference quirk (Fvgn.py:655-703)."""
    cfg: ArchConfig
    bundle: int = 2

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False):
        from gnn_fluid_dynamics_tpu.models.arch import FaceAreaNorm
        _, flat = EncodeProcessDecode(self.cfg, face_out=5 * self.bundle)(
            cell_x, face_x, graph, train)
        face_out = flat.reshape(flat.shape[0], self.bundle, 5)
        face_area = FaceAreaNorm(name="face_area_norm")(graph, train)
        e = face_area.reshape(-1)[graph.face_index.T][..., None]    # (C,3,1)
        unv = graph.cell_normal
        accs = []
        for t in range(self.bundle):
            uv = face_out[:, t, :2]
            p = face_out[:, t, 2:3]
            d = face_out[:, t, 3:]
            uu_vu = jnp.concatenate([uv[:, 0:1] * uv, uv[:, 1:2] * uv], axis=-1)
            uu = uu_vu[graph.face_index.T].reshape(-1, 3, 2, 2)
            phi_a = jnp.sum(jnp.einsum("cfkd,cfd->cfk", uu, unv) * e, axis=1)
            phi_d = jnp.sum(d[graph.face_index.T], axis=1)
            pf = p[graph.face_index.T]
            phi_p = jnp.sum(pf * unv * e, axis=1)
            acc = (-phi_a - phi_p + phi_d) * (self.bundle + 1)
            accs.append(jnp.where(graph.cell_mask[:, None], acc, 0.0))
        return jnp.stack(accs, axis=1), face_out, {"norm_face_area": face_area}


class FvgnC(FvgnA):
    """Temporal bundling: the decoder emits k = bundle_size steps at once
    (Fvgn.py:463-786); per-step losses are averaged, windowed targets have a
    bundle axis."""

    name = "FvgnC"

    @property
    def bundle(self):
        return self.config.bundle_size or 2

    def build_module(self):
        return _FvgnCModule(self.arch, bundle=self.bundle)

    def normalisation_map(self) -> norm.NormalizationMap:
        nmap = super().normalisation_map()
        registry = dict(nmap.registry)
        # stats for bundled targets use the first step only (Fvgn.py:521-523)
        for key, (tensor, s, e) in (("face_velocity_x", ("face_y", 0, 1)),
                                    ("face_velocity_y", ("face_y", 1, 2)),
                                    ("face_pressure", ("face_y", 2, 3))):
            registry[key] = norm.StatSpec("z_score", ("slice0", tensor, s, e))
        return nmap.replace(registry=registry)

    def transform_features(self, graph, rng, mode="train", noise_std=0.0):
        cell_velocity = graph.cell_velocity[:, 0]
        if mode == "train" and rng is not None and noise_std:
            k_noise, k_flip = jax.random.split(rng)
            cell_velocity = T.add_noise(k_noise, cell_velocity, noise_std)
        elif rng is not None:
            k_flip = rng
        # bundled targets: (C, k, 2) deltas vs step 0 (Fvgn.py:483-484)
        cell_y = graph.cell_velocity[:, 1:] - cell_velocity[:, None, :]
        if mode == "train" and rng is not None:
            graph, _ = T.random_edge_flip(k_flip, graph)
        face_x, bc_mask = T.standard_face_features(
            graph, cell_velocity, self.config.num_face_types,
            bc_velocity=graph.face_velocity[:, 0])
        face_y = jnp.concatenate(
            [graph.face_velocity[:, 1:], graph.face_pressure[:, 1:]], axis=2)
        feats = {"cell_x": cell_velocity, "cell_y": cell_y,
                 "face_x": face_x, "face_y": face_y, "face_bc_mask": bc_mask}
        return graph, feats

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
            "cell_velocity_change": bundle["cell_out"][:, :, 0:2],
            "face_velocity": bundle["face_out"][:, :, 0:2],
            "face_pressure": bundle["face_out"][:, :, 2:3],
            "_nfeats": nfeats,
            **{f"_{k}": v for k, v in extras.items()},
        }
        return outputs, updates

    def loss(self, outputs, feats, graph):
        """Per-bundle-step losses averaged (Fvgn.py:598-653)."""
        nfeats = outputs["_nfeats"]
        cmask, fmask = graph.cell_mask, graph.face_mask
        totals, comps_acc = [], {}
        for t in range(self.bundle):
            div = fvm.divergence_from_uf(
                outputs["face_velocity"][:, t], graph.cell_normal,
                outputs["_norm_face_area"], graph.face_index)
            comps = {
                "continuity": mse_per_element(div, jnp.zeros_like(div), cmask),
                "cell_velocity_change": mse_per_element(
                    outputs["cell_velocity_change"][:, t],
                    nfeats["cell_y"][:, t], cmask),
                "face_velocity": mse_per_element(
                    outputs["face_velocity"][:, t],
                    nfeats["face_y"][:, t, :2],
                    fmask & ~feats["face_bc_mask"]),
                "face_pressure": mse_per_element(
                    outputs["face_pressure"][:, t],
                    nfeats["face_y"][:, t, 2:3], fmask),
            }
            total = None
            for name, value in comps.items():
                w = self.loss_weights.get(name)
                if w is None:
                    continue
                total = w * value if total is None else total + w * value
                comps_acc.setdefault(name, []).append(value)
            totals.append(total)
        loss = jnp.mean(jnp.log(jnp.mean(jnp.stack(totals))))
        return {"total_log_loss": loss,
                **{f"{k}_loss": jnp.mean(jnp.stack(v))
                   for k, v in comps_acc.items()}}

    def update_features(self, solutions, feats, graph):
        """BC clamp uses the LAST bundled step's targets (Fvgn.py:566)."""
        from gnn_fluid_dynamics_tpu.models.transforms import (
            calc_face_velocity_change, rollout_bc_mask)
        new_feats = dict(feats)
        v = solutions["cell_velocity"]
        new_feats["cell_x"] = v
        dv = calc_face_velocity_change(v[:, :2], graph.cell_edge_index)
        mask = rollout_bc_mask(graph.face_type)
        dv = jnp.where(mask[:, None], feats["face_y"][:, -1, 0:2], dv)
        new_feats["face_x"] = feats["face_x"].at[:, 0:2].set(dv)
        return new_feats


class FvgnD(FvgnA):
    """Pushforward trick: trainer unrolls no-grad steps before the supervised
    step (Fvgn.py:789-836 + train.py:247-252). Model math == FvgnA; the
    dataset window carries the extra steps."""
    name = "FvgnD"
    pushforward_use = True


class FvgnE(FvgnA):
    """Fully physical normalization: characteristic velocity (max |u|),
    length (mean sqrt V), and derived pressure = v_max^2/2 (Fvgn.py:839-880;
    derived stat: normalisation.py:183-197)."""

    name = "FvgnE"

    def normalisation_map(self) -> norm.NormalizationMap:
        registry = {
            "characteristic_velocity": norm.StatSpec(
                "max_scale", ("norm", "cell_x", 0, 2)),
            "characteristic_length": norm.StatSpec(
                "mean_scale", ("sqrt", "cell_volume", 0, 1)),
            "characteristic_pressure": norm.StatSpec("max_scale", None),
        }
        cv, cl, cp = ("characteristic_velocity", "characteristic_length",
                      "characteristic_pressure")
        inputs = (
            _f("cell_velocity_x", "cell_x", 0, 1, cv),
            _f("cell_velocity_y", "cell_x", 1, 2, cv),
            _f("cell_velocity_change_x", "cell_y", 0, 1, cv),
            _f("cell_velocity_change_y", "cell_y", 1, 2, cv),
            _f("face_velocity_difference_x", "face_x", 0, 1, cv),
            _f("face_velocity_difference_y", "face_x", 1, 2, cv),
            _f("face_edge_vector_x", "face_x", 2, 3, cl),
            _f("face_edge_vector_y", "face_x", 3, 4, cl),
            _f("face_area", "face_x", 4, 5, cl),
            _f("face_velocity_x", "face_y", 0, 1, cv),
            _f("face_velocity_y", "face_y", 1, 2, cv),
            _f("face_pressure", "face_y", 2, 3, cp),
        )
        outputs = (
            _f("cell_velocity_change_x", "cell_out", 0, 1, cv),
            _f("cell_velocity_change_y", "cell_out", 1, 2, cv),
            _f("face_velocity_x", "face_out", 0, 1, cv),
            _f("face_velocity_y", "face_out", 1, 2, cv),
            _f("face_pressure", "face_out", 2, 3, cp),
        )
        return norm.NormalizationMap(registry, inputs, outputs)

    def transform_features(self, graph, rng, mode="train", noise_std=0.0):
        graph, feats = super().transform_features(graph, rng, mode, noise_std)
        # expose volume for the characteristic-length statistic
        feats["cell_volume"] = graph.cell_volume
        return graph, feats


class FvgnH(FvgnA):
    """Augmented face features: [Δv | n̂ | area | adjacent-cell distance |
    normal/edge-vector angle | one-hot] (Fvgn.py:1013-1114)."""

    name = "FvgnH"

    def normalisation_map(self) -> norm.NormalizationMap:
        registry = {
            "cell_velocity_x": _z("cell_x", 0, 1),
            "cell_velocity_y": _z("cell_x", 1, 2),
            "cell_velocity_change_x": _z("cell_y", 0, 1),
            "cell_velocity_change_y": _z("cell_y", 1, 2),
            "face_velocity_difference_x": _z("face_x", 0, 1),
            "face_velocity_difference_y": _z("face_x", 1, 2),
            "face_normal_x": _z("face_x", 2, 3),
            "face_normal_y": _z("face_x", 3, 4),
            "face_area": _z("face_x", 4, 5),
            "face_adjacent_distance": _z("face_x", 5, 6),
            "face_angle": _z("face_x", 6, 7),
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
        dist = jnp.linalg.norm(ev, axis=1, keepdims=True)
        small = dist < 1e-8
        ev_n = ev / (dist + 1e-8)
        dot = jnp.clip(jnp.sum(ev_n * graph.face_normal, axis=1,
                               keepdims=True), -1.0, 1.0)
        angle = jnp.where(small, 0.0, jnp.arccos(jnp.abs(dot)))
        face_x = jnp.concatenate([dv, graph.face_normal, graph.face_area,
                                  dist, angle, onehot], axis=1)
        face_y = jnp.concatenate(
            [graph.face_velocity[:, -1], graph.face_pressure[:, -1]], axis=1)
        feats = {"cell_x": cell_velocity, "cell_y": cell_y,
                 "face_x": face_x, "face_y": face_y, "face_bc_mask": bc_mask}
        return graph, feats


class _FvgnKModule(nn.Module):
    """EPD -> per-graph dimensionless rescale -> physical integrator
    (Fvgn.py:1290-1416). ``u_ref``/``l_ref`` enter as per-face arrays."""
    cfg: ArchConfig

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False,
                 u_ref=None, l_ref=None):
        _, raw = EncodeProcessDecode(self.cfg, face_out=5)(
            cell_x, face_x, graph, train)
        anis = self.param("anisotropy_ratio",
                          nn.initializers.constant(0.0001), ())
        if u_ref is None:       # shape-only init path
            u_ref = jnp.ones((raw.shape[0], 1), raw.dtype)
            l_ref = jnp.ones((raw.shape[0], 1), raw.dtype)
        p_ref = u_ref ** 2
        d_ref = u_ref * l_ref
        face_out = jnp.concatenate([
            raw[:, 0:1] * u_ref,
            raw[:, 1:2] * u_ref * anis,
            raw[:, 2:3] * p_ref,
            raw[:, 3:5] * d_ref], axis=-1)
        # physical integrator using only the FIRST diffusion column — a
        # preserved reference quirk (Fvgn.py:1398-1409)
        unv = graph.cell_normal
        area3 = graph.face_area.reshape(-1)[graph.face_index.T][..., None]
        uv = face_out[:, 0:2]
        p = face_out[:, 2:3]
        d = face_out[:, 3:4]
        uu_vu = jnp.concatenate([uv[:, 0:1] * uv, uv[:, 1:2] * uv], axis=-1)
        uu = uu_vu[graph.face_index.T].reshape(-1, 3, 2, 2)
        phi_a = jnp.sum(jnp.einsum("cfkd,cfd->cfk", uu, unv) * area3, axis=1)
        phi_d = jnp.sum(d[graph.face_index.T], axis=1)
        phi_p = jnp.sum(p[graph.face_index.T] * unv * area3, axis=1)
        coeff = jnp.mean(graph.dt) / jnp.maximum(
            graph.cell_volume.reshape(-1, 1), 1e-12)
        acc = coeff * (-phi_a - phi_p + phi_d * 1e-3)
        acc = jnp.where(graph.cell_mask[:, None], acc, 0.0)
        return acc, face_out, {}


class FvgnK(FvgnA):
    """Per-graph dimensionless scaling: u_ref from the inflow BC, l_ref from
    Re, learned anisotropy ratio; physical-unit integration
    (Fvgn.py:1276-1416)."""

    name = "FvgnK"

    def build_module(self):
        return _FvgnKModule(self.arch)

    def _refs(self, graph, feats):
        """u_ref = first INFLOW face's target u per graph (Fvgn.py:1291-1306)."""
        from gnn_fluid_dynamics_tpu.data.node_types import NodeType
        F = graph.num_faces
        inflow = ((graph.face_type.reshape(-1) == NodeType.INFLOW)
                  & graph.face_mask)
        prio = jnp.where(inflow, jnp.arange(F), F)
        first = jax.ops.segment_min(prio, graph.face_batch,
                                    num_segments=graph.num_graphs)
        u_face = feats["face_y"][:, 0]
        u_ref_g = jnp.where(first < F, u_face[jnp.clip(first, 0, F - 1)], 1.0)
        re = jnp.broadcast_to(jnp.reshape(graph.reynolds, (-1,)),
                              (graph.num_graphs,))
        l_ref_g = re * 1e-3 / u_ref_g
        u_ref = u_ref_g[graph.face_batch][:, None]
        l_ref = l_ref_g[graph.face_batch][:, None]
        return u_ref, l_ref

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        u_ref, l_ref = self._refs(graph, feats)   # physical-space refs
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        inputs = self.module_inputs(nfeats)
        if train:
            (acc, face_phys, _), updates = self.module.apply(
                variables, *inputs, graph, True, u_ref=u_ref, l_ref=l_ref,
                rngs=rngs, mutable=["batch_stats"])
            updates = dict(updates)
        else:
            acc, face_phys, _ = self.module.apply(
                variables, *inputs, graph, False, u_ref=u_ref, l_ref=l_ref,
                rngs=rngs, mutable=False)
            updates = {}
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
        # continuity from the normalized face_x area column (Fvgn.py:1346)
        nfeats = outputs["_nfeats"]
        cmask, fmask = graph.cell_mask, graph.face_mask
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
    """EPD -> learned scale/bias denorm -> raw-area physical integrator
    (Fvgn.py:1164-1273): Phi_A/Phi_P use UN-normalized face areas, Phi_D is a
    plain 3-face sum, acc = mean(dt)/V * (-Phi_A - Phi_P/rho + nu*Phi_D)."""
    cfg: ArchConfig
    out_size: int = 5
    rho: float = 1.0
    nu: float = 1e-3

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False):
        from gnn_fluid_dynamics_tpu.models.arch import gather3
        _, raw = EncodeProcessDecode(self.cfg, face_out=self.out_size)(
            cell_x, face_x, graph, train)
        # learned per-channel scale/bias replacing output z-score
        # (Fvgn.py:1149-1157: velocity_scale_x 1.0 / y 0.01 / pressure 1.0 /
        # diffusion 1.0, all biases 0)
        uv = LearnedScaleDenorm(2, init_scale=(1.0, 0.01),
                                name="velocity_scale")(raw[:, 0:2])
        p = LearnedScaleDenorm(1, init_scale=1.0,
                               name="pressure_scale")(raw[:, 2:3])
        d = LearnedScaleDenorm(2, init_scale=1.0,
                               name="diffusion_scale")(raw[:, 3:5])
        face_out = jnp.concatenate([uv, p, d], axis=-1)

        unv = graph.cell_normal
        area = graph.face_area.reshape(-1, 1)
        uu_vu = jnp.concatenate([uv[:, 0:1] * uv, uv[:, 1:2] * uv], axis=-1)
        g = gather3(jnp.concatenate([area, uu_vu, d, p], axis=1), graph)
        e, uu, df, pf = (g[..., 0:1], g[..., 1:5].reshape(-1, 3, 2, 2),
                         g[..., 5:7], g[..., 7:8])
        phi_a = jnp.sum(jnp.einsum("cfkd,cfd->cfk", uu, unv) * e, axis=1)
        phi_d = jnp.sum(df, axis=1)
        phi_p = jnp.sum(pf * unv * e, axis=1)
        coeff = jnp.mean(graph.dt) / jnp.maximum(
            graph.cell_volume.reshape(-1, 1), 1e-12)
        acc = coeff * (-phi_a - phi_p / self.rho + self.nu * phi_d)
        acc = jnp.where(graph.cell_mask[:, None], acc, 0.0)
        return acc, face_out, {}


class FvgnJ(FvgnA):
    """Learned per-channel output scale/bias instead of output z-score
    (Fvgn.py:1140-1273): outputs are physical; train-mode loss re-normalizes.
    Continuity uses the normalized face_x area column like FvgnB
    (Fvgn.py:1203-1207)."""
    name = "FvgnJ"

    loss = FvgnB.loss

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
