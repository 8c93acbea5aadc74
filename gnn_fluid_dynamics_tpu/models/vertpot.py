"""Vertex-potential model family (reference ``src/models/VertPot.py``).

An extra Vertex block accumulates edge latents at mesh vertices; a vertex
decoder emits a scalar potential whose differences around each triangle give
per-cell face fluxes that are *exactly divergence-free by construction*
(``calc_cell_flux_from_vertices``, VertPot.py:25-40 — telescoping sum).

========  ====================================================================
VertPotA  [u,v,p,Dx,Dy] face head + potential flux; flux-advection integrator
          with BatchNorm'd dt/V̄; no flux loss (VertPot.py:47-231)
VertPotB  physical integrator + MLS viscous term (VertPot.py:234-319)
VertPotC  [p,Dx,Dy] head, u_f explicit cell->face interpolation
          (VertPot.py:322-444)
VertPotD  A + owner-converted face flux appended to the FluxA integrator path
          (VertPot.py:447-492)
VertPotE  FluxC wiring with VertPot blocks (VertPot.py:494-539)
VertPotF  physical integration of the potential flux (VertPot.py:541-628)
VertPotG  loss on face flux converted from cell flux (VertPot.py:631-818)
========  ====================================================================
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_fluid_dynamics_tpu.graph import MeshGraph
from gnn_fluid_dynamics_tpu.models import normalizer as norm
from gnn_fluid_dynamics_tpu.models.arch import (MLP, ArchConfig, CellBlock,
                                                Encoder, FaceAreaNorm,
                                                FaceBlock, VolDtNorm, gather3)
from gnn_fluid_dynamics_tpu.models.flux import FluxA, FluxC
from gnn_fluid_dynamics_tpu.models.fvgn import _f, _z
from gnn_fluid_dynamics_tpu.models.losses import combined_log_loss, mse_per_element
from gnn_fluid_dynamics_tpu.ops import fvm
from gnn_fluid_dynamics_tpu.ops.geometry import cell_to_face
from gnn_fluid_dynamics_tpu.ops.segment import aggregate_edges_to_vertices_sum


def calc_cell_flux_from_vertices(vertex_out: jax.Array,
                                 graph: MeshGraph) -> jax.Array:
    """Per-cell fluxes = potential differences around the triangle
    (reference VertPot.py:25-40): [psi(v1)-psi(v2), psi(v2)-psi(v0),
    psi(v0)-psi(v1)] — sums to zero per cell exactly. -> (C, 3)."""
    psi = vertex_out.reshape(-1)
    v = psi[graph.vertex_face]                   # (3, C)
    return jnp.stack([v[1] - v[2], v[2] - v[0], v[0] - v[1]], axis=1)


class _VertPotModule(nn.Module):
    """FvgnA blocks + vertex accumulation + dual decoder + selectable
    integrator."""
    cfg: ArchConfig
    face_out: int = 5
    integrator: str = "flux_norm"   # flux_norm | physical | fluxC | none

    @nn.compact
    def __call__(self, cell_x, face_x, graph: MeshGraph, train: bool = False):
        cell_attr, edge_attr = Encoder(self.cfg)(cell_x, face_x, train)
        vertex_attr = None
        for _ in range(self.cfg.mp_num):
            prev_c, prev_e = cell_attr, edge_attr
            cell_attr = CellBlock(self.cfg)(cell_attr, edge_attr, graph,
                                            None, train)
            e_raw = FaceBlock(self.cfg)(cell_attr, edge_attr, graph,
                                        None, train)
            cell_attr = prev_c + cell_attr
            edge_attr = prev_e + e_raw
            # Vertex block sums the PRE-residual edge output: the reference
            # calls vertex_block on c_graph straight after edge_block, before
            # the residual add (VertPot.py:201-208)
            vertex_attr = aggregate_edges_to_vertices_sum(e_raw, graph)

        face_out = MLP(self.cfg.hidden, self.face_out, layer_norm=False,
                       dropout_rate=self.cfg.dropout_rate,
                       name="decoder_face")(edge_attr, train)
        vertex_out = MLP(self.cfg.hidden, 1, layer_norm=False,
                         dropout_rate=self.cfg.dropout_rate,
                         name="decoder_vertex")(vertex_attr, train)
        vertex_out = jnp.where(graph.vertex_mask[:, None], vertex_out, 0.0)
        cell_flux = calc_cell_flux_from_vertices(vertex_out, graph)  # (C, 3)

        extras = {}
        if self.integrator == "flux_norm":
            # VertPotA.Integrator (VertPot.py:103-150)
            n = VolDtNorm(name="vol_dt_norm")(graph, train)
            area = FaceAreaNorm(name="face_area_norm")(graph, train)
            g = gather3(jnp.concatenate(
                [n, face_out[:, 0:2], face_out[:, 3:5], area,
                 face_out[:, 2:3]], axis=1), graph)          # (C, 3, 7)
            nf, uvf = g[..., 0:1], g[..., 1:3]
            phi_a = jnp.sum(uvf * cell_flux[..., None] * nf, axis=1)
            phi_d = jnp.sum(g[..., 3:5], axis=1)
            phi_p = jnp.sum(g[..., 6:7] * graph.cell_normal * g[..., 5:6],
                            axis=1)
            acc = -phi_a - phi_p + phi_d
            extras["norm_face_area"] = area
        elif self.integrator == "fluxC":
            # VertPotC.Integrator: explicit u_f, [p, Dx, Dy] head
            # (VertPot.py:368-409)
            uv_face = cell_to_face(cell_x[:, 0:2], graph.cell_edge_index,
                                   graph.face_pos, graph.cell_pos)
            area = FaceAreaNorm(name="face_area_norm")(graph, train)
            g = gather3(jnp.concatenate(
                [uv_face, face_out[:, 1:3], area, face_out[:, 0:1]],
                axis=1), graph)                              # (C, 3, 6)
            phi_a = jnp.sum(g[..., 0:2] * cell_flux[..., None], axis=1)
            phi_d = jnp.sum(g[..., 2:4], axis=1)
            phi_p = jnp.sum(g[..., 5:6] * graph.cell_normal * g[..., 4:5],
                            axis=1)
            acc = -phi_a - phi_p + phi_d
            extras["norm_face_area"] = area
        elif self.integrator == "fluxE":
            # VertPotE (VertPot.py:494-539): face flux converted from the
            # potential cell flux is CONCATENATED onto the [p, Dx, Dy] head
            # and the inherited FluxC integrator runs on the result — which
            # reads phi from column 1 (= Dx) and D from columns 2:4
            # (= [Dy, flux]). The scrambled columns are a preserved
            # reference quirk, not a mistake here.
            face_flux = fvm.cell_flux_to_face_flux(
                cell_flux, graph.cell_edge_index, graph.owner_local_slot)
            face_out = jnp.concatenate(
                [face_out, face_flux.reshape(-1, 1)], axis=1)    # (F, 4)
            uv_face = cell_to_face(cell_x[:, 0:2], graph.cell_edge_index,
                                   graph.face_pos, graph.cell_pos)
            area = FaceAreaNorm(name="face_area_norm")(graph, train)
            g = gather3(jnp.concatenate(
                [uv_face, face_out[:, 1:2], face_out[:, 2:4], area,
                 face_out[:, 0:1]], axis=1), graph)              # (C, 3, 7)
            uvf, phif = g[..., 0:2], g[..., 2:3]
            fd, e, pf3 = g[..., 3:5], g[..., 5:6], g[..., 6:7]
            phi_a = jnp.sum(uvf * phif, axis=1)
            phi_dd = jnp.sum(fd, axis=1)
            phi_p = jnp.sum(pf3 * graph.cell_normal * e, axis=1)
            acc = -phi_a - phi_p + phi_dd
            extras["norm_face_area"] = area
        elif self.integrator == "fluxD":
            # VertPotD (VertPot.py:447-492): the OWNER-SLOT converted face
            # flux is spliced into the FluxA integrator input. The vertex
            # cell flux is not exactly antisymmetric, so the integrator's
            # signed regather (face_flux_to_cell_flux_vectorized) does NOT
            # equal the direct per-cell flux — a preserved quirk.
            from gnn_fluid_dynamics_tpu.models.arch import FluxIntegrator
            face_flux = fvm.cell_flux_to_face_flux(
                cell_flux, graph.cell_edge_index, graph.owner_local_slot)
            face_out = jnp.concatenate(
                [face_out[:, 0:3], face_flux, face_out[:, 3:5]], axis=1)
            acc, extras = FluxIntegrator(name="integrator")(face_out, graph,
                                                            train)
            return acc, face_out, cell_flux, extras
        elif self.integrator == "fluxF":
            # VertPotF (VertPot.py:541-628) — executable only under two
            # documented shims: the undefined convert_cell_flux_to_face_flux
            # _alt (owner-slot conversion is the only candidate in the tree,
            # utils/fvm.py:55) and nu = 1e-3 (the shipped constructor passes
            # no nu, VertPot.py:580, so self.nu*Phi_D is a TypeError).
            # The integrator consumes the NETWORK-SPACE outputs with physical
            # areas/dt/V — the denormalized copy the reference computes is
            # discarded (VertPot.py:575-577) — and its advective term uses
            # the owner-slot face flux REGATHERED per cell (sign quirk: the
            # neighbour cell sees the owner's outward value, VertPot.py:613).
            face_flux = fvm.cell_flux_to_face_flux(
                cell_flux, graph.cell_edge_index, graph.owner_local_slot)
            face_out = jnp.concatenate(
                [face_out, face_flux.reshape(-1, 1)], axis=1)    # (F, 4)
            grad = fvm.calc_gradient_tensor(face_out[:, 0:2],
                                            graph.face_grad_weights,
                                            graph.face_grad_neighbours)
            area = graph.face_area.reshape(-1, 1)
            gg = gather3(jnp.concatenate(
                [area, face_out[:, 0:2], face_out[:, 3:4], grad,
                 face_out[:, 2:3]], axis=1), graph)              # (C, 3, 9)
            area3, uvf, phif = gg[..., 0:1], gg[..., 1:3], gg[..., 3:4]
            phi_a = jnp.sum(uvf * phif, axis=1)
            g = gg[..., 4:8].reshape(-1, 3, 2, 2)
            phi_d = jnp.sum(jnp.einsum("cfkd,cfd->cfk", g, graph.cell_normal)
                            * area3, axis=1)
            phi_p = jnp.sum(gg[..., 8:9] * graph.cell_normal * area3, axis=1)
            coeff = jnp.mean(graph.dt) / jnp.maximum(
                graph.cell_volume.reshape(-1, 1), 1e-12)
            acc = coeff * (-phi_a - phi_p + 1e-3 * phi_d)
        else:
            acc = jnp.zeros((cell_x.shape[0], 2), cell_x.dtype)
        acc = jnp.where(graph.cell_mask[:, None], acc, 0.0)
        return acc, face_out, cell_flux, extras


class VertPotA(FluxA):
    """Potential flux, flux-advection integrator, no flux loss
    (VertPot.py:47-231)."""

    name = "VertPotA"
    face_out_size = 5
    integrator_kind = "flux_norm"

    def build_module(self):
        return _VertPotModule(self.arch, face_out=self.face_out_size,
                              integrator=self.integrator_kind)

    def normalisation_map(self) -> norm.NormalizationMap:
        nmap = super().normalisation_map()
        # cell_out = [acc(2) | cell_flux(3)]; flux columns share face_flux
        # stats (VertPot.py:64-72)
        outputs = tuple(f for f in nmap.outputs if f.name != "face_flux") + (
            _f("cell_flux", "cell_out", 2, 5, "face_flux"),)
        return nmap.replace(outputs=outputs)

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (acc, face_out, cell_flux, extras), updates = self._apply(
            variables, nfeats, graph, train, rngs)
        bundle = {"cell_out": jnp.concatenate([acc, cell_flux], axis=1),
                  "face_out": face_out}
        if mode == "rollout":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats,
                                            inverse=True)
        outputs = {
            "cell_velocity_change": bundle["cell_out"][:, 0:2],
            "cell_flux": bundle["cell_out"][:, 2:5],
            "face_velocity": bundle["face_out"][:, 0:2],
            "face_pressure": bundle["face_out"][:, 2:3],
            # the RAW telescoped flux (pre-denorm): exactly div-free by
            # construction (VertPot.py:25-40). The denormalized "cell_flux"
            # above is NOT — z-score inversion adds the dataset-mean flux to
            # all 3 local faces, so its divergence is the constant 3*mean
            # per cell (a parity-faithful artifact; the reference shares the
            # z-score scheme, Flux.py:46). Rollout reports both metrics.
            "_cell_flux_raw": cell_flux,
            "_nfeats": nfeats,
            **{f"_{k}": v for k, v in extras.items()},
        }
        return outputs, updates

    def loss(self, outputs, feats, graph):
        # (VertPot.py:152-185) — note: NO interior mask on face velocity
        nfeats = outputs["_nfeats"]
        cmask, fmask = graph.cell_mask, graph.face_mask
        div = fvm.divergence_from_cell_flux(outputs["cell_flux"])
        comps = {
            "continuity": mse_per_element(div, jnp.zeros_like(div), cmask),
            "cell_velocity_change": mse_per_element(
                outputs["cell_velocity_change"], nfeats["cell_y"], cmask),
            "face_velocity": mse_per_element(
                outputs["face_velocity"], nfeats["face_y"][:, 0:2], fmask),
            "face_pressure": mse_per_element(
                outputs["face_pressure"], nfeats["face_y"][:, 2:3], fmask),
        }
        total = combined_log_loss(comps, self.loss_weights)
        return {"total_log_loss": total,
                **{f"{k}_loss": v for k, v in comps.items()}}


class VertPotB(VertPotA):
    """Physical integration + MLS viscous term (VertPot.py:234-319).

    The reference DENORMALIZES [u_f, v_f, p_f] and the vertex cell flux
    before its physical integrator (VertPot.py:262-266), re-normalizes only
    the acceleration for the train-mode loss, and returns the NETWORK-space
    cell flux and face outputs in train mode (VertPot.py:269-281)."""

    name = "VertPotB"
    face_out_size = 3
    integrator_kind = "none"
    face_grad_weights_use = True
    nu = 1e-3

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        from gnn_fluid_dynamics_tpu.models.arch import gather3
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (_, face_out, cell_flux, _), updates = self._apply(
            variables, nfeats, graph, train, rngs)

        phys = norm.normalize_outputs(
            {"cell_out": jnp.concatenate(
                [jnp.zeros((cell_flux.shape[0], 2), cell_flux.dtype),
                 cell_flux], axis=1),
             "face_out": face_out}, self.nmap, self.stats, inverse=True)
        uvp = phys["face_out"]                    # physical [u, v, p]
        pflux = phys["cell_out"][:, 2:5]          # physical cell flux (C, 3)

        # physical integrator (VertPot.py:283-319): Phi_A = u_f * cell_flux
        # per local face (no area), MLS viscous term and pressure with areas
        grad = fvm.calc_gradient_tensor(uvp[:, 0:2], graph.face_grad_weights,
                                        graph.face_grad_neighbours)
        area = graph.face_area.reshape(-1, 1)
        gg = gather3(jnp.concatenate([area, uvp[:, 0:2], grad, uvp[:, 2:3]],
                                     axis=1), graph)            # (C, 3, 8)
        area3, uvf = gg[..., 0:1], gg[..., 1:3]
        phi_a = jnp.sum(uvf * pflux[..., None], axis=1)
        g = gg[..., 3:7].reshape(-1, 3, 2, 2)
        phi_d = jnp.sum(jnp.einsum("cfkd,cfd->cfk", g, graph.cell_normal)
                        * area3, axis=1)
        phi_p = jnp.sum(gg[..., 7:8] * graph.cell_normal * area3, axis=1)
        coeff = jnp.mean(graph.dt) / jnp.maximum(
            graph.cell_volume.reshape(-1, 1), 1e-12)
        acc = coeff * (-phi_a - phi_p + self.nu * phi_d)
        acc = jnp.where(graph.cell_mask[:, None], acc, 0.0)

        if mode == "rollout":
            cvc = acc
            out_flux, out_face = pflux, uvp
        else:
            nb = norm.normalize_outputs(
                {"cell_out": jnp.concatenate(
                    [acc, jnp.zeros_like(cell_flux)], axis=1),
                 "face_out": None}, self.nmap, self.stats)
            cvc = nb["cell_out"][:, 0:2]
            out_flux, out_face = cell_flux, face_out   # network space
        outputs = {
            "cell_velocity_change": cvc,
            "cell_flux": out_flux,
            "face_velocity": out_face[:, 0:2],
            "face_pressure": out_face[:, 2:3],
            "_nfeats": nfeats,
        }
        return outputs, updates


class VertPotC(VertPotA):
    """[p, Dx, Dy] head; u_f explicit by cell->face interpolation
    (VertPot.py:322-444)."""

    name = "VertPotC"
    face_out_size = 3
    integrator_kind = "fluxC"

    def normalisation_map(self) -> norm.NormalizationMap:
        # face head is [p, Dx, Dy]; y = [u, v, p, phi] unchanged; outputs map
        # p from face_out col 0 (VertPot.py / Flux.py:286-354 FluxC map)
        nmap = FluxA.normalisation_map(self)
        outputs = (
            _f("cell_velocity_change_x", "cell_out", 0, 1),
            _f("cell_velocity_change_y", "cell_out", 1, 2),
            _f("cell_flux", "cell_out", 2, 5, "face_flux"),
            _f("face_pressure", "face_out", 0, 1),
        )
        return nmap.replace(outputs=outputs)

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (acc, face_out, cell_flux, extras), updates = self._apply(
            variables, nfeats, graph, train, rngs)
        bundle = {"cell_out": jnp.concatenate([acc, cell_flux], axis=1),
                  "face_out": face_out}
        if mode == "rollout":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats,
                                            inverse=True)
        outputs = {
            "cell_velocity_change": bundle["cell_out"][:, 0:2],
            "cell_flux": bundle["cell_out"][:, 2:5],
            "face_pressure": bundle["face_out"][:, 0:1],
            "_nfeats": nfeats,
            **{f"_{k}": v for k, v in extras.items()},
        }
        return outputs, updates

    def loss(self, outputs, feats, graph):
        # (VertPot.py:411-444)
        nfeats = outputs["_nfeats"]
        cmask, fmask = graph.cell_mask, graph.face_mask
        div = fvm.divergence_from_cell_flux(outputs["cell_flux"])
        comps = {
            "continuity": mse_per_element(div, jnp.zeros_like(div), cmask),
            "cell_velocity_change": mse_per_element(
                outputs["cell_velocity_change"], nfeats["cell_y"], cmask),
            "face_pressure": mse_per_element(
                outputs["face_pressure"], nfeats["face_y"][:, 2:3], fmask),
        }
        total = combined_log_loss(comps, self.loss_weights)
        return {"total_log_loss": total,
                **{f"{k}_loss": v for k, v in comps.items()}}


class VertPotD(VertPotA):
    """Owner-slot potential face flux through the FluxA integrator and
    normalizer map (VertPot.py:447-492; the ``_alt`` conversion the reference
    names is undefined — the owner-slot ``convert_cell_flux_to_face_flux``
    is the only candidate in its tree). The shipped reference cannot compute
    its loss (the inherited FluxA.loss KeyErrors on the missing
    ``cell_flux``); here the FluxA loss runs on the integrator's signed
    regathered flux as the evident intent."""

    name = "VertPotD"
    integrator_kind = "fluxD"

    def normalisation_map(self) -> norm.NormalizationMap:
        # the reference inherits FluxA's map (face_out = [u, v, p, phi, D]);
        # VertPotA's cell_flux remap does not apply
        return FluxA.normalisation_map(self)

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (acc, eo6, _direct_flux, extras), updates = self._apply(
            variables, nfeats, graph, train, rngs)
        bundle = {"cell_out": acc, "face_out": eo6}
        if mode == "rollout":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats,
                                            inverse=True)
        outputs = {
            "cell_velocity_change": bundle["cell_out"][:, 0:2],
            "face_velocity": bundle["face_out"][:, 0:2],
            "face_pressure": bundle["face_out"][:, 2:3],
            "face_flux": bundle["face_out"][:, 3:4],
            "cell_flux": extras["cell_flux"],
            "_nfeats": nfeats,
            **{f"_{k}": v for k, v in extras.items()},
        }
        return outputs, updates

    loss = FluxA.loss


class VertPotE(FluxC):
    """FluxC wiring with VertPot blocks (VertPot.py:494-539): the vertex
    potential's cell flux is converted to a face flux and concatenated onto
    the [p, Dx, Dy] head before FluxC's integrator and loss run on it.

    Preserved reference quirks: the integrator reads phi from column 1
    (= Dx) and D from columns 2:4 (= [Dy, flux]); the output normalizer
    applies flux stats to column 1; ``face_velocity`` in the outputs is
    columns 0:2 (= [p, Dx]) and ``face_pressure`` column 2:3 (= Dy)
    (reference VertPot.py:525, 536-539)."""

    name = "VertPotE"

    def build_module(self):
        return _VertPotModule(self.arch, face_out=3, integrator="fluxE")

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (acc, eo, _cell_flux, extras), updates = self._apply(
            variables, nfeats, graph, train, rngs)
        bundle = {"cell_out": acc, "face_out": eo}
        if mode == "rollout":
            bundle = norm.normalize_outputs(bundle, self.nmap, self.stats,
                                            inverse=True)
        outputs = {
            "cell_velocity_change": bundle["cell_out"][:, 0:2],
            "face_velocity": bundle["face_out"][:, 0:2],   # [p, Dx] quirk
            "face_pressure": bundle["face_out"][:, 2:3],   # Dy quirk
            "face_flux": bundle["face_out"][:, 3:4],
            "_nfeats": nfeats,
            **{f"_{k}": v for k, v in extras.items()},
        }
        return outputs, updates


class VertPotF(VertPotA):
    """Physical integration of the owner-slot potential face flux
    (VertPot.py:541-628). The shipped reference variant is triple-dead code
    (undefined ``_alt`` conversion, ``nu=None`` TypeError, and the inherited
    FluxA.loss KeyErrors on the missing ``cell_flux``); this implements its
    semantics under the documented shims (see the ``fluxF`` integrator) with
    a FluxA-style loss on the signed cell flux as the evident intent."""
    name = "VertPotF"
    face_out_size = 3
    integrator_kind = "fluxF"
    face_grad_weights_use = True

    def normalisation_map(self) -> norm.NormalizationMap:
        # the reference inherits FluxA's map unchanged (face_out =
        # [u, v, p, phi]); VertPotA's cell_flux remap does not apply
        return FluxA.normalisation_map(self)

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        train = mode == "train"
        nfeats = norm.normalize_inputs(feats, self.nmap, self.stats)
        (acc, eo4, _cell_flux, _), updates = self._apply(
            variables, nfeats, graph, train, rngs)
        if mode != "rollout":
            # train: only the acceleration is normalized for the loss; the
            # face outputs stay in network space (VertPot.py:583-585)
            acc = norm.normalize_outputs(
                {"cell_out": acc, "face_out": None}, self.nmap,
                self.stats)["cell_out"]
        # rollout quirk: acc leaves physical-raw and the face outputs are
        # NEVER denormalized (VertPot.py:586-592)
        cell_flux = fvm.face_flux_to_cell_flux_g(eo4[:, 3:4], graph)
        outputs = {
            "cell_velocity_change": acc[:, 0:2],
            "face_velocity": eo4[:, 0:2],
            "face_pressure": eo4[:, 2:3],
            "face_flux": eo4[:, 3:4],
            "cell_flux": cell_flux[..., 0],
            "_nfeats": nfeats,
        }
        return outputs, updates

    loss = FluxA.loss


class VertPotG(VertPotA):
    """Loss on face flux converted from cell flux (VertPot.py:631-818).

    The conversion is the reference's last-write-wins scatter
    (geometry.py:539-570) applied AFTER output normalization, so in train
    mode the converted flux carries the z-score mean shift with the
    larger-indexed cell's orientation — a preserved quirk distinct from the
    owner-slot conversion."""

    name = "VertPotG"

    def forward(self, variables, graph, feats, mode="train", rngs=None):
        outputs, updates = super().forward(variables, graph, feats, mode, rngs)
        outputs["face_flux"] = fvm.cell_flux_to_face_flux_lastwrite(
            outputs["cell_flux"], graph.cell_edge_index, graph.face_index)
        return outputs, updates

    def loss(self, outputs, feats, graph):
        # (VertPot.py:738-772): continuity from the unsigned face-flux sum
        nfeats = outputs["_nfeats"]
        cmask, fmask = graph.cell_mask, graph.face_mask
        div = fvm.divergence_from_face_flux(outputs["face_flux"],
                                            graph.face_index)
        comps = {
            "continuity": mse_per_element(div, jnp.zeros_like(div), cmask),
            "cell_velocity_change": mse_per_element(
                outputs["cell_velocity_change"], nfeats["cell_y"], cmask),
            "face_velocity": mse_per_element(
                outputs["face_velocity"], nfeats["face_y"][:, 0:2], fmask),
            "face_pressure": mse_per_element(
                outputs["face_pressure"], nfeats["face_y"][:, 2:3], fmask),
            "face_flux": mse_per_element(
                outputs["face_flux"], nfeats["face_y"][:, 3:4], fmask),
        }
        total = combined_log_loss(comps, self.loss_weights)
        losses = {f"{k}_loss": v for k, v in comps.items()}
        losses.pop("face_flux_loss", None)   # reference omits it from the dict
        return {"total_log_loss": total, **losses}
