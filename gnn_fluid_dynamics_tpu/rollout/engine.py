"""Autoregressive rollout as a single on-device ``lax.scan``.

The reference's rollout (``src/rollout.py:255-385``) is a Python loop that
re-reads ground truth from h5py every step and runs one forward per iteration —
host-bound and GPU-idle. Here the whole trajectory's ground truth is preloaded
into HBM, and the entire rollout (forward -> state derivation -> error
accumulation -> feature feedback) is one compiled ``lax.scan``; per-step field
trajectories stream out as stacked scan outputs. This is where the "600-step
rollout under 1 s" target is won (BASELINE.md).

Error metrics match reference ``_error_accumulate`` (rollout.py:121-148):
per-graph relative MSE of cell velocity and pressure vs ground truth, plus a
divergence metric whose form depends on what the model exposes
(cell_flux -> face_velocity with BC clamp -> cell_velocity via MLS).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_fluid_dynamics_tpu.graph import MeshGraph
from gnn_fluid_dynamics_tpu.models.losses import mse_per_graph, rel_mse_per_graph
from gnn_fluid_dynamics_tpu.models.transforms import interior_face_mask
from gnn_fluid_dynamics_tpu.ops import fvm

# fields streamed out of the scan under save_fields: the cell state plus every
# face-level prediction the model exposes (reference simulation_data.py:96-211
# saves cell velocity/pressure/flux and face velocity/pressure/flux)
SAVABLE_FIELDS = ("cell_velocity", "cell_pressure", "cell_flux",
                  "face_velocity", "face_pressure", "face_flux")


@dataclasses.dataclass(frozen=True)
class RolloutConfig:
    """Rollout section of the experiment config (reference config.py:92-113)."""
    num_steps: int = 50
    compute_error: bool = True
    save_fields: bool = False      # stream predicted cell+face fields out of the scan
    save_frequency: int = 1


def _divergence_metric(model, solutions: Dict, feats: Dict,
                       graph: MeshGraph, sub_step: int = -1) -> jax.Array:
    """Pick the divergence estimate by available outputs
    (reference rollout.py:133-148). Static dispatch — resolved at trace time.
    ``sub_step`` selects the bundled target for BC clamping
    (reference rollout.py:139-142)."""
    if "cell_flux" in solutions:
        div = fvm.divergence_from_cell_flux(solutions["cell_flux"])
    elif "face_velocity" in solutions:
        # clamp boundary (INFLOW) faces to the BC targets before measuring
        bc = ~interior_face_mask(graph.face_type)
        fy = feats["face_y"]
        bc_vals = fy[:, sub_step, 0:2] if fy.ndim == 3 else fy[:, 0:2]
        uf = jnp.where(bc[:, None], bc_vals,
                       solutions["face_velocity"])
        div = fvm.divergence_from_uf(uf, graph.cell_normal, graph.face_area,
                                     graph.face_index)
    elif ("cell_velocity" in solutions
          and graph.cell_grad_weights is not None):
        div = fvm.divergence_from_uc(solutions["cell_velocity"],
                                     graph.cell_grad_weights,
                                     graph.cell_grad_neighbours,
                                     graph.cell_volume)
    else:
        div = jnp.zeros_like(graph.cell_volume)
    return jnp.where(graph.cell_mask[:, None], div, 0.0)


def rollout_scan(model, variables: Dict, graph: MeshGraph,
                 feats0: Dict[str, jax.Array],
                 gt_cell_velocity: Optional[jax.Array] = None,
                 gt_cell_pressure: Optional[jax.Array] = None,
                 config: RolloutConfig = RolloutConfig(),
                 ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Run ``config.num_steps`` autoregressive steps.

    Args:
        model: a FluidModel (static; closed over by the jitted scan).
        variables: Flax variables (params + batch_stats) — eval mode.
        graph: the (batched) MeshGraph at t0.
        feats0: features from ``model.transform_features(..., mode='rollout')``.
        gt_cell_velocity: (T, C, 2) ground truth aligned so row ``i`` is the
            target of step ``i`` (i.e. state at t0 + (i+1)*stride); required
            when ``config.compute_error``.
        gt_cell_pressure: (T, C, 1) likewise.

    Returns:
        (errors, fields): errors holds ``velocity_error``/``pressure_error``/
        ``divergence_error`` arrays of shape (T, num_graphs); fields holds the
        stacked per-step predicted cell fields when ``save_fields``.
    """
    num_graphs = graph.num_graphs
    compute_error = config.compute_error and gt_cell_velocity is not None
    # temporal bundling (FvgnC): each forward emits k sub-steps
    # (reference rollout.py:317-335)
    bundle = int(getattr(getattr(model, "config", None), "bundle_size", None)
                 or 1)

    def measure(sol, feats, gt_t, ys, suffix="", sub_step=-1):
        gv, gp = gt_t
        # argument order matters: the denominator is sum|target|^2, so the
        # ground truth must be the TARGET (a swapped call divides by the
        # prediction's magnitude and explodes when predictions are small)
        ys["velocity_error" + suffix] = rel_mse_per_graph(
            sol["cell_velocity"], gv, graph.cell_mask, graph.cell_batch,
            num_graphs)
        ys["pressure_error" + suffix] = rel_mse_per_graph(
            sol["cell_pressure"], gp, graph.cell_mask, graph.cell_batch,
            num_graphs)
        div = _divergence_metric(model, sol, feats, graph, sub_step)
        ys["divergence_error" + suffix] = mse_per_graph(
            div, jnp.zeros_like(div), graph.cell_mask, graph.cell_batch,
            num_graphs)
        if suffix == "" and "_cell_flux_raw" in sol:
            # conservation evidence on the raw telescoped flux (pre-denorm):
            # the denormalized metric above carries a constant 3*mean-flux
            # offset from z-score inversion (see VertPotA.forward)
            draw = jnp.where(
                graph.cell_mask[:, None],
                fvm.divergence_from_cell_flux(sol["_cell_flux_raw"]), 0.0)
            ys["divergence_raw_error"] = mse_per_graph(
                draw, jnp.zeros_like(draw), graph.cell_mask,
                graph.cell_batch, num_graphs)

    def step(feats, gt_t):
        outputs, _ = model.forward(variables, graph, feats, mode="rollout")
        ys = {}
        if bundle == 1:
            sol = model.derive_state(outputs, feats, graph)
            if compute_error:
                measure(sol, feats, gt_t, ys)
            if config.save_fields:
                for key in SAVABLE_FIELDS:
                    if key in sol:
                        ys[key] = sol[key]
        else:
            # extract each bundled sub-step (reference rollout.py:320-335)
            subs = []
            for k in range(bundle):
                sub = {key: (v[:, k] if (hasattr(v, "ndim") and v.ndim >= 3
                                         and not key.startswith("_")) else v)
                       for key, v in outputs.items()}
                sol_k = model.derive_state(sub, feats, graph)
                subs.append(sol_k)
                if compute_error:
                    gt_k = jax.tree.map(lambda x: x[k], gt_t)
                    measure(sol_k, feats, gt_k, ys, suffix=f"_k{k}",
                            sub_step=k)
            sol = subs[-1]
            if config.save_fields:
                for key in SAVABLE_FIELDS:
                    if all(key in s for s in subs):
                        ys[key] = jnp.stack([s[key] for s in subs], axis=0)

        new_feats = model.update_features(sol, feats, graph)
        return new_feats, ys

    n_outer = config.num_steps // bundle if bundle > 1 else config.num_steps
    n_outer = max(n_outer, 1)
    if compute_error:
        T = gt_cell_velocity.shape[0]
        assert T >= n_outer * bundle, (T, config.num_steps, bundle)
        gv = gt_cell_velocity[: n_outer * bundle]
        gp = gt_cell_pressure[: n_outer * bundle]
        if bundle > 1:
            gv = gv.reshape(n_outer, bundle, *gv.shape[1:])
            gp = gp.reshape(n_outer, bundle, *gp.shape[1:])
        xs = (gv, gp)
    else:
        xs = (jnp.zeros((n_outer, 0)), jnp.zeros((n_outer, 0)))

    final_feats, ys = jax.lax.scan(step, feats0, xs, length=n_outer)
    if bundle > 1:
        # interleave per-sub-step outputs back into a flat time axis
        for base in ("velocity_error", "pressure_error", "divergence_error"):
            ks = [f"{base}_k{k}" for k in range(bundle)]
            if all(k in ys for k in ks):
                stacked = jnp.stack([ys.pop(k) for k in ks], axis=1)
                ys[base] = stacked.reshape(-1, *stacked.shape[2:])
        for base in SAVABLE_FIELDS:
            if base in ys:
                v = ys.pop(base)                     # (T_outer, k, C, D)
                ys[base] = v.reshape(-1, *v.shape[2:])

    errors = {k: ys[k] for k in ("velocity_error", "pressure_error",
                                 "divergence_error", "divergence_raw_error")
              if k in ys}
    fields = {k: ys[k] for k in SAVABLE_FIELDS if k in ys}
    # always expose the final state so callers (and benchmarks) have a data
    # dependency on every step even when per-step outputs are disabled —
    # otherwise XLA dead-code-eliminates the whole scan
    fields["final_cell_state"] = final_feats.get("cell_x")
    return errors, fields


def error_summary(errors: Dict[str, jax.Array], sim_ids=None) -> Dict[str, Any]:
    """Scalar stats + per-trajectory evolution arrays
    (reference ``_error_save``, rollout.py:167-223)."""
    # one bulk device->host transfer per error array: element-wise float()
    # on a jax array issues a blocking RPC per scalar, which on a tunneled
    # TPU costs minutes per (T=389, B=5) validation summary
    host = {name: np.asarray(arr) for name, arr in errors.items()}
    out_scalar, out_evo = {}, {}
    for name, a in host.items():                  # (T, B)
        sim_means = a.mean(axis=0)                # per-sim mean across time
        sim_vars = a.var(axis=1)                  # across-sim variance per step
        out_scalar[name] = {
            "mean_all": float(a.mean()),
            "max_all": float(a.max()),
            "variance_mean_all": float(sim_means.var()),
            "mean_variance_all": float(sim_vars.mean()),
        }
        evo = {"evo_all": a.mean(axis=1).tolist()}
        if sim_ids is not None:
            for i, sid in enumerate(sim_ids):
                evo[f"evo_{sid}"] = a[:, i].tolist()
        out_evo[name] = evo
    if "velocity_error" in host and "pressure_error" in host:
        out_scalar["total_mean_error"] = float(
            (host["velocity_error"] + host["pressure_error"]).mean())
    return out_scalar, out_evo
