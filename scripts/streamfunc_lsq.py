"""StreamFuncA structural-failure demonstration on the REAL cylinder workload.

StreamFuncA (reference ``src/models/StreamFunc.py:109-135``) predicts a
stream function psi and supervises ``perp-grad(psi)`` against the
*component-normalized* velocity ``(v - mu) / sigma``.  Any perp-gradient
field is divergence-free under the plain divergence operator, but
component normalization with ``sigma_x != sigma_y`` shears the target out
of the divergence-free subspace: on this workload ``sigma_x / sigma_y =
0.258 / 0.068 = 3.8`` (stats-sf.json).  No psi — by ANY architecture or
training recipe — can represent the target.

This script computes the exact irreducible error: it assembles the MLS
perp-gradient operator D (the same ``divergence_layer`` weights the model
uses) as a sparse matrix and solves ``min_psi ||D psi - target||`` for

  (a) the SFA objective: component-normalized target   -> large residual
  (b) isotropically scaled target (control)            -> small residual
  (c) the SFB objective: physical target, curl before renorm -> small

proving the e2e StreamFuncA failure (VERDICT r2 weak #2) is the variant's
own head design, independent of implementation and optimizer, and that the
reference's own SFB refinement (StreamFunc.py:138-167, denormalize-then-
curl) removes it.

Run: JAX_PLATFORMS=cpu python scripts/streamfunc_lsq.py
Writes runs/diag3/streamfunc_lsq.json.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from gnn_fluid_dynamics_tpu.models.registry import get_model_class
from gnn_fluid_dynamics_tpu.training.config import load_config
from gnn_fluid_dynamics_tpu.training.train import build_datasets


def perp_grad_matrix(weights, neighbours, n):
    """Sparse (2n x n) operator: psi -> (-d psi/dy, +d psi/dx), exactly
    divergence_layer (models/streamfunc.py) / reference DivergenceLayer."""
    C, k = neighbours.shape
    rows, cols, vals = [], [], []
    for comp, sign, wcol in ((0, -1.0, 1), (1, 1.0, 0)):  # vx=-gy, vy=+gx
        for j in range(k):
            nb = neighbours[:, j]
            w = sign * weights[:, j, wcol]
            rows.append(comp * C + np.arange(C)); cols.append(nb); vals.append(w)
            rows.append(comp * C + np.arange(C)); cols.append(np.arange(C))
            vals.append(-w)
    return sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(2 * C, n))


def residual(D, target):
    """min_psi ||D psi - t|| / ||t|| (lsmr, tight tolerances)."""
    t = target.T.reshape(-1)  # (2C,) component-major to match D's row layout
    res = spla.lsmr(D, t, atol=1e-10, btol=1e-10, maxiter=20000)
    psi = res[0]
    r = D @ psi - t
    return float(np.linalg.norm(r) / np.linalg.norm(t))


def main():
    config = load_config("config/e2e/streamfunca.json")
    config.training.data_sim_limit = 1
    config.rollout.data_sim_limit = 1
    model_cls = get_model_class("StreamFuncA")
    train_ds, valid_ds = build_datasets(config, model_cls)
    stats = json.load(open(config.dataset.stats_fpath))

    out = {"sigma_x": stats["cell_velocity_x"]["std"],
           "sigma_y": stats["cell_velocity_y"]["std"], "samples": []}
    for ts in (50, 200, 350):
        g = valid_ds.get_batch([(valid_ds.sim_ids()[0], ts)])
        mask = np.asarray(g.cell_mask)
        C = int(mask.sum())
        assert mask[:C].all() and not mask[C:].any()
        w = np.asarray(g.cell_grad_weights)[:C]
        nb = np.asarray(g.cell_grad_neighbours)[:C]
        assert (nb < C).all(), "MLS neighbours must stay on valid cells"
        # target = next-step velocity, the MgnC/SFA supervision target
        v = np.asarray(g.cell_velocity)[:C, -1]
        D = perp_grad_matrix(w, nb, C)

        mu = np.array([stats["cell_velocity_x"]["mean"],
                       stats["cell_velocity_y"]["mean"]])
        sig = np.array([out["sigma_x"], out["sigma_y"]])
        rec = {
            "timestep": ts, "cells": C,
            # (a) SFA: component-normalized target
            "sfa_normalized": residual(D, (v - mu) / sig),
            # (b) control: isotropic scaling keeps div-freeness
            "isotropic": residual(D, (v - mu) / sig.mean()),
            # (c) SFB: physical-space curl
            "sfb_physical": residual(D, v),
        }
        out["samples"].append(rec)
        print(json.dumps(rec))

    json.dump(out, open("runs/diag3/streamfunc_lsq.json", "w"), indent=2)
    a = np.mean([s["sfa_normalized"] for s in out["samples"]])
    c = np.mean([s["sfb_physical"] for s in out["samples"]])
    print(f"mean irreducible relative residual: SFA(normalized)={a:.3f} "
          f"vs SFB(physical)={c:.3f}")


if __name__ == "__main__":
    main()
