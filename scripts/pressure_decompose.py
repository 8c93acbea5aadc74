"""Decompose rollout pressure error into spatial-mean vs fluctuation parts.

The diagnostic behind TRAINING.md failure mode 4: per timestep, split the
cell-pressure error field into its spatial mean (the gauge / channel
pressure-drop component — a single global number per step) and the residual
fluctuation field, each reported relative to the ground-truth energy. A
dominant mean part on a subset of sims indicates a global quantity the
model's inputs cannot determine (e.g. Re realised through viscosity), not a
head-capacity problem.

Usage:
    python scripts/pressure_decompose.py rollouts/e2e/rollout-cyl-r4 [--steps 50]
"""

import argparse
import json
import os

import h5py
import numpy as np


def decompose(path: str, steps: int):
    out = {}
    with h5py.File(os.path.join(path, "data0.h5"), "r") as f:
        for mesh in sorted(k for k in f if k.startswith("mesh_")):
            p = f[f"{mesh}/cell/pressure"][:steps, :, 0]
            g = f[f"{mesh}/cell/pressure_gt"][:steps, :, 0]
            err = p - g
            mean_part = err.mean(axis=1, keepdims=True)
            fluct = err - mean_part
            den = (g ** 2).mean(axis=1)
            out[mesh] = {
                "rel_total": float(((err ** 2).mean(axis=1) / den).mean()),
                "rel_spatial_mean": float((mean_part[:, 0] ** 2 / den).mean()),
                "rel_fluctuation": float(((fluct ** 2).mean(axis=1) / den).mean()),
                "gt_mean": float(g.mean()),
                "gt_std": float(g.std()),
            }
    return out


def structure(path: str, start: int = 100, stride: int = 12):
    """Second-level split of the gauge-free pressure error: time-mean field
    vs oscillation (the r5 follow-up after the spatial-mean component
    collapsed on inflow data). Per mesh, reports the predicted/gt field
    correlation and amplitude ratio, and the relative error carried by the
    time-mean field vs the oscillatory residual — distinguishing a per-sim
    dynamic-pressure amplitude misestimate (mean-field dominated, high corr,
    amp far from 1) from shedding phase/amplitude error (osc dominated)."""
    out = {}
    with h5py.File(os.path.join(path, "data0.h5"), "r") as f:
        for mesh in sorted(k for k in f if k.startswith("mesh_")):
            sl = slice(start, None, stride)
            p = f[f"{mesh}/cell/pressure"][sl, :, 0]
            g = f[f"{mesh}/cell/pressure_gt"][sl, :, 0]
            pf = p - p.mean(axis=1, keepdims=True)   # gauge-free
            gf = g - g.mean(axis=1, keepdims=True)
            pm, gm = pf.mean(axis=0), gf.mean(axis=0)
            den = (gf ** 2).mean()
            out[mesh] = {
                "corr": float(np.corrcoef(pf.ravel(), gf.ravel())[0, 1]),
                "amp_ratio": float(pf.std() / max(gf.std(), 1e-12)),
                "rel_mean_field": float(((pm - gm) ** 2).mean() / den),
                "rel_oscillation": float(
                    (((pf - pm) - (gf - gm)) ** 2).mean() / den),
                "gt_osc_fraction": float((gf - gm).std() / max(gf.std(), 1e-12)),
            }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rollout_dir")
    ap.add_argument("--steps", type=int, default=50,
                    help="leading timesteps to analyse (early steps isolate "
                         "one-step head quality from autoregressive drift)")
    ap.add_argument("--structure", action="store_true",
                    help="also split the gauge-free error into time-mean "
                         "field vs oscillation parts")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    if args.structure:
        res = structure(args.rollout_dir)
        if args.json:
            print(json.dumps(res, indent=1))
        else:
            print(f"{'mesh':<10} {'corr':>6} {'amp':>6} {'mean-field':>11} "
                  f"{'oscillation':>12} {'gt osc frac':>12}")
            for mesh, r in res.items():
                print(f"{mesh:<10} {r['corr']:>6.3f} {r['amp_ratio']:>6.2f} "
                      f"{r['rel_mean_field']:>11.4f} "
                      f"{r['rel_oscillation']:>12.4f} "
                      f"{r['gt_osc_fraction']:>12.2f}")
        return

    res = decompose(args.rollout_dir, args.steps)
    if args.json:
        print(json.dumps(res, indent=1))
        return
    print(f"{'mesh':<10} {'rel_total':>10} {'mean-part':>10} {'fluct-part':>11} "
          f"{'gt mean':>9} {'gt std':>9}")
    for mesh, r in res.items():
        flag = "  << mean-dominated" if r["rel_spatial_mean"] > r["rel_fluctuation"] else ""
        print(f"{mesh:<10} {r['rel_total']:>10.4f} {r['rel_spatial_mean']:>10.4f} "
              f"{r['rel_fluctuation']:>11.4f} {r['gt_mean']:>9.4f} {r['gt_std']:>9.4f}{flag}")


if __name__ == "__main__":
    main()
