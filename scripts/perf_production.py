"""Production-scale (~14k cells) rollout performance: backend sweep, xplane
trace capture, and the analytic memory-bound floor (VERDICT r2 item 7).

The floor model extends PERF.md's 3.5k-cell analysis to arbitrary mesh size:
every banded aggregation is ``out[tile] = S[tile] @ band(tile)`` so its HBM
traffic is (a) the one-hot table in storage dtype, (b) the source band rows,
(c) the written targets; the MLPs add one read+write of their activations
(weights are resident and reused across steps, amortized to zero).  Compute
time is the MXU matmul FLOPs at the chip's bf16 peak.  The floor is
``max(bytes / BW, flops / peak)`` per step — a rollout step cannot beat the
slower of the two.

Usage:
  python scripts/perf_production.py --floor                 # CPU-only math
  python scripts/perf_production.py --sweep                 # TPU backends
  python scripts/perf_production.py --trace runs/perf/tr14k # xplane capture
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# v5e-ish single-chip characteristics (scaling-book numbers)
HBM_GBPS = 819e9
BF16_FLOPS = 197e12


def build_production_graph(n_points: int, aggregation: str = "banded",
                           banded_dtype: str = "bfloat16"):
    from gnn_fluid_dynamics_tpu.data.pipeline import (MeshDataset, Trajectory,
                                                      rollout_batch)
    from gnn_fluid_dynamics_tpu.data.synthetic import (
        channel_flow_trajectory, make_geometry)
    from gnn_fluid_dynamics_tpu.graph import to_static_bands
    from gnn_fluid_dynamics_tpu.ops.reorder import rcm_reorder_geometry

    geom = rcm_reorder_geometry(make_geometry("cylinder", n_points=n_points,
                                              seed=0))
    fields = channel_flow_trajectory(geom, num_timesteps=4, dt=0.01)
    ds = MeshDataset([Trajectory(mesh_id="m", geom=geom, fields=fields)],
                     pad_multiple=256, with_banded=True,
                     banded_dtype=banded_dtype)
    return to_static_bands(ds.get_batch(rollout_batch(ds)))


def table_bytes(onehot, table_dtype_bytes, hidden, act_bytes):
    """(table storage, band reads, target writes) bytes for one application
    of a banded (T, 128, B) one-hot table."""
    T, tile, B = onehot.shape
    store = T * tile * B * table_dtype_bytes
    reads = T * B * hidden * act_bytes
    writes = T * tile * hidden * act_bytes
    return store, reads, writes


def analytic_floor(n_points: int, hidden: int, mp_num: int,
                   table_dtype_bytes: int = 2, act_bytes: int = 2,
                   verbose: bool = True) -> dict:
    g = build_production_graph(n_points,
                               banded_dtype=("int8" if table_dtype_bytes == 1
                                             else "bfloat16"))
    C, F, V = int(g.num_cells), int(g.num_faces), int(g.num_vertices)
    H = hidden

    # --- per-block aggregation traffic (arch.py: twice-MP cell block reads
    # hv (edges->vertices, 2F sources, H/2 wide) then vc (vertices->cells);
    # face block gathers owner/neighbour cells via cf_row/cf_col)
    hv = table_bytes(np.asarray(g.hv_onehot), table_dtype_bytes, H // 2,
                     act_bytes)
    vc = table_bytes(np.asarray(g.vc_onehot), table_dtype_bytes, H // 2,
                     act_bytes)
    cfr = table_bytes(np.asarray(g.cf_row_onehot), table_dtype_bytes, H,
                      act_bytes)
    cfc = table_bytes(np.asarray(g.cf_col_onehot), table_dtype_bytes, H,
                      act_bytes)
    agg_bytes = sum(hv) + sum(vc) + sum(cfr) + sum(cfc)
    # index-built Pallas kernels: table storage never leaves HBM (the one-hot
    # is rebuilt on-chip from ~KB of indices); the shared-band dual kernels
    # also read the cf band once for owner+neighbour
    agg_bytes_idx = (hv[1] + hv[2]) + (vc[1] + vc[2]) + \
        (cfr[1] + cfr[2] + cfc[2])

    # --- per-block MLP activation traffic: face mlp reads (F,3H) writes
    # (F,H); cell mlp reads (C,1.5H) writes (C,H); residuals read+write
    mlp_bytes = (F * 4 * H + C * 2.5 * H + 2 * (F + C) * 2 * H) * act_bytes

    per_block = agg_bytes + mlp_bytes
    # --- encoder/decoder + integrator (fc3 selector table over ~8 face
    # scalars + cell writes), small next to 15 blocks
    if g.fc3_onehot is not None:
        fc3 = table_bytes(np.asarray(g.fc3_onehot), table_dtype_bytes, 8, 4)
    else:
        fc3 = (0, 0, 0)
    fixed = (F * 2 * H + C * 2 * H) * act_bytes + sum(fc3)

    total_bytes = mp_num * per_block + fixed

    # --- MXU flops: MLP matmuls (2 flops/MAC) + banded einsum contractions
    mlp_flops = 2 * (F * (3 * H + H + H) * H + C * (1.5 * H + H + H) * H)
    agg_flops = 0
    for oh, width in ((g.hv_onehot, H // 2), (g.vc_onehot, H // 2),
                      (g.cf_row_onehot, H), (g.cf_col_onehot, H)):
        T, tile, B = oh.shape
        agg_flops += 2 * T * tile * B * width
    total_flops = mp_num * (mlp_flops + agg_flops) + 2 * (F * 2 * H * H
                                                          + C * 2 * H * H)

    total_bytes_idx = mp_num * (agg_bytes_idx + mlp_bytes) + fixed

    t_mem = total_bytes / HBM_GBPS
    t_mxu = total_flops / BF16_FLOPS
    floor_s = max(t_mem, t_mxu)
    floor_idx_s = max(total_bytes_idx / HBM_GBPS, t_mxu)
    out = {
        "cells": C, "faces": F, "vertices": V, "hidden": H, "mp_num": mp_num,
        "bytes_per_step": int(total_bytes),
        "flops_per_step": int(total_flops),
        "t_mem_ms": round(t_mem * 1e3, 3),
        "t_mxu_ms": round(t_mxu * 1e3, 3),
        "floor_steps_per_sec": round(1.0 / floor_s, 1),
        "floor_steps_per_sec_idx": round(1.0 / floor_idx_s, 1),
        "bytes_per_step_idx": int(total_bytes_idx),
        "bound": "memory" if t_mem >= t_mxu else "mxu",
        "table_shapes": {
            "hv": list(g.hv_onehot.shape),
            "vc": list(g.vc_onehot.shape),
            "cf": list(g.cf_row_onehot.shape),
            "fc3": (list(g.fc3_onehot.shape)
                    if g.fc3_onehot is not None else None),
        },
        "traffic_mb_per_block": {
            "agg": round(agg_bytes / 1e6, 2),
            "mlp": round(mlp_bytes / 1e6, 2),
        },
    }
    if verbose:
        print(json.dumps(out, indent=2))
    return out


def sweep(n_points: int, hidden: int, mp_num: int, steps: int,
          repeats: int) -> list:
    import bench
    rows = []
    for label, aggregation, bdt, dense in (
            ("pallas-idx", "pallas", "int8", False),
            ("pallas-dense", "pallas", "int8", True),
            ("banded-bf16", "banded", "bfloat16", False),
            ("banded-int8", "banded", "int8", False)):
        try:
            if dense:
                os.environ["GFD_PALLAS_DENSE"] = "1"
            r = bench.run_rollout_bench("FluxD", hidden, mp_num, steps,
                                        n_points, aggregation, "bfloat16",
                                        bdt, repeats)
            r["banded_dtype"] = bdt
            r["variant"] = label
            rows.append(r)
            print(json.dumps(r), flush=True)
        except Exception as e:     # keep sweeping past a failing backend
            print(json.dumps({"variant": label, "error": repr(e)}),
                  flush=True)
        finally:
            os.environ.pop("GFD_PALLAS_DENSE", None)
    return rows


def capture_trace(logdir: str, n_points: int, hidden: int, mp_num: int,
                  steps: int, aggregation: str, banded_dtype: str):
    import jax
    import bench
    from gnn_fluid_dynamics_tpu.training.profiling import trace
    # bench builds everything; run once to compile, then trace a short run
    r = bench.run_rollout_bench("FluxD", hidden, mp_num, steps, n_points,
                                aggregation, "bfloat16", banded_dtype, 1)
    print(json.dumps(r))
    with trace(logdir):
        bench.run_rollout_bench("FluxD", hidden, mp_num, steps, n_points,
                                aggregation, "bfloat16", banded_dtype, 1)
    print(f"trace written to {logdir}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-points", type=int, default=9700)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--mp-num", type=int, default=15)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--floor", action="store_true")
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--aggregation", type=str, default="pallas")
    p.add_argument("--banded-dtype", type=str, default="int8")
    args = p.parse_args()

    if args.floor and not (args.sweep or args.trace):
        # pure table math — keep it off the (possibly busy) TPU; a
        # sitecustomize may force the TPU backend past JAX_PLATFORMS
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.floor:
        analytic_floor(args.n_points, args.hidden, args.mp_num)
    if args.sweep:
        sweep(args.n_points, args.hidden, args.mp_num, args.steps,
              args.repeats)
    if args.trace:
        capture_trace(args.trace, args.n_points, args.hidden, args.mp_num,
                      min(args.steps, 60), args.aggregation,
                      args.banded_dtype)


if __name__ == "__main__":
    main()
