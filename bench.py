"""Benchmark: autoregressive rollout throughput on a cylinder-channel mesh.

Tracked metric (BASELINE.json): rollout timesteps/sec/chip with the reference's
shipped workload shape — FluxD-sized model (hidden 128, 15 message-passing
steps, reference config/train.json:30-33) on a ~cylinder-flow-scale mesh,
600-step rollout. Baseline target: 600 steps in < 1 s on one TPU v5e chip,
i.e. 600 steps/s; ``vs_baseline`` = achieved steps/s / 600.

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--mp-num", type=int, default=15)
    parser.add_argument("--model", type=str, default="FluxD")
    parser.add_argument("--n-points", type=int, default=2400)
    parser.add_argument("--aggregation", type=str, default="banded",
                        choices=["segment", "gather", "banded", "pallas", "auto"])
    parser.add_argument("--banded-dtype", type=str, default=None,
                        help="table storage dtype (default: --dtype; "
                             "'int8' for the pallas backend)")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--repeats", type=int, default=2)
    args = parser.parse_args()

    from gnn_fluid_dynamics_tpu.data.pipeline import (MeshDataset, Trajectory,
                                                      rollout_batch)
    from gnn_fluid_dynamics_tpu.data.synthetic import (channel_flow_trajectory,
                                                       make_geometry)
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig
    from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator
    from gnn_fluid_dynamics_tpu.rollout.engine import RolloutConfig, rollout_scan

    # cylinder-in-channel mesh at DeepMind cylinder-flow scale (~3.5k cells)
    geom = make_geometry("cylinder", n_points=args.n_points, seed=0)
    if args.aggregation in ("banded", "pallas", "auto"):
        # RCM relabeling narrows the aggregation bands (ops/reorder.py)
        from gnn_fluid_dynamics_tpu.ops.reorder import rcm_reorder_geometry
        geom = rcm_reorder_geometry(geom)
    n_cells = geom["cell_pos"].shape[0]
    fields = channel_flow_trajectory(geom, num_timesteps=4, dt=0.01)
    traj = Trajectory(mesh_id="mesh_0", geom=geom, fields=fields)
    ds = MeshDataset([traj], pad_multiple=256,
                     with_incidence=args.aggregation == "gather",
                     with_banded=args.aggregation in ("banded", "pallas", "auto"),
                     banded_dtype=args.banded_dtype or args.dtype)

    loss_weights = {"continuity": 0.0, "cell_velocity_change": 10.0,
                    "cell_pressure": 1.0, "face_velocity": 1.0,
                    "face_flux": 1.0, "face_pressure": 1.0}
    model = get_model_class(args.model)(
        ModelConfig(name=args.model, hidden_width=args.hidden,
                    mp_num=args.mp_num, aggregation=args.aggregation,
                    compute_dtype=args.dtype),
        loss_weights=loss_weights)

    from gnn_fluid_dynamics_tpu.graph import to_static_bands
    graph = to_static_bands(ds.get_batch(rollout_batch(ds)))
    _, feats = model.transform_rollout(graph)
    acc = StatsAccumulator(model.nmap)
    from gnn_fluid_dynamics_tpu.models.base import feature_masks
    acc.update(feats, feature_masks(graph, feats))
    model.set_stats(acc.finalize())
    variables = model.init(jax.random.PRNGKey(0), graph, feats)

    cfg = RolloutConfig(num_steps=args.steps, compute_error=False,
                        save_fields=False)

    run = jax.jit(lambda v, g, f: rollout_scan(model, v, g, f, None, None, cfg))

    # warmup/compile
    t0 = time.time()
    errors, out_fields = run(variables, graph, feats)
    jax.block_until_ready((errors, out_fields))
    compile_time = time.time() - t0

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        res = run(variables, graph, feats)
        jax.block_until_ready(res)
        times.append(time.time() - t0)
    best = min(times)
    steps_per_sec = args.steps / best

    print(json.dumps({
        "metric": "rollout_timesteps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 600.0, 3),
        "detail": {
            "model": args.model, "hidden": args.hidden, "mp_num": args.mp_num,
            "cells": int(n_cells), "padded_cells": int(graph.num_cells),
            "steps": args.steps, "rollout_wall_s": round(best, 4),
            "compile_s": round(compile_time, 1),
            "aggregation": args.aggregation, "dtype": args.dtype,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
