"""Benchmark: autoregressive rollout throughput on cylinder-channel meshes.

Tracked metric (BASELINE.json): rollout timesteps/sec/chip with the reference's
shipped workload shape — FluxD-sized model (hidden 128, 15 message-passing
steps, reference config/train.json:30-33), 600-step rollout. Two tracked scale
points (VERDICT item 9):

* ~3.5k cells (DeepMind cylinder-flow scale), aggregation="auto" — the
  headline number; baseline target 600 steps < 1 s on one TPU v5e chip.
* ~14k cells (production mesh scale), aggregation="auto".

``auto`` resolves to the chunked fused Pallas kernels for rollout on TPU
(PERF.md round 3: they beat the XLA banded path at every measured size);
pass --aggregation banded to track the XLA path.

Prints ONE JSON line; the headline entry's fields are top-level, the
production-scale entry rides under ``detail.production_scale``.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_rollout_bench(model_name: str, hidden: int, mp_num: int, steps: int,
                      n_points: int, aggregation: str, dtype: str,
                      banded_dtype, repeats: int) -> dict:
    from gnn_fluid_dynamics_tpu.data.pipeline import (MeshDataset, Trajectory,
                                                      rollout_batch)
    from gnn_fluid_dynamics_tpu.data.synthetic import (channel_flow_trajectory,
                                                       make_geometry)
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig, feature_masks
    from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator
    from gnn_fluid_dynamics_tpu.rollout.engine import RolloutConfig, rollout_scan
    from gnn_fluid_dynamics_tpu.graph import to_static_bands

    geom = make_geometry("cylinder", n_points=n_points, seed=0)
    if aggregation in ("banded", "pallas", "auto"):
        # RCM relabeling narrows the aggregation bands (ops/reorder.py)
        from gnn_fluid_dynamics_tpu.ops.reorder import rcm_reorder_geometry
        geom = rcm_reorder_geometry(geom)
    n_cells = geom["cell_pos"].shape[0]
    fields = channel_flow_trajectory(geom, num_timesteps=4, dt=0.01)
    traj = Trajectory(mesh_id="mesh_0", geom=geom, fields=fields)
    ds = MeshDataset([traj], pad_multiple=256,
                     with_incidence=aggregation == "gather",
                     with_banded=aggregation in ("banded", "pallas", "auto"),
                     banded_dtype=banded_dtype or dtype)

    loss_weights = {"continuity": 0.0, "cell_velocity_change": 10.0,
                    "cell_pressure": 1.0, "face_velocity": 1.0,
                    "face_flux": 1.0, "face_pressure": 1.0}
    model = get_model_class(model_name)(
        ModelConfig(name=model_name, hidden_width=hidden,
                    mp_num=mp_num, aggregation=aggregation,
                    compute_dtype=dtype),
        loss_weights=loss_weights)

    graph = to_static_bands(ds.get_batch(rollout_batch(ds)))
    _, feats = model.transform_rollout(graph)
    acc = StatsAccumulator(model.nmap)
    acc.update(feats, feature_masks(graph, feats))
    model.set_stats(acc.finalize())
    variables = model.init(jax.random.PRNGKey(0), graph, feats)

    cfg = RolloutConfig(num_steps=steps, compute_error=False,
                        save_fields=False)

    run = jax.jit(lambda v, g, f: rollout_scan(model, v, g, f, None, None, cfg))

    # warmup/compile
    t0 = time.time()
    errors, out_fields = run(variables, graph, feats)
    jax.block_until_ready((errors, out_fields))
    compile_time = time.time() - t0

    times = []
    for _ in range(repeats):
        t0 = time.time()
        res = run(variables, graph, feats)
        jax.block_until_ready(res)
        times.append(time.time() - t0)
    best = min(times)
    steps_per_sec = steps / best

    return {
        "value": round(steps_per_sec, 1),
        "model": model_name, "hidden": hidden, "mp_num": mp_num,
        "cells": int(n_cells), "padded_cells": int(graph.num_cells),
        "steps": steps, "rollout_wall_s": round(best, 4),
        "compile_s": round(compile_time, 1),
        "aggregation": aggregation, "dtype": dtype,
        "device": str(jax.devices()[0]),
    }


def main():
    # persistent XLA compilation cache (same wiring as training/train.py and
    # rollout/run.py): first bench on a fresh process pays ~8 s / ~20 s
    # compile at the two scale points; warm runs load from the cache
    try:
        import os
        cache_dir = os.environ.get("GFD_JAX_CACHE",
                                   os.path.expanduser("~/.cache/gfd_jax"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--mp-num", type=int, default=15)
    parser.add_argument("--model", type=str, default="FluxD")
    parser.add_argument("--n-points", type=int, default=2400)
    parser.add_argument("--aggregation", type=str, default="auto",
                        choices=["segment", "gather", "banded", "pallas", "auto"])
    parser.add_argument("--banded-dtype", type=str, default=None,
                        help="table storage dtype (default: --dtype; "
                             "'int8' for the pallas backend)")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--single", action="store_true",
                        help="run only the configured point (skip the "
                             "production-scale second entry)")
    parser.add_argument("--production-points", type=int, default=9700,
                        help="mesh generator points for the ~14k-cell entry")
    args = parser.parse_args()

    head = run_rollout_bench(args.model, args.hidden, args.mp_num, args.steps,
                             args.n_points, args.aggregation, args.dtype,
                             args.banded_dtype, args.repeats)

    detail = {k: v for k, v in head.items() if k != "value"}
    if not args.single:
        # second tracked point: ~14k cells through aggregation="auto"
        # (resolves to the fused Pallas backend on TPU past the measured
        # crossover, PERF.md) — int8 tables, the Pallas path's native storage
        try:
            prod = run_rollout_bench(
                args.model, args.hidden, args.mp_num, args.steps,
                args.production_points, "auto", args.dtype, "int8",
                args.repeats)
            prod["metric"] = "rollout_steps_per_sec_14k_cells"
            detail["production_scale"] = prod
        except Exception as e:   # the headline number must still print
            detail["production_scale"] = {"error": repr(e)}

    print(json.dumps({
        "metric": "rollout_timesteps_per_sec_per_chip",
        "value": head["value"],
        "unit": "steps/s",
        "vs_baseline": round(head["value"] / 600.0, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
