"""Rollout CLI — counterpart of reference ``src/rollout.py main()``
(rollout.py:391-451): load the rollout config + checkpoint (adopting the
checkpoint's training config and embedded normalization stats so the rollout
is self-contained), run the full autoregressive rollout on-device, save
predictions + ground truth to HDF5, and report error metrics.

Usage::

    python -m gnn_fluid_dynamics_tpu.rollout.run --config config/rollout.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
from typing import List, Optional

import jax


def main(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--save", type=str, default="full",
                        choices=["full", "off"])
    parser.add_argument("--error", type=str, default="on",
                        choices=["on", "off"])
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args(argv)

    from gnn_fluid_dynamics_tpu.data.pipeline import rollout_batch
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig
    from gnn_fluid_dynamics_tpu.rollout.engine import (RolloutConfig,
                                                       error_summary,
                                                       rollout_scan)
    from gnn_fluid_dynamics_tpu.rollout.writer import SimulationWriter
    from gnn_fluid_dynamics_tpu.training.checkpoint import (Checkpointer,
                                                            restore_train_state)
    from gnn_fluid_dynamics_tpu.training.config import Config, load_config
    from gnn_fluid_dynamics_tpu.training.train import build_datasets
    from gnn_fluid_dynamics_tpu.training.trainer import Trainer, TrainState

    config = load_config(args.config)
    # persistent XLA compilation cache: the flagship train step compiles in
    # ~30 s; cached, repeat runs start instantly
    try:
        cache_dir = os.environ.get("GFD_JAX_CACHE",
                                   os.path.expanduser("~/.cache/gfd_jax"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


    # checkpoint: adopt its training config, keep current settings/rollout
    # (reference rollout.py:404-411)
    ckpt_path = config.model.fpath
    assert ckpt_path, "rollout requires model.fpath pointing at a checkpoint"
    ckpt_dir = os.path.dirname(ckpt_path.rstrip("/"))
    which = os.path.basename(ckpt_path.rstrip("/"))
    checkpointer = Checkpointer(ckpt_dir)
    _, meta = checkpointer.load(which if which in ("latest", "best")
                                else ckpt_path)
    assert meta is not None, f"no checkpoint at {ckpt_path}"
    train_config = Config.from_dict(meta["config"])
    train_config.settings = config.settings
    train_config.rollout = config.rollout
    train_config.dataset.dpath = config.dataset.dpath or train_config.dataset.dpath
    # rollout-config logging wins when set (reference rollout.py:71-73)
    for field in ("project", "group", "name", "notes"):
        val = getattr(config.logging, field)
        if val:
            setattr(train_config.logging, field, val)
    config = train_config

    model_cls = get_model_class(config.model.name)
    model = model_cls(
        ModelConfig(name=config.model.name,
                    hidden_width=config.model.hidden_width,
                    mp_num=config.model.mp_num,
                    cell_grad_weights_order=config.model.cell_grad_weights_order,
                    face_grad_weights_order=config.model.face_grad_weights_order,
                    timestep_stride=config.model.timestep_stride,
                    bundle_size=config.model.bundle_size,
                    aggregation=config.model.aggregation,
                    compute_dtype=config.model.compute_dtype,
                    scale_init=config.model.scale_init,
                    integrator_detach=tuple(config.model.integrator_detach),
                    pushforward=config.model.pushforward),
        loss_weights=config.training.loss_weights)
    model.set_stats(meta["stats"])      # stats come from the checkpoint

    _, valid_ds = build_datasets(config, model_cls, splits=("valid",))
    sim_ids = valid_ds.sim_ids()

    # restore parameters
    from gnn_fluid_dynamics_tpu.graph import to_static_bands
    graph = to_static_bands(valid_ds.get_batch(rollout_batch(valid_ds)))
    _, feats = model.transform_rollout(graph)
    trainer = Trainer(config, model)
    state0 = trainer.init_state(jax.random.PRNGKey(0), graph, feats)
    tree, _ = checkpointer.load(
        which if which in ("latest", "best") else ckpt_path,
        template={"params": state0.params, "batch_stats": state0.batch_stats,
                  "opt_state": state0.opt_state, "step": state0.step,
                  "rng": state0.rng})
    state = restore_train_state(tree, TrainState)

    t0_range = config.rollout.data_timestep_range or list(valid_ds.timestep_range)
    num_steps = max(1, (t0_range[1] - t0_range[0] - 1) // valid_ds.stride)
    compute_error = args.error == "on"
    gt_v = gt_p = None
    gt_fields = {}
    if compute_error or args.save == "full":
        # full save also records face velocity/pressure/flux ground truth
        # (reference simulation_data.py:96-211)
        keys = (("cell_velocity", "cell_pressure", "face_velocity",
                 "face_pressure", "face_flux") if args.save == "full"
                else ("cell_velocity", "cell_pressure"))
        gt_fields = valid_ds.trajectory_fields(sim_ids, t0_range[0],
                                               num_steps, keys=keys)
        gt_v = jax.numpy.asarray(gt_fields["cell_velocity"])
        gt_p = jax.numpy.asarray(gt_fields["cell_pressure"])

    print(f"\nRollout started... ({num_steps} steps x {len(sim_ids)} sims)")
    start = time.time()
    cfg = RolloutConfig(num_steps=num_steps, compute_error=compute_error,
                        save_fields=args.save == "full",
                        save_frequency=config.rollout.save_frequency)
    errors, fields = rollout_scan(model, state.variables, graph, feats,
                                  gt_v, gt_p, cfg)
    jax.block_until_ready(fields.get("final_cell_state"))
    elapsed = time.time() - start
    print(f"Rollout complete in t = {elapsed:.3f} s "
          f"({num_steps / elapsed:.1f} steps/s)")

    out_dir = os.path.join("rollouts", config.logging.project or "default",
                           args.output or config.logging.name or "rollout")
    os.makedirs(out_dir, exist_ok=True)

    if compute_error:
        scalars, evo = error_summary(errors, sim_ids)
        with open(os.path.join(out_dir, "errors.json"), "w") as f:
            json.dump({"scalar": scalars, "evolution": evo}, f, indent=2)
        for key in ("velocity_error", "pressure_error", "divergence_error"):
            if key in scalars:
                print(f"{key} mean_all: {scalars[key]['mean_all']:.4e}")

    if args.save == "full":
        writer = SimulationWriter(os.path.join(out_dir, "data0.h5"),
                                  valid_ds, sim_ids)
        timesteps = [t0_range[0] + (i + 1) * valid_ds.stride
                     for i in range(num_steps)]
        writer.write_fields(
            {k: v for k, v in fields.items() if k != "final_cell_state"},
            timesteps,
            ground_truth=gt_fields,
            save_frequency=config.rollout.save_frequency)
        writer.close(meta={"model": ckpt_path,
                           "dataset": config.dataset.dpath,
                           "subset": config.rollout.data_subset,
                           "timerange": t0_range,
                           "meshes": {"data0": sim_ids},
                           "run_time": elapsed},
                     meta_path=os.path.join(out_dir, "meta.json"))
        print(f"Saved rollout to {out_dir}/data0.h5")


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        print("\nRollout stopped by keyboard interrupt.")
        sys.exit(1)
    except Exception as e:
        print(f"\nRollout failed: {e}")
        traceback.print_exc()
        sys.exit(1)
