"""Probe: wall-clock breakdown of the scan-fused training path.

Measures, at the flagship FluxD shape on whatever backend is active:
  * batched-graph (geometry + banded tables) build + transfer per mesh combo
  * field-stack host assembly and host->device transfer per fused call
  * fused 16-step call device time (steady state, after compile)

    python scripts/probe_fused_timing.py [n_meshes] [steps_per_call]
"""
import sys
import time

import jax
import numpy as np

from gnn_fluid_dynamics_tpu.data.hdf5 import load_dataset
from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, compute_window
from gnn_fluid_dynamics_tpu.models import get_model_class
from gnn_fluid_dynamics_tpu.models.base import ModelConfig
from gnn_fluid_dynamics_tpu.training.config import load_config
from gnn_fluid_dynamics_tpu.training.trainer import Trainer


def t(label, fn, n=1):
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") or isinstance(out, jax.Array) else None
    dt = (time.time() - t0) / n
    print(f"{label:>42}: {dt*1e3:9.1f} ms")
    return out, dt


def main():
    n_meshes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spc = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    config = load_config("config/e2e/fluxd-r3.json")
    config.dataset.dpath = "/root/data/perf/h5_fake"
    config.dataset.stats_fpath = "/root/data/perf/stats-fake.json"
    config.dataset.stats_recompute = True
    config.training.data_sim_limit = n_meshes
    config.logging.is_debug = True

    model_cls = get_model_class(config.model.name)
    model = model_cls(
        ModelConfig(name=config.model.name,
                    hidden_width=config.model.hidden_width,
                    mp_num=config.model.mp_num,
                    aggregation=config.model.aggregation,
                    compute_dtype=config.model.compute_dtype,
                    scale_init=config.model.scale_init,
                    integrator_detach=tuple(config.model.integrator_detach),
                    pushforward=config.model.pushforward),
        loss_weights=config.training.loss_weights)

    trajs = load_dataset(config.dataset.dpath + "/train.h5")[:n_meshes]
    # RCM relabeling exactly as build_datasets applies it — without this the
    # banded tables are ~10x wider and nothing here is representative
    from gnn_fluid_dynamics_tpu.ops.reorder import (rcm_reorder_geometry,
                                                    reorder_fields)
    for tr in trajs:
        new_geom = rcm_reorder_geometry(tr.geom)
        tr.fields = reorder_fields(tr.fields, tr.geom, new_geom)
        tr.geom = new_geom
    stride, window = compute_window(None, config.training.pushforward_factor,
                                    None)
    ds = MeshDataset(trajs, stride=stride, data_window=window,
                     with_banded=True, banded_dtype="bfloat16")
    from gnn_fluid_dynamics_tpu.training.train import compute_stats, set_noise_std
    # stats over a truncated sample map — this probe only needs plausible
    # normalization, not converged statistics
    stats_ds = MeshDataset(trajs, stride=stride, data_window=window,
                           timestep_range=(0, 10))
    stats = compute_stats(config, model, stats_ds)
    model.set_stats(stats)
    set_noise_std(config, stats)

    bs = config.training.batch_size
    mesh_ids_a = sorted(ds.sim_ids()[:bs])
    mesh_ids_b = sorted(ds.sim_ids()[bs:2 * bs])
    print(f"combo A = {mesh_ids_a}\ncombo B = {mesh_ids_b}")

    # --- combo build cost (graph + banded tables + transfer) ---
    (ga, _), _ = t("combo A build (cold)", lambda: (ds._batched_static(tuple(mesh_ids_a)), 0))
    t("combo A build (cached)", lambda: (ds._batched_static(tuple(mesh_ids_a)), 0))
    t("combo B build (cold)", lambda: (ds._batched_static(tuple(mesh_ids_b)), 0))

    # --- field-stack assembly + transfer ---
    batches_a = [[(m, ts + j) for m in mesh_ids_a] for j, ts in
                 enumerate([10] * spc)]
    (g, stack), _ = t("field stack assemble+transfer (16 steps)",
                      lambda: ds.get_batch_stack(batches_a))
    jax.block_until_ready(stack)
    t("field stack again",
      lambda: jax.block_until_ready(ds.get_batch_stack(batches_a)[1]))

    # --- fused train call ---
    trainer = Trainer(config, model)
    graph0 = ds.get_batch(batches_a[0])
    _, feats0 = model.transform_rollout(graph0)
    state = trainer.init_state(jax.random.PRNGKey(0), graph0, feats0)
    trainer.epoch_count = 100          # past warmup -> pushforward step
    lrs = np.full((spc,), 1e-4, np.float32)

    t0 = time.time()
    state, losses = trainer.train_step_multi(state, g, stack, lrs)
    jax.block_until_ready(losses)
    print(f"{'fused call compile+run':>42}: {(time.time()-t0)*1e3:9.1f} ms")
    for _ in range(2):
        t0 = time.time()
        state, losses = trainer.train_step_multi(state, g, stack, lrs)
        jax.block_until_ready(losses)
        print(f"{'fused call steady ('+str(spc)+' steps)':>42}: "
              f"{(time.time()-t0)*1e3:9.1f} ms"
              f"  ({(time.time()-t0)*1e3/spc:6.1f} ms/step)")

    # --- end-to-end mini loop: 2 chunks x 3 calls with prefetch ---
    from gnn_fluid_dynamics_tpu.data.pipeline import prefetch_grouped

    def batch_iter():
        for ids in (mesh_ids_a, mesh_ids_b):
            for c in range(3):
                for j in range(spc):
                    pass
            for c in range(3):
                yield from ()
    # simpler: hand-build the sample batches
    all_batches = []
    for ids in (mesh_ids_a, mesh_ids_b):
        for c in range(3):
            for j in range(spc):
                all_batches.append([(m, 20 + c * spc + j) for m in ids])
    t0 = time.time()
    n_steps = 0
    for item in prefetch_grouped(iter(all_batches), ds, spc, size=2):
        if item[0] == "multi":
            _, gg, st = item
            state, losses = trainer.train_step_multi(
                state, gg, st, lrs)
            n_steps += spc
        else:
            state, losses = trainer.train_step(state, item[1], 1e-4)
            n_steps += 1
    jax.block_until_ready(losses)
    dt = time.time() - t0
    print(f"{'end-to-end 2 combos x 3 calls':>42}: {dt*1e3:9.1f} ms"
          f"  ({dt*1e3/n_steps:6.1f} ms/step)")

    # --- device-resident indexed path ---
    from gnn_fluid_dynamics_tpu.data.pipeline import prefetch_indexed
    t("device_fields transfer (combo A)",
      lambda: jax.block_until_ready(
          ds.device_fields(tuple(mesh_ids_a))["cell_velocity"]))
    for rep in range(2):
        t0 = time.time()
        n_steps = 0
        for item in prefetch_indexed(iter(all_batches), ds, spc):
            _, gg, dev, ts = item
            state, losses = trainer.train_step_indexed(
                state, gg, dev, ts, np.full((ts.shape[0],), 1e-4),
                ds.data_window)
            n_steps += ts.shape[0]
        jax.block_until_ready(losses)
        dt = time.time() - t0
        tag = "indexed e2e (compile)" if rep == 0 else "indexed e2e (steady)"
        print(f"{tag:>42}: {dt*1e3:9.1f} ms  ({dt*1e3/n_steps:6.1f} ms/step)")


if __name__ == "__main__":
    main()
