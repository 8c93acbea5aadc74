"""Probe: where does training wall-clock go on the tunneled TPU?

Breaks one training epoch's inner loop into host batch assembly,
host->device transfer, and device step compute. Run from repo root:

    python scripts/probe_train_timing.py config/e2e/fluxd-final.json [n_steps]
"""
import json
import sys
import time

import jax
import numpy as np

from gnn_fluid_dynamics_tpu.models import get_model_class
from gnn_fluid_dynamics_tpu.models.base import ModelConfig
from gnn_fluid_dynamics_tpu.training.config import load_config
from gnn_fluid_dynamics_tpu.training.train import (build_datasets,
                                                   compute_stats,
                                                   set_noise_std)
from gnn_fluid_dynamics_tpu.training.trainer import Trainer


def main():
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "config/e2e/fluxd-final.json"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    config = load_config(cfg_path)
    config.logging.is_debug = True

    model_cls = get_model_class(config.model.name)
    model = model_cls(
        ModelConfig(name=config.model.name,
                    hidden_width=config.model.hidden_width,
                    mp_num=config.model.mp_num,
                    timestep_stride=config.model.timestep_stride,
                    bundle_size=config.model.bundle_size,
                    aggregation=config.model.aggregation,
                    compute_dtype=config.model.compute_dtype,
                    scale_init=config.model.scale_init,
                    integrator_detach=tuple(config.model.integrator_detach),
                    pushforward=config.model.pushforward),
        loss_weights=config.training.loss_weights)
    train_ds, _ = build_datasets(config, model_cls)
    stats = compute_stats(config, model, train_ds)
    model.set_stats(stats)
    set_noise_std(config, stats)

    trainer = Trainer(config, model)
    bs = config.training.batch_size
    rng = np.random.default_rng(0)
    graph0 = train_ds.get_batch(train_ds.sample_map[:bs])
    _, feats0 = model.transform_rollout(graph0)
    state = trainer.init_state(jax.random.PRNGKey(0), graph0, feats0)
    trainer.epoch_count = 100  # past warmup: measure the pf step

    # random multi-mesh batches like the real sampler
    samples = list(train_ds.sample_map)
    rng.shuffle(samples)
    batches = [samples[i * bs:(i + 1) * bs] for i in range(n_steps + 2)]

    # compile
    t0 = time.time()
    state, _ = trainer.train_step(state, train_ds.get_batch(batches[0]), 1e-4)
    jax.block_until_ready(state.params)
    print(f"compile+first step: {time.time()-t0:.1f}s")

    t_host = t_step = 0.0
    # phase A: sequential (assembly then step), like an unprefetched loop
    for b in batches[1:n_steps + 1]:
        t0 = time.time()
        g = train_ds.get_batch(b)
        jax.block_until_ready(g.cell_velocity)
        t_host += time.time() - t0
        t0 = time.time()
        state, losses = trainer.train_step(state, g, 1e-4)
        jax.block_until_ready(state.params)
        t_step += time.time() - t0
    print(f"sequential: host assembly+transfer {t_host/n_steps*1e3:.1f} ms/step, "
          f"device step {t_step/n_steps*1e3:.1f} ms/step, "
          f"total {(t_host+t_step)/n_steps*1e3:.1f} ms/step "
          f"= {n_steps/(t_host+t_step):.2f} steps/s")

    # phase B: the real loop (prefetch thread), deferred loss fetch
    from gnn_fluid_dynamics_tpu.data.pipeline import prefetch
    def sample_iter():
        for b in batches[1:n_steps + 1]:
            yield b
    t0 = time.time()
    pend = []
    for g in prefetch(sample_iter(), train_ds, size=config.training.prefetch_buffer):
        state, losses = trainer.train_step(state, g, 1e-4)
        pend.append(losses)
    jax.block_until_ready(state.params)
    wall = time.time() - t0
    print(f"prefetched:  {wall/n_steps*1e3:.1f} ms/step = {n_steps/wall:.2f} steps/s")
    print(json.dumps({"host_ms": t_host/n_steps*1e3,
                      "device_ms": t_step/n_steps*1e3,
                      "prefetched_ms": wall/n_steps*1e3}))


if __name__ == "__main__":
    main()
