"""Training CLI — the counterpart of reference ``src/train.py main()``
(train.py:318-470): config load, optional resume, dataset + stats setup, model
construction, optimizer/scheduler, validator wiring, and the Trainer loop.

Usage::

    python -m gnn_fluid_dynamics_tpu.training.train --config config/train.json
    python -m gnn_fluid_dynamics_tpu.training.train --config ... --resume latest
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback
from typing import List, Optional

import jax
import numpy as np


def build_datasets(config, model_cls, splits=("train", "valid")):
    """Dataset construction for train + valid splits. ``dataset.module``
    selects the source: 'synthetic' generates Taylor-Green trajectories
    in-process; anything else reads the reference-layout HDF5 files
    (<dpath>/<subset>.h5).

    ``splits`` limits which splits are materialised; the return is always
    ``(train_ds, valid_ds)`` with ``None`` for a skipped split. Rollout and
    diagnose only read the valid split (normalization stats come from the
    checkpoint), so evaluation-only datasets — e.g. the 676-step horizon
    sims, which have no train.h5 — pass ``splits=("valid",)``."""
    from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, compute_window

    stride, window = compute_window(config.model.timestep_stride,
                                    config.training.pushforward_factor,
                                    config.model.bundle_size)
    r_stride, r_window = compute_window(config.model.timestep_stride, None,
                                        config.model.bundle_size,
                                        mode="rollout")

    def load(subset, sim_limit, timestep_range, stride, window, sim_index=None):
        lazy = False
        if config.dataset.module == "synthetic":
            from gnn_fluid_dynamics_tpu.data.pipeline import Trajectory
            from gnn_fluid_dynamics_tpu.data.synthetic import (
                make_geometry, taylor_green_trajectory)
            n = sim_limit or 2
            T = (timestep_range[1] if timestep_range else 30) + window + 1
            trajs = []
            for i in range(n):
                geom = make_geometry("structured", nx=10 + i % 3, ny=6,
                                     jitter=0.15, seed=i)
                fields = taylor_green_trajectory(geom, num_timesteps=T,
                                                 dt=0.01)
                trajs.append(Trajectory(mesh_id=f"mesh_{i}", geom=geom,
                                        fields=fields))
        else:
            from gnn_fluid_dynamics_tpu.data.hdf5 import (load_dataset,
                                                          load_dataset_lazy)
            flux_scale = 1.0 / 0.001 if "openfoam" in config.dataset.module.lower() \
                else 1.0
            path = os.path.join(config.dataset.dpath, subset + ".h5")
            lazy = config.dataset.lazy
            if lazy is None:
                # auto: stream when the subset exceeds the cache bound
                import h5py
                with h5py.File(path, "r") as f:
                    n_avail = sum(1 for k in f if k.startswith("mesh"))
                lazy = (sim_limit or n_avail) > config.dataset.cache_meshes
            loader = load_dataset_lazy if lazy else load_dataset
            kw = ({"cache_entries": config.dataset.cache_meshes}
                  if lazy else {})
            trajs = loader(path, sim_limit=sim_limit,
                           sim_index=sim_index, flux_scale=flux_scale,
                           shuffle=config.dataset.shuffle, **kw)
        if config.model.aggregation in ("banded", "pallas", "auto"):
            # RCM relabeling narrows the aggregation bands (ops/reorder.py)
            from gnn_fluid_dynamics_tpu.data.hdf5 import (LazyGeom,
                                                          PermutedLazyArray,
                                                          TransformedLazyGeom)
            from gnn_fluid_dynamics_tpu.ops.reorder import (perms_from_pos,
                                                            rcm_reorder_geometry,
                                                            reorder_fields)
            for t in trajs:
                if isinstance(t.geom, LazyGeom):
                    # out-of-core: reorder lazily — permutations computed
                    # once (small), fields permuted on read, transformed
                    # geometry cached in the bounded store LRU
                    new_geom = rcm_reorder_geometry(
                        {k: t.geom[k] for k in t.geom.keys()})
                    cperm, fperm = perms_from_pos(t.geom, new_geom)
                    t.fields = {
                        k: PermutedLazyArray(
                            v, cperm if k.startswith("cell") else fperm)
                        for k, v in t.fields.items()}
                    t.geom = TransformedLazyGeom(t.geom,
                                                 rcm_reorder_geometry,
                                                 "__rcm__")
                else:
                    new_geom = rcm_reorder_geometry(t.geom)
                    t.fields = reorder_fields(t.fields, t.geom, new_geom)
                    t.geom = new_geom
        return MeshDataset(trajs, stride=stride, data_window=window,
                           timestep_range=timestep_range,
                           pad_multiple=config.training.pad_multiple,
                           with_incidence=config.model.aggregation == "gather",
                           with_banded=config.model.aggregation in
                           ("banded", "pallas", "auto"),
                           banded_dtype=("bfloat16"
                                         if config.model.compute_dtype
                                         == "bfloat16" else "float32"),
                           num_buckets=config.dataset.num_buckets,
                           max_cached_graphs=(config.dataset.cache_meshes
                                              if lazy else None))

    train_ds = load(config.training.data_subset,
                    config.training.data_sim_limit,
                    config.training.data_timestep_range, stride,
                    window) if "train" in splits else None
    valid_ds = load(config.rollout.data_subset, config.rollout.data_sim_limit,
                    config.rollout.data_timestep_range, r_stride, r_window,
                    sim_index=config.rollout.data_sim_index) \
        if "valid" in splits else None

    for ds in (train_ds, valid_ds):
        if ds is None:
            continue
        if model_cls.cell_grad_weights_use:
            ds.add_grad_weights("cell", config.model.cell_grad_weights_order
                                or 1)
        if model_cls.face_grad_weights_use:
            ds.add_grad_weights("face", config.model.face_grad_weights_order
                                or 1)
    return train_ds, valid_ds


def compute_stats(config, model, dataset):
    """Streaming stats accumulation with on-disk cache (reference
    ``DataSet.read_stats``, DataSet.py:314-337)."""
    from gnn_fluid_dynamics_tpu.models.normalizer import (StatsAccumulator,
                                                          load_stats,
                                                          save_stats)
    fpath = config.dataset.stats_fpath
    if fpath and os.path.exists(fpath) and not config.dataset.stats_recompute:
        cached = load_stats(fpath)
        needed = {k for k, v in model.nmap.registry.items()
                  if v.extractor is not None}
        if needed <= set(cached):
            print(f"\tstats loaded from {fpath}")
            return cached
    acc = StatsAccumulator(model.nmap)
    from gnn_fluid_dynamics_tpu.models.base import feature_masks
    # Pin accumulation to the host CPU backend: the loop is one jitted
    # transform + ~15 small device pulls per sample, and on a tunneled TPU
    # (axon) each pull is a network round-trip — 7k samples take hours on
    # device vs minutes on host. Stats are host-side dataset statistics;
    # there is nothing TPU-worthy here.
    cpu = jax.local_devices(backend="cpu")[0]
    stride = max(1, int(getattr(config.dataset, "stats_stride", 1) or 1))
    with jax.default_device(cpu):
        for i in range(0, len(dataset), stride):
            graph = dataset.get_item(i)
            _, feats = model.transform_rollout(graph)
            acc.update(feats, feature_masks(graph, feats))
    stats = acc.finalize()
    if fpath:
        os.makedirs(os.path.dirname(os.path.abspath(fpath)), exist_ok=True)
        save_stats(stats, fpath)
    return stats


def set_noise_std(config, stats):
    """noise_std = noise_std_norm * mean(|u|) (reference DataSet.py:339-342)."""
    if config.training.noise_std is None and config.training.noise_std_norm:
        # abs(): a zero-mean dataset (e.g. Taylor-Green) would otherwise give
        # a negative std, which torch would reject outright
        config.training.noise_std = abs(config.training.noise_std_norm
                                        * stats["cell_velocity_x"]["mean"])
    print("Noise std set to:", config.training.noise_std)


def warm_start_state(state, trainer, config):
    """Warm-start for TRAINING from ``model.fpath`` (reference
    train.py:333-385: ``torch.load(model.fpath)`` +
    ``load_model_state_dict_flexible``): weights merge shape-tolerantly;
    the optimizer starts fresh (the reference restores no optimizer state
    on this path either). The reference resumes the checkpoint's epoch
    counters; with ``model.warm_start_reset`` the counters stay at zero so
    a fine-tune config's own schedule applies from its beginning."""
    import jax.numpy as jnp

    from gnn_fluid_dynamics_tpu.training.checkpoint import Checkpointer
    from gnn_fluid_dynamics_tpu.training.model_loading import (
        load_params_flexible)

    wpath = config.model.fpath
    wdir = os.path.dirname(wpath.rstrip("/"))
    which = os.path.basename(wpath.rstrip("/"))
    wtree, wmeta = Checkpointer(wdir).load(
        which if which in ("latest", "best") else wpath)
    assert wmeta is not None, f"no warm-start checkpoint at {wpath}"
    merged, _ = load_params_flexible(state.params, wtree["params"])
    state = state.replace(params=jax.tree.map(jnp.asarray, merged))
    if not config.model.warm_start_reset:
        trainer.mini_epoch_count = wmeta["mini_epoch"]
        trainer.epoch_count = wmeta["epoch"]
        trainer.step_count = wmeta["step"]
        trainer.sample_count = wmeta["sample_count"]
    print(f"Warm-started params from {wpath} (checkpoint epoch "
          f"{wmeta['epoch']}, reset={config.model.warm_start_reset})")
    return state


def main(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--resume", type=str, default=None,
                        help="latest | best | path to a checkpoint dir")
    parser.add_argument("--ckpt-dir", type=str, default=None)
    args = parser.parse_args(argv)

    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig
    from gnn_fluid_dynamics_tpu.training.checkpoint import (Checkpointer,
                                                            restore_train_state)
    from gnn_fluid_dynamics_tpu.training.config import (load_config,
                                                        merge_checkpoint_config)
    from gnn_fluid_dynamics_tpu.training.logging import Logger
    from gnn_fluid_dynamics_tpu.training.trainer import Trainer, TrainState

    config = load_config(args.config)
    if args.debug:
        config.logging.is_debug = True
    if config.settings.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # persistent XLA compilation cache: the flagship train step compiles in
    # ~30 s; cached, repeat runs start instantly
    try:
        cache_dir = os.environ.get("GFD_JAX_CACHE",
                                   os.path.expanduser("~/.cache/gfd_jax"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


    ckpt_dir = args.ckpt_dir or os.path.join(
        "checkpoints", config.logging.project or "default",
        config.logging.name or config.model.name)
    checkpointer = Checkpointer(ckpt_dir,
                                save_overwrite=config.logging.save_overwrite)

    resume_meta = None
    resume_wandb_id = None
    if args.resume:
        _, resume_meta = checkpointer.load(args.resume)
        if resume_meta is not None:
            config = merge_checkpoint_config(config, resume_meta["config"])
            resume_wandb_id = resume_meta.get("wandb_id")
            print(f"Resuming from {args.resume} "
                  f"(mini_epoch {resume_meta['mini_epoch']})")

    np.random.seed(config.settings.random_seed)
    rng = jax.random.PRNGKey(config.settings.random_seed)

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
                    remat=config.model.remat,
                    scale_init=config.model.scale_init,
                    integrator_detach=tuple(config.model.integrator_detach),
                    pushforward=config.model.pushforward,
                    dropout_rate=config.training.dropout_rate),
        loss_weights=config.training.loss_weights)

    train_ds, valid_ds = build_datasets(config, model_cls)
    print(f"Train dataset: {len(train_ds)} samples over "
          f"{len(train_ds.trajectories)} meshes "
          f"(bucket {train_ds.pad_to})")

    stats = resume_meta["stats"] if (resume_meta and "stats" in resume_meta) \
        else compute_stats(config, model, train_ds)
    model.set_stats(stats)
    set_noise_std(config, stats)

    logger = None
    if not config.logging.is_debug:
        logger = Logger(config, resume_wandb_id=resume_wandb_id)
        logger.set_norm_stats(stats)

    # grad/param monitor (reference ModelMonitor, train.py:148, 258-277):
    # active whenever a logger exists, switchable via logging.use_monitor
    monitor = None
    if logger is not None and config.logging.use_monitor:
        from gnn_fluid_dynamics_tpu.training.monitoring import ModelMonitor
        monitor = ModelMonitor()

    trainer = Trainer(config, model, logger=logger, checkpointer=checkpointer,
                      monitor=monitor)
    graph0 = train_ds.get_batch(train_ds.sample_map[:config.training.batch_size])
    _, feats0 = model.transform_rollout(graph0)
    state = trainer.init_state(rng, graph0, feats0)
    print(f"Model {config.model.name}: "
          f"{model.count_parameters({'params': state.params}):,} parameters")

    if resume_meta is not None:
        tree, _ = checkpointer.load(args.resume, template={
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step, "rng": state.rng})
        state = restore_train_state(tree, TrainState)
        trainer.mini_epoch_count = resume_meta["mini_epoch"]
        trainer.epoch_count = resume_meta["epoch"]
        trainer.step_count = resume_meta["step"]
        trainer.sample_count = resume_meta["sample_count"]
    elif config.model.fpath:
        state = warm_start_state(state, trainer, config)

    num_valid_steps = max(
        1, (valid_ds.timestep_range[1] - valid_ds.timestep_range[0] - 1)
        // valid_ds.stride)
    state = trainer.run(state, train_ds, valid_ds,
                        num_valid_steps=num_valid_steps)
    if logger:
        logger.close()
    if trainer.epoch_count < config.training.epochs:
        # GFD_EPOCH_LIMIT break: signal the chain runner to restart with
        # --resume latest (rc 3 = "incomplete but resumable")
        print(f"Epoch limit reached at {trainer.epoch_count}/"
              f"{config.training.epochs}; resumable.")
        sys.exit(3)
    return state


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        print("\nTraining stopped by keyboard interrupt.")
        sys.exit(1)
    except Exception as e:
        print(f"\nTraining failed: {e}")
        traceback.print_exc()
        sys.exit(1)
