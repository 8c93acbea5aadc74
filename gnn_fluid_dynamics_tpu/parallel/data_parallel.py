"""Data-parallel training over an ICI device mesh.

The reference's DDP path (``src/train.py:398-415``) is declared broken
(train.py:4). This is the working TPU-native replacement: a 1-D
``jax.sharding.Mesh`` over the slice, ``shard_map`` with the global batch's
graphs sharded over the ``data`` axis, per-device forward/backward, and a
``pmean`` gradient/batch-stats reduction over ICI (the NCCL all-reduce
counterpart, train.py:55-67). Parameters and optimizer state are replicated;
identical pmean'd updates keep replicas in sync without any parameter
broadcast.

Batch layout: each device receives a full *concatenated* batched MeshGraph of
``global_batch // n_devices`` graphs (all graphs share the padded bucket
shape), stacked along a leading device axis — so per-device compute is exactly
the single-chip path with no vmap overhead.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_fluid_dynamics_tpu.graph import MeshGraph, stack_graphs


def make_device_mesh(n_devices: Optional[int] = None,
                     axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), (n, len(devices))
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def shard_batch(per_device_graphs: Sequence[MeshGraph], mesh: Mesh) -> MeshGraph:
    """Stack per-device batched graphs along a leading device axis and place
    them sharded over the mesh's data axis."""
    stacked = stack_graphs(list(per_device_graphs))
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_dp_train_step(model, optimizer: optax.GradientTransformation,
                       mesh: Mesh, noise_std: float = 0.0,
                       pushforward_factor: int = 0,
                       axis_name: str = "data",
                       with_pf: bool = True) -> Callable:
    """Build the jitted data-parallel train step.

    Returns ``step(state, device_graphs, lr) -> (state, losses)`` where
    ``device_graphs`` is the output of :func:`shard_batch` and ``state`` is a
    replicated :class:`~gnn_fluid_dynamics_tpu.training.trainer.TrainState`.
    Pushforward unrolling (FvgnD) runs per device on its local shard, exactly
    mirroring the single-chip step; temporal bundling lives inside the model
    and needs no DP-side handling.
    """
    from jax.experimental.shard_map import shard_map
    from gnn_fluid_dynamics_tpu.training.trainer import (TrainState, _set_lr,
                                                         pushforward_retarget,
                                                         warmup_window)
    pf = int(pushforward_factor or 0)
    use_pf = with_pf and pf > 0 and model.pushforward_use
    warm_slice = (not with_pf) and pf > 0 and model.pushforward_use

    def loss_fn(params, batch_stats, graph, feats, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, updates = model.forward(variables, graph, feats, mode="train",
                                         rngs={"dropout": rng})
        losses = model.loss(outputs, feats, graph)
        return losses["total_log_loss"], (losses, updates)

    def local_step(state: TrainState, graphs: MeshGraph, lr):
        # drop the leading (1,) device axis
        graph = jax.tree.map(lambda x: x[0], graphs)
        if warm_slice:
            # pushforward warmup: one-step-consistent supervision
            graph = warmup_window(graph)
        # decorrelate per-device RNG streams
        rng = jax.random.fold_in(state.rng, jax.lax.axis_index(axis_name))
        rng, k_feat, k_drop = jax.random.split(rng, 3)
        tgraph, feats = model.transform_features(graph, k_feat, mode="train",
                                                 noise_std=noise_std)
        if use_pf:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            feats = pushforward_retarget(model, variables, tgraph, feats, pf)
        grads, (losses, updates) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, tgraph, feats, k_drop)
        # ICI all-reduce: mean of grads/losses/batch-stats across the slice
        grads = jax.lax.pmean(grads, axis_name)
        losses = jax.lax.pmean(losses, axis_name)
        new_bs = updates.get("batch_stats", state.batch_stats)
        new_bs = jax.lax.pmean(new_bs, axis_name)

        opt_state = _set_lr(state.opt_state, lr)
        p_updates, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, p_updates)
        new_state = TrainState(params=params, batch_stats=new_bs,
                               opt_state=opt_state, step=state.step + 1,
                               rng=jax.random.split(state.rng, 2)[0])
        return new_state, losses

    # spec prefixes: state/lr replicated, graphs sharded on the device axis
    sharded_fn = shard_map(local_step, mesh=mesh,
                           in_specs=(P(), P(axis_name), P()),
                           out_specs=(P(), P()),
                           check_rep=False)
    jitted = jax.jit(sharded_fn, donate_argnums=(0,))

    def step_wrapper(state, device_graphs, lr):
        return jitted(state, device_graphs, jnp.asarray(lr, jnp.float32))

    return step_wrapper


def shard_device_fields(per_device_fields, mesh: Mesh):
    """Stack per-device trajectory field stores ``{key: (T, B*Npad, D)}``
    along a leading device axis and shard them over the data axis — the DP
    counterpart of :meth:`MeshDataset.device_fields`. Each device holds ONLY
    its own meshes' trajectories in HBM; with a fixed per-device mesh
    assignment this transfers once for the whole run."""
    assert len(per_device_fields) == mesh.devices.size, (
        len(per_device_fields), mesh.devices.size)
    keys = per_device_fields[0].keys()
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(
                jnp.stack([jnp.asarray(d[k]) for d in per_device_fields]),
                sharding)
            for k in keys}


def make_dp_indexed_train_step(model, optimizer: optax.GradientTransformation,
                               mesh: Mesh, window: int, noise_std: float = 0.0,
                               pushforward_factor: int = 0,
                               axis_name: str = "data",
                               with_pf: bool = True) -> Callable:
    """Scan-fused, device-resident-field data-parallel train step.

    ``step(state, device_graphs, device_fields, ts, lrs)`` runs
    ``ts.shape[0]`` optimizer steps in ONE jitted call: per device, each scan
    step gathers its (N, W, D) field windows from the device-local trajectory
    store by timestep index (zero per-step host traffic), computes grads, and
    pmean-reduces over ICI. ``device_graphs`` = :func:`shard_batch` output
    (one static combo per device), ``device_fields`` =
    :func:`shard_device_fields` output, ``ts`` = (k, n_dev, B) int32. The
    per-step math matches :func:`make_dp_train_step` exactly (same RNG
    stream), which the equivalence test pins."""
    from jax.experimental.shard_map import shard_map
    from gnn_fluid_dynamics_tpu.training.trainer import (TrainState, _set_lr,
                                                         pushforward_retarget,
                                                         warmup_window)
    pf = int(pushforward_factor or 0)
    use_pf = with_pf and pf > 0 and model.pushforward_use
    warm_slice = (not with_pf) and pf > 0 and model.pushforward_use
    W = int(window)

    def loss_fn(params, batch_stats, graph, feats, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, updates = model.forward(variables, graph, feats, mode="train",
                                         rngs={"dropout": rng})
        losses = model.loss(outputs, feats, graph)
        return losses["total_log_loss"], (losses, updates)

    def gather_windows(dev_fields, ts_b):
        B = ts_b.shape[0]
        out = {}
        for key, arr in dev_fields.items():
            T, NB, D = arr.shape
            a = arr.reshape(T, B, NB // B, D)
            win = jax.vmap(
                lambda x, t0: jax.lax.dynamic_slice_in_dim(x, t0, W, 0),
                in_axes=(1, 0))(a, ts_b)
            out[key] = win.transpose(0, 2, 1, 3).reshape(NB, W, D)
        return out

    def local_multi_step(state: TrainState, graphs: MeshGraph, dev_fields,
                         ts, lrs):
        graph0 = jax.tree.map(lambda x: x[0], graphs)
        fields0 = {k: v[0] for k, v in dev_fields.items()}
        ts0 = ts[:, 0]                     # (k, B) local timesteps

        def body(state, xs):
            ts_b, lr = xs
            graph = graph0.replace(**gather_windows(fields0, ts_b))
            if warm_slice:
                graph = warmup_window(graph)
            rng = jax.random.fold_in(state.rng, jax.lax.axis_index(axis_name))
            rng, k_feat, k_drop = jax.random.split(rng, 3)
            tgraph, feats = model.transform_features(
                graph, k_feat, mode="train", noise_std=noise_std)
            if use_pf:
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                feats = pushforward_retarget(model, variables, tgraph,
                                             feats, pf)
            grads, (losses, updates) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, tgraph, feats, k_drop)
            grads = jax.lax.pmean(grads, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
            new_bs = updates.get("batch_stats", state.batch_stats)
            new_bs = jax.lax.pmean(new_bs, axis_name)
            opt_state = _set_lr(state.opt_state, lr)
            p_updates, opt_state = optimizer.update(grads, opt_state,
                                                    state.params)
            params = optax.apply_updates(state.params, p_updates)
            new_state = TrainState(params=params, batch_stats=new_bs,
                                   opt_state=opt_state, step=state.step + 1,
                                   rng=jax.random.split(state.rng, 2)[0])
            return new_state, losses

        return jax.lax.scan(body, state, (ts0, lrs))

    sharded_fn = shard_map(local_multi_step, mesh=mesh,
                           in_specs=(P(), P(axis_name), P(axis_name),
                                     P(None, axis_name), P()),
                           out_specs=(P(), P()),
                           check_rep=False)
    jitted = jax.jit(sharded_fn, donate_argnums=(0,))

    def step_wrapper(state, device_graphs, device_fields, ts, lrs):
        return jitted(state, device_graphs, device_fields,
                      jnp.asarray(ts, jnp.int32),
                      jnp.asarray(lrs, jnp.float32))

    return step_wrapper
