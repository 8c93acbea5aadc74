"""Training runtime tests: jitted step reduces loss, schedules match reference
shapes, config round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_fluid_dynamics_tpu.data.pipeline import (MeshDataset, Trajectory,
                                                  compute_window,
                                                  train_batches)
from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                   taylor_green_trajectory)
from gnn_fluid_dynamics_tpu.models import get_model_class
from gnn_fluid_dynamics_tpu.models.base import ModelConfig
from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator
from gnn_fluid_dynamics_tpu.training.config import Config
from gnn_fluid_dynamics_tpu.training.lr_schedule import get_schedule
from gnn_fluid_dynamics_tpu.training.trainer import Trainer


def make_dataset(T=8):
    trajs = []
    for i in range(2):
        geom = make_geometry("structured", nx=6, ny=4)
        fields = taylor_green_trajectory(geom, num_timesteps=T, dt=0.01)
        trajs.append(Trajectory(mesh_id=f"mesh_{i}", geom=geom, fields=fields))
    return MeshDataset(trajs, stride=1, data_window=2, pad_multiple=32)


def test_compute_window():
    # reference DataSet.py:71-89 precedence
    assert compute_window(1, None, None) == (1, 2)
    assert compute_window(3, None, None) == (3, 4)
    assert compute_window(2, 2, None) == (1, 4)          # pushforward wins
    assert compute_window(1, None, 4) == (1, 5)          # bundling window
    assert compute_window(1, None, 4, mode="rollout") == (4, 5)


def test_train_step_reduces_loss():
    ds = make_dataset()
    cfg = Config()
    cfg.training.batch_size = 2
    cfg.training.noise_std = 0.0
    cfg.training.lr_max = 1e-3
    model_cls = get_model_class("FvgnA")
    model = model_cls(ModelConfig(hidden_width=16, mp_num=1),
                      loss_weights=cfg.training.loss_weights)
    g = ds.get_batch(ds.sample_map[:2])
    _, feats = model.transform_features(g, None, mode="rollout")
    acc = StatsAccumulator(model.nmap)
    from gnn_fluid_dynamics_tpu.models.base import feature_masks
    acc.update(feats, feature_masks(g, feats))
    model.set_stats(acc.finalize())

    trainer = Trainer(cfg, model)
    state = trainer.init_state(jax.random.PRNGKey(0), g, feats)

    losses = []
    for i in range(12):
        state, l = trainer.train_step(state, g, 1e-3)
        losses.append(float(l["total_log_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_schedule_shapes():
    class C:
        lr_max = 1e-3
        lr_min = 1e-6
        lr_wu = 0.02
        lr_wu_gamma = 0.04
        lr_ms1 = 0.3
        lr_ms1_gamma = 0.5
        lr_ms2 = 0.6
        lr_ms2_gamma = 0.1
        lr_ms3 = 0.98

    total = 1000
    for name in ("StepThenDecay", "OneCycle", "CosineAnnealing",
                 "ExponentialDecay", "CosineAnnealingTwoPhase"):
        sched = get_schedule(name, C, total)
        lrs = [sched(t) for t in range(total)]
        assert all(np.isfinite(lrs)), name
        assert all(lr >= 0 for lr in lrs), name

    # two-phase shape: warmup rises, hold flat at max, then decays to min
    sched = get_schedule("CosineAnnealingTwoPhase", C, total)
    assert sched(0) < sched(10) <= sched(19) <= sched(25) + 1e-12
    assert abs(sched(100) - C.lr_max) < 1e-12        # hold phase
    assert abs(sched(999) - C.lr_min) < 1e-9         # final constant
    # first cosine ends at ms2_gamma * max
    assert abs(sched(599) - C.lr_ms2_gamma * C.lr_max) < 2e-5


def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.training.batch_size = 7
    p = tmp_path / "c.json"
    cfg.save(str(p))
    from gnn_fluid_dynamics_tpu.training.config import load_config
    cfg2 = load_config(str(p))
    assert cfg2.training.batch_size == 7
    flat = cfg2.to_flat_dict()
    assert flat["training.batch_size"] == 7
    with pytest.raises(ValueError):
        Config.from_dict({"bogus_section": {}})
    with pytest.raises(ValueError):
        Config.from_dict({"training": {"bogus_key": 1}})


def test_train_batches_cover_dataset():
    ds = make_dataset()
    rng = np.random.default_rng(0)
    seen = set()
    for batch in train_batches(ds, 2, rng):
        assert len(batch) == 2
        seen.update(batch)
    assert len(seen) >= len(ds) - 2  # drop-last may skip at most batch-1


def test_bucketed_dataset_and_prefetch():
    """Size bucketing: batches stay within one bucket; padding shrinks for the
    small bucket; prefetch yields the same number of batches."""
    from gnn_fluid_dynamics_tpu.data.pipeline import prefetch
    trajs = []
    for i, nx in enumerate((4, 4, 12, 12)):
        geom = make_geometry("structured", nx=nx, ny=4)
        fields = taylor_green_trajectory(geom, num_timesteps=5, dt=0.01)
        trajs.append(Trajectory(mesh_id=f"mesh_{i}", geom=geom, fields=fields))
    ds = MeshDataset(trajs, pad_multiple=16, num_buckets=2)
    assert len(ds.bucket_pad) == 2
    assert ds.bucket_pad[0]["cell"] < ds.bucket_pad[1]["cell"]
    assert ds.bucket_of["mesh_0"] == ds.bucket_of["mesh_1"]
    assert ds.bucket_of["mesh_0"] != ds.bucket_of["mesh_2"]

    rng = np.random.default_rng(0)
    batches = list(train_batches(ds, 2, rng))
    for b in batches:
        assert len({ds.bucket_of[m] for m, _ in b}) == 1
    graphs = list(prefetch(iter(batches), ds, size=2))
    assert len(graphs) == len(batches)
    sizes = {g.num_cells for g in graphs}
    assert len(sizes) == 2  # two jit shapes, one per bucket

    # mixed-bucket batch (rollout style) falls back to the global pad
    g_all = ds.get_batch([(m, 0) for m in ds.sim_ids()])
    assert g_all.num_cells == 4 * ds.pad_to["cell"]


def test_remat_training_matches_loss():
    """remat=True (jax.checkpoint per GN block) must not change the loss."""
    import jax
    import numpy as np
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig
    from test_models import build_graph, make_model

    g = build_graph()
    m0 = make_model("FvgnA", g)
    m1 = make_model("FvgnA", g, remat=True)
    tg, feats = m0.transform_features(g, None, mode="train")
    v = m0.init(jax.random.PRNGKey(3), tg, feats)

    def loss_of(m):
        def f(params):
            out, _ = m.forward({"params": params,
                                "batch_stats": v.get("batch_stats", {})},
                               tg, feats, mode="train",
                               rngs={"dropout": jax.random.PRNGKey(0)})
            return m.loss(out, feats, tg)["total_log_loss"]
        val, grad = jax.value_and_grad(f)(v["params"])
        return float(val), grad

    l0, g0 = loss_of(m0)
    l1, g1 = loss_of(m1)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    a = jax.tree.leaves(g0)
    b = jax.tree.leaves(g1)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-5, atol=1e-6)

def test_best_checkpoint_and_monitor(tmp_path):
    """Validation results must drive 'best' promotion (VERDICT r1 weak #2),
    the monitor must emit gradient/update/scalar-param metrics (weak #3), and
    --resume best must resolve after a fresh Checkpointer construction."""
    from gnn_fluid_dynamics_tpu.training.checkpoint import Checkpointer
    from gnn_fluid_dynamics_tpu.training.monitoring import ModelMonitor

    class FakeLogger:
        def __init__(self):
            self.scalars = {}
            self.losses = []
            self.wandb = None

        def save_loss(self, losses, step, prefix):
            self.losses.append((prefix, dict(losses)))

        def save_scalar(self, value, step, prefix):
            self.scalars[prefix] = value

        def save_plot(self, *a, **k):
            pass

        def save_plots(self, *a, **k):
            pass

        def save_snapshot(self, *a, **k):
            pass

    ds = make_dataset()
    cfg = Config()
    cfg.training.batch_size = 2
    cfg.training.noise_std = 0.0
    cfg.training.epochs = 1
    cfg.training.mini_epoch_size = 4      # 2 steps per mini-epoch
    cfg.logging.save_frequency = 1
    cfg.logging.valid_frequency = 1
    model_cls = get_model_class("FluxD")  # has scalar scale params
    model = model_cls(ModelConfig(hidden_width=8, mp_num=1),
                      loss_weights=cfg.training.loss_weights)
    g = ds.get_batch(ds.sample_map[:2])
    _, feats = model.transform_features(g, None, mode="rollout")
    acc = StatsAccumulator(model.nmap)
    from gnn_fluid_dynamics_tpu.models.base import feature_masks
    acc.update(feats, feature_masks(g, feats))
    model.set_stats(acc.finalize())

    logger = FakeLogger()
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, model, logger=logger, checkpointer=ckpt,
                      monitor=ModelMonitor())
    state = trainer.init_state(jax.random.PRNGKey(0), g, feats)
    state = trainer.run(state, ds, valid_dataset=ds, num_valid_steps=2)

    # best pointer written from validation error, with the error persisted
    import json, os
    best = tmp_path / "ckpt" / "best.json"
    assert best.exists()
    rec = json.loads(best.read_text())
    assert "error" in rec and np.isfinite(rec["error"])
    # a fresh Checkpointer restores best_error and resolves/loads 'best'
    ckpt2 = Checkpointer(str(tmp_path / "ckpt"))
    assert ckpt2.best_error == rec["error"]
    tree, meta = ckpt2.load("best", template={
        "params": state.params, "batch_stats": state.batch_stats,
        "opt_state": state.opt_state, "step": state.step, "rng": state.rng})
    assert tree is not None and "valid_losses" in meta
    assert meta["valid_losses"].get("total_mean_error") is not None

    # monitor emitted decoder gradients, update norms, and scalar params
    keys = logger.scalars.keys()
    assert any(k.startswith("gradients/face_mlp_out") for k in keys), keys
    assert any(k.startswith("scalar_params/") and "pressure_scale" in k
               for k in keys), keys


def test_tensorboard_sink(tmp_path):
    """use_tensorboard writes tf.summary event files (VERDICT r1 item 10)."""
    import os
    pytest.importorskip("tensorflow")
    from gnn_fluid_dynamics_tpu.training.logging import Logger
    cfg = Config()
    cfg.logging.use_tensorboard = True
    cfg.logging.name = "tbtest"
    lg = Logger(cfg, base_dir=str(tmp_path))
    lg.save_loss({"a": 1.0}, step=1, prefix="train")
    lg.close()
    tb_dir = os.path.join(lg.directory, "tb")
    assert os.path.isdir(tb_dir) and any(
        "tfevents" in f for f in os.listdir(tb_dir))


def test_pushforward_retarget_targets_final_state():
    """The retargeted cell_y must equal v_final - v_pushed (reference
    train.py:250 with FvgnD's absolute-y convention, Fvgn.py:803) — NOT
    (v_final - v0) - v_pushed, which a difference-form cell_y would give."""
    import numpy as np

    from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, Trajectory
    from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                       taylor_green_trajectory)
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import (ModelConfig,
                                                    feature_masks)
    from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator
    from gnn_fluid_dynamics_tpu.training.trainer import pushforward_retarget

    geom = make_geometry("structured", nx=6, ny=4)
    fields = taylor_green_trajectory(geom, num_timesteps=8, dt=0.01)
    trajs = [Trajectory(mesh_id="m", geom=geom, fields=dict(fields))]
    ds = MeshDataset(trajs, stride=1, data_window=4, pad_multiple=32)
    model = get_model_class("FvgnD")(ModelConfig(hidden_width=16, mp_num=1))
    graph = ds.get_batch(ds.sample_map[:1])
    _, feats = model.transform_features(graph, None, mode="rollout")
    acc = StatsAccumulator(model.nmap)
    acc.update(feats, feature_masks(graph, feats))
    model.set_stats(acc.finalize())
    variables = model.init(jax.random.PRNGKey(0), graph, feats)

    _, f = model.transform_features(graph, None, mode="train")
    # stats-only cell_y under pushforward: one-step difference of the window
    np.testing.assert_allclose(
        np.asarray(f["cell_y"]),
        np.asarray(graph.cell_velocity[:, -1] - graph.cell_velocity[:, -2]),
        rtol=1e-6)
    f2 = pushforward_retarget(model, variables, graph, dict(f), 2)
    v_final = np.asarray(graph.cell_velocity[:, -1, 0:2])
    pushed = np.asarray(f2["cell_x"][:, 0:2])
    np.testing.assert_allclose(np.asarray(f2["cell_y"][:, 0:2]),
                               v_final - pushed, rtol=1e-5, atol=1e-6)
    # the unroll must actually move the state off the t0 input
    assert float(np.abs(pushed - np.asarray(f["cell_x"][:, 0:2])).max()) > 0


def test_pushforward_config_override_enables_any_model():
    """model.pushforward: true turns the trainer's unroll on for families
    whose class flag is False (e.g. FluxD), and false disables FvgnD's."""
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig

    fluxd = get_model_class("FluxD")(
        ModelConfig(hidden_width=16, mp_num=1, pushforward=True))
    assert fluxd.pushforward_use
    fvgnd_off = get_model_class("FvgnD")(
        ModelConfig(hidden_width=16, mp_num=1, pushforward=False))
    assert not fvgnd_off.pushforward_use
    default = get_model_class("FluxD")(ModelConfig(hidden_width=16, mp_num=1))
    assert not default.pushforward_use


def test_pushforward_warmup_switches_step_function():
    """pushforward_warmup_epochs: the trainer must run the plain one-step
    update during warmup and the unrolled one afterwards."""
    from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, Trajectory
    from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                       taylor_green_trajectory)
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import (ModelConfig,
                                                    feature_masks)
    from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator
    from gnn_fluid_dynamics_tpu.training.config import Config
    from gnn_fluid_dynamics_tpu.training.trainer import Trainer

    geom = make_geometry("structured", nx=6, ny=4)
    fields = taylor_green_trajectory(geom, num_timesteps=8, dt=0.01)
    ds = MeshDataset([Trajectory(mesh_id="m", geom=geom,
                                 fields=dict(fields))],
                     stride=1, data_window=4, pad_multiple=32)
    cfg = Config()
    cfg.training.noise_std = 0.0
    cfg.training.pushforward_factor = 2
    cfg.training.pushforward_warmup_epochs = 3
    model = get_model_class("FvgnD")(ModelConfig(hidden_width=16, mp_num=1),
                                     loss_weights=cfg.training.loss_weights)
    graph = ds.get_batch(ds.sample_map[:1])
    _, feats = model.transform_features(graph, None, mode="rollout")
    acc = StatsAccumulator(model.nmap)
    acc.update(feats, feature_masks(graph, feats))
    model.set_stats(acc.finalize())

    trainer = Trainer(cfg, model)
    state = trainer.init_state(jax.random.PRNGKey(0), graph, feats)

    trainer.epoch_count = 1          # within warmup
    state, _ = trainer.train_step(state, graph, 1e-3)
    assert set(trainer._train_step_fn) == {False}
    trainer.epoch_count = 4          # past warmup
    state, _ = trainer.train_step(state, graph, 1e-3)
    assert set(trainer._train_step_fn) == {False, True}
    assert np.all(np.isfinite(jax.tree.leaves(state.params)[0]))


def test_multi_step_matches_single_steps():
    """The scan-fused k-step train call must reproduce k sequential
    single-step calls bit-for-bit (same rng stream, same per-step math)."""
    from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, Trajectory
    from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                       taylor_green_trajectory)
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import (ModelConfig,
                                                    feature_masks)
    from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator
    from gnn_fluid_dynamics_tpu.training.config import Config
    from gnn_fluid_dynamics_tpu.training.trainer import Trainer

    geom = make_geometry("structured", nx=6, ny=4)
    fields = taylor_green_trajectory(geom, num_timesteps=10, dt=0.01)
    ds = MeshDataset([Trajectory(mesh_id="m", geom=geom,
                                 fields=dict(fields))],
                     stride=1, data_window=4, pad_multiple=32)
    cfg = Config()
    cfg.training.noise_std = 0.01
    cfg.training.pushforward_factor = 2
    cfg.training.pushforward_warmup_epochs = 0
    model = get_model_class("FvgnD")(ModelConfig(hidden_width=16, mp_num=1),
                                     loss_weights=cfg.training.loss_weights)
    graph0 = ds.get_batch(ds.sample_map[:1])
    _, feats = model.transform_features(graph0, None, mode="rollout")
    acc = StatsAccumulator(model.nmap)
    acc.update(feats, feature_masks(graph0, feats))
    model.set_stats(acc.finalize())

    trainer = Trainer(cfg, model)
    trainer.epoch_count = 1          # past warmup (0)
    state0 = trainer.init_state(jax.random.PRNGKey(0), graph0, feats)
    k = 3
    batches = [ds.sample_map[i:i + 1] for i in range(k)]
    lrs = [1e-3, 1e-3, 5e-4]

    s_single = jax.tree.map(jnp.copy, state0)
    singles = []
    for b, lr in zip(batches, lrs):
        s_single, losses = trainer.train_step(s_single, ds.get_batch(b), lr)
        singles.append(jax.device_get(losses))

    s_multi = jax.tree.map(jnp.copy, state0)
    g, stack = ds.get_batch_stack(batches)
    s_multi, losses_m = trainer.train_step_multi(s_multi, g, stack, lrs)
    losses_m = jax.device_get(losses_m)

    for i, single in enumerate(singles):
        for key in single:
            np.testing.assert_allclose(losses_m[key][i], single[key],
                                       rtol=1e-5, atol=1e-7,
                                       err_msg=f"step {i} loss {key}")
    for pa, pb in zip(jax.tree.leaves(s_single.params),
                      jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-7)
    # warmup epoch uses the warm-sliced variant without error
    trainer.epoch_count = 0
    cfg.training.pushforward_warmup_epochs = 5
    s_w, losses_w = trainer.train_step_multi(
        jax.tree.map(jnp.copy, state0), g, stack, lrs)
    assert np.all(np.isfinite(jax.device_get(losses_w["total_log_loss"])))


def test_prefetch_grouped_covers_and_groups():
    """prefetch_grouped must cover every sampled batch exactly once,
    grouping same-combo runs of k and falling back to singles for tails."""
    from gnn_fluid_dynamics_tpu.data.pipeline import (MeshDataset, Trajectory,
                                                      prefetch_grouped)
    from gnn_fluid_dynamics_tpu.data.samplers import balanced_chunked_batches
    from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                       taylor_green_trajectory)

    trajs = []
    for i in range(4):
        geom = make_geometry("structured", nx=6 + i % 2, ny=4, seed=i)
        fields = taylor_green_trajectory(geom, num_timesteps=9, dt=0.01)
        trajs.append(Trajectory(mesh_id=f"m{i}", geom=geom,
                                fields=dict(fields)))
    ds = MeshDataset(trajs, stride=1, data_window=2, pad_multiple=32)
    rng = np.random.default_rng(0)
    expected = list(balanced_chunked_batches(ds, 2, np.random.default_rng(0)))
    n_multi = n_single = covered = 0
    for item in prefetch_grouped(balanced_chunked_batches(ds, 2, rng), ds, 3):
        if item[0] == "multi":
            n_multi += 1
            k = next(iter(item[2].values())).shape[0]
            assert k == 3
            covered += k
        else:
            n_single += 1
            covered += 1
    assert covered == len(expected)
    assert n_multi > 0


def test_warmup_window_makes_supervision_one_step():
    """During pushforward warmup the supervised pair must be
    (input=v[-2], target=v[-1]-v[-2]) — not input v[0] against targets at
    t=-1, which trains the model to jump pushforward_factor steps."""
    from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, Trajectory
    from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                       taylor_green_trajectory)
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig
    from gnn_fluid_dynamics_tpu.training.trainer import warmup_window

    geom = make_geometry("structured", nx=6, ny=4)
    fields = taylor_green_trajectory(geom, num_timesteps=8, dt=0.01)
    ds = MeshDataset([Trajectory(mesh_id="m", geom=geom,
                                 fields=dict(fields))],
                     stride=1, data_window=4, pad_multiple=32)
    model = get_model_class("FvgnD")(ModelConfig(hidden_width=16, mp_num=1))
    graph = ds.get_batch(ds.sample_map[:1])

    wgraph = warmup_window(graph)
    assert wgraph.cell_velocity.shape[1] == 2
    np.testing.assert_allclose(np.asarray(wgraph.cell_velocity),
                               np.asarray(graph.cell_velocity[:, -2:]))
    # geometry untouched
    np.testing.assert_allclose(np.asarray(wgraph.cell_pos),
                               np.asarray(graph.cell_pos))

    _, f = model.transform_features(wgraph, None, mode="train")
    np.testing.assert_allclose(
        np.asarray(f["cell_x"][:, 0:2]),
        np.asarray(graph.cell_velocity[:, -2]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f["cell_y"]),
        np.asarray(graph.cell_velocity[:, -1]
                   - graph.cell_velocity[:, -2]), rtol=1e-6)
    # face targets at t=-1 are now one step ahead of the input state
    np.testing.assert_allclose(
        np.asarray(f["face_y"][:, 0:2]),
        np.asarray(graph.face_velocity[:, -1]), rtol=1e-6)
    # a 2-step window passes through unchanged
    assert warmup_window(wgraph) is wgraph


def test_indexed_step_matches_multi_step():
    """The device-resident indexed train call must reproduce the field-stack
    fused call bit-for-bit: same rng stream, windows gathered on device from
    timestep indices instead of host-assembled stacks."""
    from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, Trajectory
    from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                       taylor_green_trajectory)
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import (ModelConfig,
                                                    feature_masks)
    from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator
    from gnn_fluid_dynamics_tpu.training.config import Config
    from gnn_fluid_dynamics_tpu.training.trainer import Trainer

    trajs = []
    for i in range(2):
        geom = make_geometry("structured", nx=6, ny=4, seed=i)
        fields = taylor_green_trajectory(geom, num_timesteps=10, dt=0.01)
        trajs.append(Trajectory(mesh_id=f"m{i}", geom=geom,
                                fields=dict(fields)))
    ds = MeshDataset(trajs, stride=1, data_window=4, pad_multiple=32)
    cfg = Config()
    cfg.training.noise_std = 0.01
    cfg.training.pushforward_factor = 2
    cfg.training.pushforward_warmup_epochs = 0
    model = get_model_class("FvgnD")(ModelConfig(hidden_width=16, mp_num=1),
                                     loss_weights=cfg.training.loss_weights)
    mesh_ids = ("m0", "m1")
    batches = [[("m0", 2 + i), ("m1", 5 - i)] for i in range(3)]
    graph0 = ds.get_batch(batches[0])
    _, feats = model.transform_features(graph0, None, mode="rollout")
    acc = StatsAccumulator(model.nmap)
    acc.update(feats, feature_masks(graph0, feats))
    model.set_stats(acc.finalize())

    trainer = Trainer(cfg, model)
    trainer.epoch_count = 1
    state0 = trainer.init_state(jax.random.PRNGKey(0), graph0, feats)
    lrs = [1e-3, 1e-3, 5e-4]

    s_multi = jax.tree.map(jnp.copy, state0)
    g, stack = ds.get_batch_stack(batches)
    s_multi, losses_m = trainer.train_step_multi(s_multi, g, stack, lrs)
    losses_m = jax.device_get(losses_m)

    s_idx = jax.tree.map(jnp.copy, state0)
    dev = ds.device_fields(mesh_ids)
    ts = np.asarray([[t for _, t in sb] for sb in batches], np.int32)
    s_idx, losses_i = trainer.train_step_indexed(
        s_idx, ds._batched_static(mesh_ids), dev, ts, lrs, ds.data_window)
    losses_i = jax.device_get(losses_i)

    for key in losses_m:
        np.testing.assert_allclose(losses_i[key], losses_m[key],
                                   rtol=1e-5, atol=1e-7, err_msg=key)
    for pa, pb in zip(jax.tree.leaves(s_multi.params),
                      jax.tree.leaves(s_idx.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-7)


def test_prefetch_indexed_covers_all_batches():
    """prefetch_indexed must cover every sampled batch exactly once with
    correct timestep indices, including sub-k tail groups."""
    from gnn_fluid_dynamics_tpu.data.pipeline import (MeshDataset, Trajectory,
                                                      prefetch_indexed)
    from gnn_fluid_dynamics_tpu.data.samplers import static_chunked_batches
    from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                       taylor_green_trajectory)

    trajs = []
    for i in range(4):
        geom = make_geometry("structured", nx=6, ny=4, seed=i)
        fields = taylor_green_trajectory(geom, num_timesteps=9, dt=0.01)
        trajs.append(Trajectory(mesh_id=f"m{i}", geom=geom,
                                fields=dict(fields)))
    ds = MeshDataset(trajs, stride=1, data_window=2, pad_multiple=32)
    rng = np.random.default_rng(0)
    sampled = list(static_chunked_batches(ds, 2, rng))
    got = []
    for item in prefetch_indexed(iter(sampled), ds, k=3):
        assert item[0] == "indexed"
        _, g, dev, ts = item
        assert set(dev) >= {"cell_velocity", "cell_pressure"}
        assert ts.ndim == 2 and ts.shape[1] == 2 and ts.shape[0] <= 3
        got.append(ts)
    n_emitted = sum(t.shape[0] for t in got)
    assert n_emitted == len(sampled)
    # static chunks: exactly 2 mesh combinations for 4 meshes at batch 2
    combos = {tuple(m for m, _ in sb) for sb in sampled}
    assert len(combos) == 2


def test_static_chunked_chunks_are_epoch_stable():
    """static_chunked must emit the SAME mesh combinations every epoch
    (that is its whole point: caches keyed on the combo always hit)."""
    from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, Trajectory
    from gnn_fluid_dynamics_tpu.data.samplers import static_chunked_batches
    from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                       taylor_green_trajectory)

    trajs = []
    for i in range(6):
        geom = make_geometry("structured", nx=5, ny=4, seed=i)
        fields = taylor_green_trajectory(geom, num_timesteps=6, dt=0.01)
        trajs.append(Trajectory(mesh_id=f"m{i}", geom=geom,
                                fields=dict(fields)))
    ds = MeshDataset(trajs, stride=1, data_window=2, pad_multiple=32)
    rng = np.random.default_rng(0)
    combos1 = {tuple(m for m, _ in b)
               for b in static_chunked_batches(ds, 2, rng)}
    combos2 = {tuple(m for m, _ in b)
               for b in static_chunked_batches(ds, 2, rng)}
    assert combos1 == combos2
    assert len(combos1) == 3
    # every mesh appears, timesteps shuffle between epochs
    assert {m for c in combos1 for m in c} == {t.mesh_id for t in trajs}


def test_stats_stride_subsamples_accumulation():
    """dataset.stats_stride must accumulate over every k-th sample and leave
    the resulting stats usable (finite, correct fields present)."""
    from gnn_fluid_dynamics_tpu.training.config import Config
    from gnn_fluid_dynamics_tpu.training.train import build_datasets, compute_stats
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig

    cfg = Config()
    cfg.dataset.module = "synthetic"
    cfg.dataset.stats_fpath = None
    cfg.training.data_sim_limit = 2
    cfg.training.data_timestep_range = [0, 8]
    model_cls = get_model_class("FvgnA")
    model = model_cls(ModelConfig(hidden_width=8, mp_num=1))
    ds, _ = build_datasets(cfg, model_cls)

    cfg.dataset.stats_stride = 4
    s4 = compute_stats(cfg, model, ds)
    cfg.dataset.stats_stride = 1
    s1 = compute_stats(cfg, model, ds)
    assert set(s4) == set(s1)
    for k in s1:
        for stat in ("mean", "std"):
            if stat in s1[k] and np.asarray(s1[k][stat]).size:
                a, b = np.asarray(s1[k][stat]), np.asarray(s4[k][stat])
                assert np.all(np.isfinite(b)), (k, stat)
                # subsampled moments track the full pass closely on a
                # smooth trajectory
                np.testing.assert_allclose(a, b, rtol=0.5, atol=0.2)


def test_build_datasets_valid_only_split(tmp_path):
    """splits=("valid",) must not touch train.h5 — evaluation-only datasets
    (e.g. the long-horizon rollout sims) ship only a valid split, and the
    rollout/diagnose CLIs take stats from the checkpoint, not the train set
    (regression: the r4 queue's flagship rollout crashed on a missing
    h5_long/train.h5)."""
    from gnn_fluid_dynamics_tpu.data.hdf5 import save_dataset
    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.training.config import Config
    from gnn_fluid_dynamics_tpu.training.train import build_datasets

    from gnn_fluid_dynamics_tpu.data.pipeline import Trajectory
    geom = make_geometry("structured", nx=6, ny=4)
    fields = taylor_green_trajectory(geom, num_timesteps=6, dt=0.01)
    save_dataset(str(tmp_path / "valid.h5"),
                 [Trajectory(mesh_id="mesh_0", geom=geom, fields=fields,
                             dt=0.01, reynolds=100.0)])
    cfg = Config()
    cfg.dataset.module = "builtin"
    cfg.dataset.dpath = str(tmp_path)
    cfg.rollout.data_timestep_range = [0, 4]
    model_cls = get_model_class("FvgnA")
    train_ds, valid_ds = build_datasets(cfg, model_cls, splits=("valid",))
    assert train_ds is None
    assert len(valid_ds) > 0
    # grad weights still attach to the one materialised split
    if model_cls.cell_grad_weights_use:
        assert valid_ds.get_item(0).cell_grad_weights is not None


def test_warm_start_from_fpath(tmp_path):
    """model.fpath warm-starts TRAINING weights via the flexible loader
    (reference train.py:333-385): params match the checkpoint, counters
    resume by default and stay fresh under model.warm_start_reset."""
    from gnn_fluid_dynamics_tpu.models.base import feature_masks
    from gnn_fluid_dynamics_tpu.training.checkpoint import Checkpointer
    from gnn_fluid_dynamics_tpu.training.train import warm_start_state

    ds = make_dataset()
    cfg = Config()
    cfg.training.batch_size = 2
    cfg.training.noise_std = 0.0
    cfg.training.epochs = 1
    cfg.training.mini_epoch_size = 4
    cfg.logging.save_frequency = 1
    cfg.logging.valid_frequency = 1
    model_cls = get_model_class("FluxD")
    model = model_cls(ModelConfig(hidden_width=8, mp_num=1),
                      loss_weights=cfg.training.loss_weights)
    g = ds.get_batch(ds.sample_map[:2])
    _, feats = model.transform_features(g, None, mode="rollout")
    acc = StatsAccumulator(model.nmap)
    acc.update(feats, feature_masks(g, feats))
    model.set_stats(acc.finalize())

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, model, logger=None, checkpointer=ckpt)
    state = trainer.init_state(jax.random.PRNGKey(0), g, feats)
    trainer.mini_epoch_count = 3
    trainer.epoch_count = 2
    trainer.step_count = 7
    trainer.sample_count = 14
    ckpt.save(state, trainer, valid_losses={"total_mean_error": 1.0})

    # default semantics: weights merged, counters resumed from the checkpoint
    cfg2 = Config()
    cfg2.model.fpath = str(tmp_path / "ckpt" / "latest")
    trainer2 = Trainer(cfg2, model, logger=None, checkpointer=None)
    state2 = trainer2.init_state(jax.random.PRNGKey(1), g, feats)
    before = jax.tree.leaves(state2.params)[0].copy()
    state2 = warm_start_state(state2, trainer2, cfg2)
    for a, b in zip(jax.tree.leaves(state2.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert (trainer2.epoch_count, trainer2.mini_epoch_count,
            trainer2.step_count, trainer2.sample_count) == (2, 3, 7, 14)

    # warm_start_reset: same weights, fresh counters
    cfg3 = Config()
    cfg3.model.fpath = str(tmp_path / "ckpt" / "best")
    cfg3.model.warm_start_reset = True
    trainer3 = Trainer(cfg3, model, logger=None, checkpointer=None)
    state3 = trainer3.init_state(jax.random.PRNGKey(2), g, feats)
    state3 = warm_start_state(state3, trainer3, cfg3)
    for a, b in zip(jax.tree.leaves(state3.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert trainer3.epoch_count == 0 and trainer3.step_count == 0
    del before
