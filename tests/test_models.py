"""Model forward/loss smoke + invariance tests on a tiny synthetic mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                   taylor_green_trajectory)
from gnn_fluid_dynamics_tpu.graph import batch_graphs, from_geometry
from gnn_fluid_dynamics_tpu.models import get_model_class
from gnn_fluid_dynamics_tpu.models.base import ModelConfig
from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator
from gnn_fluid_dynamics_tpu.ops.mls import compute_mls_weights


LOSS_WEIGHTS = {"continuity": 0.1, "cell_velocity_change": 10,
                "cell_velocity": 10, "cell_pressure": 1, "face_velocity": 1,
                "face_flux": 1, "face_pressure": 1}


def build_graph(pad=True, grad_weights=False, incidence=False):
    geom = make_geometry("structured", nx=6, ny=4)
    fields = dict(taylor_green_trajectory(geom, num_timesteps=3, dt=0.01))
    if grad_weights:
        nb, w = compute_mls_weights(geom["cell_pos"], 1)
        fields["cell_grad_weights"] = w
        fields["cell_grad_neighbours"] = nb
        nbf, wf = compute_mls_weights(geom["face_pos"], 1)
        fields["face_grad_weights"] = wf
        fields["face_grad_neighbours"] = nbf
    return from_geometry(geom, fields, dt=0.01, pad_multiple=32 if pad else 0,
                         with_incidence=incidence)


def make_model(name, graph, **kw):
    cls = get_model_class(name)
    cfg = ModelConfig(name=name, hidden_width=32, mp_num=2, **kw)
    model = cls(cfg, loss_weights=LOSS_WEIGHTS)
    # gather stats from the single sample
    _, feats = model.transform_features(graph, None, mode="rollout")
    acc = StatsAccumulator(model.nmap)
    from gnn_fluid_dynamics_tpu.models.base import feature_masks
    acc.update(feats, feature_masks(graph, feats))
    model.set_stats(acc.finalize())
    return model


GRAD_WEIGHT_MODELS = ("FvgnB", "MgnA", "MgnB", "MgnC", "ConservativeB",
                      "VertPotB", "VertPotF", "StreamFuncA", "StreamFuncB",
                      "StreamFuncC", "StreamFuncD")

ALL_MODELS = ["FvgnA", "FvgnB", "FvgnC", "FvgnE", "FvgnF", "FvgnH", "FvgnJ",
              "FvgnK",
              "MgnA", "MgnB", "MgnC",
              "FluxA", "FluxB", "FluxC", "FluxD",
              "ConservativeA", "ConservativeB", "ConservativeD",
              "ConservativeE", "ConservativeF", "ConservativeG",
              "ConservativeH", "ConservativeI", "ConservativeJ",
              "ConservativeK",
              "VertPotA", "VertPotB", "VertPotC", "VertPotD", "VertPotE",
              "VertPotF", "VertPotG",
              "StreamFuncA", "StreamFuncB", "StreamFuncC", "StreamFuncD"]


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_loss_finite(name):
    graph = build_graph(grad_weights=(name in GRAD_WEIGHT_MODELS))
    kw = {"bundle_size": 2} if name == "FvgnC" else {}
    model = make_model(name, graph, **kw)
    rng = jax.random.PRNGKey(0)
    tgraph, feats = model.transform_features(graph, rng, mode="train",
                                             noise_std=0.01)
    variables = model.init(jax.random.PRNGKey(1), tgraph, feats)
    outputs, updates = model.forward(variables, tgraph, feats, mode="train")
    losses = model.loss(outputs, feats, tgraph)
    assert jnp.isfinite(losses["total_log_loss"]), losses
    for k, v in losses.items():
        assert jnp.isfinite(v), (k, v)
    if name == "FvgnC":
        return   # bundled rollout uses the per-step extraction path
    # rollout path
    outputs_r, _ = model.forward(variables, graph, feats, mode="rollout")
    sol = model.derive_state(outputs_r, feats, graph)
    assert sol["cell_velocity"].shape == (graph.num_cells, 2)
    assert sol["cell_pressure"].shape == (graph.num_cells, 1)
    assert jnp.all(jnp.isfinite(sol["cell_velocity"]))
    new_feats = model.update_features(sol, feats, graph)
    key = "face_xa" if "face_xa" in feats else "face_x"
    assert new_feats[key].shape == feats[key].shape


def test_forward_jit_and_batch():
    graph = build_graph()
    model = make_model("FvgnA", graph)
    _, feats = model.transform_features(graph, None, mode="rollout")
    variables = model.init(jax.random.PRNGKey(1), graph, feats)

    fwd = jax.jit(lambda v, g, f: model.forward(v, g, f, mode="rollout")[0]
                  ["cell_velocity_change"])
    single = fwd(variables, graph, feats)

    gb = batch_graphs([graph, graph])
    _, fb = model.transform_features(gb, None, mode="rollout")
    double = fwd(variables, gb, fb)
    C = graph.num_cells
    # batching two copies must reproduce the single-graph result exactly
    np.testing.assert_allclose(np.asarray(double[:C]), np.asarray(single),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(double[C:]), np.asarray(single),
                               rtol=2e-4, atol=2e-5)


def test_padding_invariance():
    """Predictions on valid elements must not depend on padding amount."""
    geom = make_geometry("structured", nx=6, ny=4)
    fields = taylor_green_trajectory(geom, num_timesteps=3, dt=0.01)
    g1 = from_geometry(geom, fields, dt=0.01)
    g2 = from_geometry(geom, fields, dt=0.01, pad_multiple=64)
    model = make_model("FvgnA", g1)
    _, f1 = model.transform_features(g1, None, mode="rollout")
    _, f2 = model.transform_features(g2, None, mode="rollout")
    variables = model.init(jax.random.PRNGKey(1), g1, f1)
    o1, _ = model.forward(variables, g1, f1, mode="rollout")
    o2, _ = model.forward(variables, g2, f2, mode="rollout")
    C = g1.num_cells
    np.testing.assert_allclose(np.asarray(o2["cell_velocity_change"][:C]),
                               np.asarray(o1["cell_velocity_change"]),
                               rtol=2e-4, atol=2e-5)


def test_gather_vs_segment_aggregation():
    """The incidence-gather layout must agree with scatter-add exactly."""
    graph = build_graph(incidence=True)
    model_seg = make_model("FvgnA", graph)
    _, feats = model_seg.transform_features(graph, None, mode="rollout")
    variables = model_seg.init(jax.random.PRNGKey(1), graph, feats)
    o_seg, _ = model_seg.forward(variables, graph, feats, mode="rollout")

    model_gat = make_model("FvgnA", graph, aggregation="gather")
    o_gat, _ = model_gat.forward(variables, graph, feats, mode="rollout")
    # fp32 summation order differs between the two layouts; bound the drift
    np.testing.assert_allclose(np.asarray(o_gat["cell_velocity_change"]),
                               np.asarray(o_seg["cell_velocity_change"]),
                               rtol=5e-3, atol=5e-4)


def test_antisym_mlp_is_odd():
    """The Conservative family's antisymmetric branch must satisfy
    f(-x) = -f(x) exactly (bias-free tanh MLP, Conservative.py:31-43)."""
    from gnn_fluid_dynamics_tpu.models.arch import AntisymMLP
    m = AntisymMLP(16, 8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m.apply(v, -x)),
                               -np.asarray(m.apply(v, x)), atol=1e-6)


def test_conservative_cell_aggregation_weights():
    """Antisym face->cell aggregation: +e to neighbour, -e to owner, 0 on
    boundary; symm: 1x interior, 2x boundary (matches the reference's two-way
    scatter semantics, Conservative.py:243-254)."""
    from gnn_fluid_dynamics_tpu.models.arch import aggregate_faces_to_cells
    graph = build_graph(pad=False)
    F = graph.num_faces
    e = jnp.asarray(np.random.default_rng(1).normal(size=(F, 4)).astype(np.float32))
    # reference semantics via explicit scatter
    row = np.asarray(graph.cell_edge_index[0])
    col = np.asarray(graph.cell_edge_index[1])
    C = graph.num_cells
    expect_a = np.zeros((C, 4), np.float32)
    expect_s = np.zeros((C, 4), np.float32)
    en = np.asarray(e)
    np.add.at(expect_a, col, en)
    np.add.at(expect_a, row, -en)
    np.add.at(expect_s, col, en)
    np.add.at(expect_s, row, en)
    got_a = aggregate_faces_to_cells(e, graph, antisym=True)
    got_s = aggregate_faces_to_cells(e, graph, antisym=False)
    np.testing.assert_allclose(np.asarray(got_a), expect_a, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_s), expect_s, atol=2e-5)


def test_masked_loss_ignores_padding():
    """Corrupting padded rows must not change any loss component."""
    graph = build_graph()
    model = make_model("FvgnA", graph)
    rng = jax.random.PRNGKey(0)
    tgraph, feats = model.transform_features(graph, rng, "train", 0.0)
    variables = model.init(jax.random.PRNGKey(1), tgraph, feats)
    outputs, _ = model.forward(variables, tgraph, feats, mode="train")
    base = model.loss(outputs, feats, tgraph)

    bad = dict(outputs)
    pad_c = ~np.asarray(tgraph.cell_mask)
    corrupt = jnp.where(jnp.asarray(pad_c)[:, None], 1e6,
                        outputs["cell_velocity_change"])
    bad["cell_velocity_change"] = corrupt
    after = model.loss(bad, feats, tgraph)
    np.testing.assert_allclose(float(after["cell_velocity_change_loss"]),
                               float(base["cell_velocity_change_loss"]),
                               rtol=1e-6)


def test_banded_aggregation_equivalence():
    """Banded one-hot einsum aggregation must match the scatter path (within
    matmul-precision tolerance) on an RCM-reordered mesh."""
    from gnn_fluid_dynamics_tpu.data.synthetic import taylor_green_trajectory
    from gnn_fluid_dynamics_tpu.ops.reorder import rcm_reorder_geometry
    geom = make_geometry("structured", nx=8, ny=6)
    geom = rcm_reorder_geometry(geom)
    fields = taylor_green_trajectory(geom, num_timesteps=3, dt=0.01)
    g = from_geometry(geom, fields, dt=0.01, pad_multiple=128,
                      with_banded=True)
    model_seg = make_model("FvgnA", g)
    _, feats = model_seg.transform_features(g, None, mode="rollout")
    variables = model_seg.init(jax.random.PRNGKey(1), g, feats)
    o_seg, _ = model_seg.forward(variables, g, feats, mode="rollout")

    model_band = make_model("FvgnA", g, aggregation="banded")
    o_band, _ = model_band.forward(variables, g, feats, mode="rollout")
    C = int(np.asarray(g.cell_mask).sum())
    np.testing.assert_allclose(
        np.asarray(o_band["cell_velocity_change"][:C]),
        np.asarray(o_seg["cell_velocity_change"][:C]),
        rtol=2e-2, atol=2e-3)

    # batching two banded graphs keeps band offsets consistent
    gb = batch_graphs([g, g])
    _, fb = model_band.transform_features(gb, None, mode="rollout")
    ob, _ = model_band.forward(variables, gb, fb, mode="rollout")
    single = np.asarray(o_band["cell_velocity_change"][:C])
    np.testing.assert_allclose(np.asarray(ob["cell_velocity_change"][:C]),
                               single, rtol=1e-4, atol=1e-5)
    Cp = g.num_cells
    np.testing.assert_allclose(
        np.asarray(ob["cell_velocity_change"][Cp:Cp + C]), single,
        rtol=1e-4, atol=1e-5)


def test_rcm_reorder_preserves_physics():
    """Reordering is a pure relabeling: divergence of the exact TG flux is
    unchanged (up to fp order)."""
    from gnn_fluid_dynamics_tpu.data.synthetic import taylor_green_trajectory
    from gnn_fluid_dynamics_tpu.ops.reorder import rcm_reorder_geometry
    from gnn_fluid_dynamics_tpu.ops import fvm
    geom = make_geometry("cylinder", n_points=300, seed=2)
    geom2 = rcm_reorder_geometry(geom)
    for gg in (geom, geom2):
        fields = taylor_green_trajectory(gg, num_timesteps=1, dt=0.01)
        flux = jnp.asarray(fields["face_flux"][0])
        cf = fvm.face_flux_to_cell_flux(flux, jnp.asarray(gg["face_index"]),
                                        jnp.asarray(gg["cell_face_sign"]))
        div = np.abs(np.asarray(fvm.divergence_from_cell_flux(cf[..., 0])))
        assert div.max() < 1e-2
    # closure identity still holds after reorder
    area = geom2["face_area"].reshape(-1)[geom2["face_index"].T][..., None]
    closure = np.sum(geom2["cell_normal"] * area, axis=1)
    np.testing.assert_allclose(closure, 0.0, atol=1e-5)


def test_banded_dynamic_heterogeneous_batch():
    """Training-mode banded graphs (traced offsets, dataset-uniform band
    widths) must match the scatter path when two DIFFERENT meshes share a
    batch — each graph keeps its own band offsets."""
    from gnn_fluid_dynamics_tpu.data.pipeline import (MeshDataset, Trajectory)
    from gnn_fluid_dynamics_tpu.data.synthetic import channel_flow_trajectory
    from gnn_fluid_dynamics_tpu.ops.reorder import rcm_reorder_geometry

    trajs = []
    for i, (nx, ny) in enumerate([(8, 6), (12, 7)]):
        geom = rcm_reorder_geometry(make_geometry("structured", nx=nx, ny=ny))
        fields = taylor_green_trajectory(geom, num_timesteps=3, dt=0.01)
        trajs.append(Trajectory(mesh_id=f"m{i}", geom=geom,
                                fields=dict(fields)))
    ds = MeshDataset(trajs, pad_multiple=128, with_banded=True)
    batch = ds.get_batch([("m0", 0), ("m1", 0)])
    # canonicalized static offsets: both meshes share one per-tile offset
    # tuple, so any mesh combination reuses the same jaxpr
    assert all(len(s) == 3 for s in batch.hv_start)
    assert batch.hv_start[0] == batch.hv_start[1]
    assert batch.cf_start[0] == batch.cf_start[1]

    model_seg = make_model("FvgnA", batch)
    _, feats = model_seg.transform_features(batch, None, mode="rollout")
    variables = model_seg.init(jax.random.PRNGKey(1), batch, feats)
    o_seg, _ = model_seg.forward(variables, batch, feats, mode="rollout")

    model_band = make_model("FvgnA", batch, aggregation="banded")
    o_band, _ = model_band.forward(variables, batch, feats, mode="rollout")
    mask = np.asarray(batch.cell_mask)
    np.testing.assert_allclose(
        np.asarray(o_band["cell_velocity_change"])[mask],
        np.asarray(o_seg["cell_velocity_change"])[mask],
        rtol=2e-2, atol=2e-3)

    # static baking must give identical results to the dynamic path
    from gnn_fluid_dynamics_tpu.graph import to_static_bands
    gs = to_static_bands(batch)
    assert all(len(s) == 3 for s in gs.hv_start)
    o_sta, _ = model_band.forward(variables, gs, feats, mode="rollout")
    np.testing.assert_allclose(
        np.asarray(o_sta["cell_velocity_change"])[mask],
        np.asarray(o_band["cell_velocity_change"])[mask],
        rtol=1e-5, atol=1e-6)


def test_pallas_aggregation_equivalence():
    """The Pallas fused aggregation backend (interpret mode on CPU) must match
    the scatter path."""
    from gnn_fluid_dynamics_tpu.ops.reorder import rcm_reorder_geometry
    geom = rcm_reorder_geometry(make_geometry("structured", nx=8, ny=6))
    fields = taylor_green_trajectory(geom, num_timesteps=3, dt=0.01)
    g = from_geometry(geom, fields, dt=0.01, pad_multiple=128,
                      with_banded=True)
    model_seg = make_model("FvgnA", g)
    _, feats = model_seg.transform_features(g, None, mode="rollout")
    variables = model_seg.init(jax.random.PRNGKey(1), g, feats)
    o_seg, _ = model_seg.forward(variables, g, feats, mode="rollout")

    model_pal = make_model("FvgnA", g, aggregation="pallas")
    o_pal, _ = model_pal.forward(variables, g, feats, mode="rollout")
    C = int(np.asarray(g.cell_mask).sum())
    np.testing.assert_allclose(
        np.asarray(o_pal["cell_velocity_change"][:C]),
        np.asarray(o_seg["cell_velocity_change"][:C]),
        rtol=5e-2, atol=5e-3)


def test_pallas_index_built_aggregation_equivalence():
    """to_static_bands derives per-tile index vectors; the index-built Pallas
    kernels (one-hot rebuilt on-chip via iota compares, ops/pallas_agg.py)
    must match the dense-table Pallas path."""
    from gnn_fluid_dynamics_tpu.graph import to_static_bands
    from gnn_fluid_dynamics_tpu.ops.reorder import rcm_reorder_geometry
    geom = rcm_reorder_geometry(make_geometry("structured", nx=8, ny=6))
    fields = taylor_green_trajectory(geom, num_timesteps=3, dt=0.01)
    g = from_geometry(geom, fields, dt=0.01, pad_multiple=128,
                      with_banded=True)
    gs = to_static_bands(g)
    assert gs.es_tgt is not None and gs.cf_row_idx is not None \
        and gs.vc_idx0 is not None

    model_pal = make_model("FvgnA", g, aggregation="pallas")
    _, feats = model_pal.transform_features(g, None, mode="rollout")
    variables = model_pal.init(jax.random.PRNGKey(1), g, feats)
    o_dense, _ = model_pal.forward(variables, g, feats, mode="rollout")
    import os
    os.environ["GFD_PALLAS_UNFUSED"] = "1"   # strict: same math, idx tables
    try:
        o_idx, _ = model_pal.forward(variables, gs, feats, mode="rollout")
    finally:
        os.environ.pop("GFD_PALLAS_UNFUSED", None)
    C = int(np.asarray(g.cell_mask).sum())
    np.testing.assert_allclose(
        np.asarray(o_idx["cell_velocity_change"][:C]),
        np.asarray(o_dense["cell_velocity_change"][:C]),
        rtol=1e-5, atol=1e-6)
    # fused GN-block kernels (gather+MLP+LN+residual, bf16 latents): loose
    # tolerance against the dense-table f32-latent path
    o_fused, _ = model_pal.forward(variables, gs, feats, mode="rollout")
    scale = float(np.abs(np.asarray(
        o_dense["cell_velocity_change"][:C])).max())
    np.testing.assert_allclose(
        np.asarray(o_fused["cell_velocity_change"][:C]),
        np.asarray(o_dense["cell_velocity_change"][:C]),
        rtol=5e-2, atol=2e-2 * scale)


def test_pallas_index_kernels_match_dense():
    """Kernel-level: colidx / rowidx / rowidx3 variants reproduce the dense
    one-hot kernels on random selector tables."""
    import jax.numpy as jnp
    from gnn_fluid_dynamics_tpu.ops import pallas_agg as pa
    rng = np.random.default_rng(3)
    T, tile, B, H = 2, 128, 256, 128
    S = 512
    off = jnp.asarray(np.array([0, 256], np.int32))
    src = jnp.asarray(rng.normal(size=(S, H)), jnp.bfloat16)

    # per-row gathers (cf-style): one nonzero per row
    idx = rng.integers(-1, B, size=(T, tile, 1)).astype(np.int32)
    oh = np.zeros((T, tile, B), np.float32)
    for t in range(T):
        for i in range(tile):
            if idx[t, i, 0] >= 0:
                oh[t, i, idx[t, i, 0]] = 1.0
    a_d, b_d = pa.banded_dual_pallas(jnp.asarray(oh, jnp.bfloat16),
                                     jnp.asarray(oh, jnp.bfloat16), off, src)
    a_i, b_i = pa.banded_dual_rowidx_pallas(jnp.asarray(idx), jnp.asarray(idx),
                                            off, src, band=B)
    np.testing.assert_array_equal(np.asarray(a_d, np.float32),
                                  np.asarray(a_i, np.float32))
    np.testing.assert_array_equal(np.asarray(b_d, np.float32),
                                  np.asarray(b_i, np.float32))

    # per-column scatter (es-style): one nonzero per column
    tgt = rng.integers(-1, tile, size=(T, 1, B)).astype(np.int32)
    oh2 = np.zeros((T, tile, B), np.float32)
    for t in range(T):
        for j in range(B):
            if tgt[t, 0, j] >= 0:
                oh2[t, tgt[t, 0, j], j] = 1.0
    c_d, _ = pa.banded_dual_pallas(jnp.asarray(oh2, jnp.bfloat16),
                                   jnp.asarray(oh2, jnp.bfloat16), off, src)
    c_i, _ = pa.banded_dual_colidx_pallas(jnp.asarray(tgt), jnp.asarray(tgt),
                                          off, src)
    np.testing.assert_array_equal(np.asarray(c_d, np.float32),
                                  np.asarray(c_i, np.float32))

    # 3-gather sum (vc-style)
    i3 = rng.integers(-1, B, size=(3, T, tile, 1)).astype(np.int32)
    oh3 = np.zeros((T, tile, B), np.float32)
    for k in range(3):
        for t in range(T):
            for i in range(tile):
                if i3[k, t, i, 0] >= 0:
                    oh3[t, i, i3[k, t, i, 0]] += 1.0
    d_d = pa.banded_single_pallas(jnp.asarray(oh3, jnp.bfloat16), off, src)
    d_i = pa.banded_rowidx3_pallas(jnp.asarray(i3[0]), jnp.asarray(i3[1]),
                                   jnp.asarray(i3[2]), off, src, band=B)
    np.testing.assert_allclose(np.asarray(d_d, np.float32),
                               np.asarray(d_i, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_fluxd_scale_init_config():
    """model.scale_init: None keeps the reference constants
    (Flux.py:465-469), "stats" uses per-channel target stds, an explicit
    mapping overrides single channels."""
    graph = build_graph()

    def inits(**kw):
        m = make_model("FluxD", graph, **kw)
        _, feats = m.transform_features(graph, None, mode="train")
        v = m.init(jax.random.PRNGKey(7), graph, feats)
        return {k: float(v["params"][k]["scale"][0])
                for k in ("velocity_scale_x", "pressure_scale", "flux_scale")}

    ref = inits()
    assert ref == {"velocity_scale_x": pytest.approx(0.1),
                   "pressure_scale": pytest.approx(0.01),
                   "flux_scale": pytest.approx(0.001)}
    m = make_model("FluxD", graph, scale_init="stats")
    st = inits(scale_init="stats")
    assert st["pressure_scale"] == pytest.approx(
        float(m.stats["face_pressure"]["std"]), rel=1e-5)
    ex = inits(scale_init={"pressure": 0.5})
    assert ex["pressure_scale"] == pytest.approx(0.5)
    assert ex["velocity_scale_x"] == pytest.approx(0.1)   # default kept


def test_fluxd_integrator_detach():
    """integrator_detach must cut the Delta-v-loss gradient into the named
    supervised heads (their scales then learn only from their own losses)
    while leaving forward values identical."""
    graph = build_graph()
    out_ref = out_det = None
    grads = {}
    for detach in ((), ("pressure", "velocity", "flux")):
        m = make_model("FluxD", graph, integrator_detach=detach)
        m.loss_weights = dict(m.loss_weights)
        m.loss_weights["face_pressure"] = 0.0     # isolate the leak path
        tg, feats = m.transform_features(graph, None, mode="train")
        v = m.init(jax.random.PRNGKey(7), tg, feats)

        def f(params):
            out, _ = m.forward({**v, "params": params}, tg, feats,
                               mode="train")
            return m.loss(out, feats, tg)["total_log_loss"]

        g = jax.grad(f)(v["params"])
        grads[detach] = float(g["pressure_scale"]["scale"][0])
        out, _ = m.forward(v, tg, feats, mode="train")
        if detach:
            out_det = out
        else:
            out_ref = out
    assert abs(grads[()]) > 1.0                   # the collapse-driving leak
    assert grads[("pressure", "velocity", "flux")] == 0.0
    # forward values unchanged by detach
    np.testing.assert_allclose(
        np.asarray(out_ref["cell_velocity_change"]),
        np.asarray(out_det["cell_velocity_change"]), rtol=1e-6)


def test_diagnose_head_report_flags_collapse():
    """training.diagnose.head_report: per-head corr/rel in both spaces; an
    untrained FluxD (tiny reference-constant scales) must flag the velocity
    head as collapsed relative to an O(1) target."""
    from gnn_fluid_dynamics_tpu.training.diagnose import head_report

    graph = build_graph()
    model = make_model("FluxD", graph)
    _, feats = model.transform_features(graph, None, mode="rollout")
    variables = model.init(jax.random.PRNGKey(0), graph, feats)
    report = head_report(model, variables, graph, feats)

    assert "face_velocity_x" in report and "face_pressure" in report
    for head, spaces in report.items():
        if head.startswith("_"):
            continue
        assert {"normalized", "physical"} <= set(spaces)
        for r in spaces.values():
            assert np.isfinite(r["rel"]) and np.isfinite(r["corr"])
    # physical-space velocity prediction: scale init 0.1 * O(1) raw output
    # vs Taylor-Green O(1) velocities -> rel error near 1, tiny pred std
    rel = report["face_velocity_x"]["physical"]["rel"]
    assert 0.5 < rel < 2.0
    # learned scales surface as scalar params
    assert any("scale" in k for k in report.get("_scalar_params", {}))


def test_pallas_chunked_fused_kernels_match_per_tile():
    """Chunked fused GN-block kernels (K tiles per grid step over one shared
    band DMA, ops/pallas_agg.py _chunk_plan) must match the per-tile fused
    kernels exactly — chunking only changes the DMA/grid schedule, not the
    math. Uses a mesh big enough that T % K == 0 planning actually fires."""
    import os

    from gnn_fluid_dynamics_tpu.graph import to_static_bands
    from gnn_fluid_dynamics_tpu.ops import pallas_agg as pa
    from gnn_fluid_dynamics_tpu.ops.reorder import rcm_reorder_geometry
    geom = rcm_reorder_geometry(make_geometry("structured", nx=24, ny=16))
    fields = taylor_green_trajectory(geom, num_timesteps=3, dt=0.01)
    g = from_geometry(geom, fields, dt=0.01, pad_multiple=128,
                      with_banded=True)
    gs = to_static_bands(g)
    # planning fires for at least one table group on this mesh
    plans = [pa._chunk_plan(tuple(s[2]), g.cf_row_onehot.shape[2], s[1])
             for s in gs.cf_start]
    assert any(p is not None for p in plans), (gs.cf_start,)

    model_pal = make_model("FvgnA", g, aggregation="pallas")
    _, feats = model_pal.transform_features(g, None, mode="rollout")
    variables = model_pal.init(jax.random.PRNGKey(1), g, feats)
    o_chunk, _ = model_pal.forward(variables, gs, feats, mode="rollout")
    os.environ["GFD_PALLAS_NOCHUNK"] = "1"
    try:
        o_tile, _ = model_pal.forward(variables, gs, feats, mode="rollout")
    finally:
        os.environ.pop("GFD_PALLAS_NOCHUNK", None)
    C = int(np.asarray(g.cell_mask).sum())
    np.testing.assert_allclose(
        np.asarray(o_chunk["cell_velocity_change"][:C]),
        np.asarray(o_tile["cell_velocity_change"][:C]),
        rtol=1e-5, atol=1e-6)


def test_fluxd_rel_pressure_loss_term():
    """Optional ``face_pressure_rel`` loss weight adds a per-graph relative
    MSE on RAW face pressure (the rollout error metric, reference
    ``RelMSE_per_graph`` loss.py:70-89) and puts gradient on the pressure
    head; absent from the weights dict, the loss is unchanged."""
    graph = build_graph()
    model = make_model("FluxD", graph)
    rng = jax.random.PRNGKey(0)
    tgraph, feats = model.transform_features(graph, rng, mode="train")
    variables = model.init(jax.random.PRNGKey(1), tgraph, feats)
    outputs, _ = model.forward(variables, tgraph, feats, mode="train")
    base = model.loss(outputs, feats, tgraph)
    assert "face_pressure_rel_loss" not in base

    model.loss_weights = dict(model.loss_weights, face_pressure_rel=100.0)
    withrel = model.loss(outputs, feats, tgraph)
    rel = withrel["face_pressure_rel_loss"]
    assert jnp.isfinite(rel) and float(rel) >= 0
    # rel term on raw pressure: invariant to the z-score stats scale, so it
    # must equal rel-MSE computed directly from denormalized outputs
    from gnn_fluid_dynamics_tpu.models import normalizer as norm_mod
    from gnn_fluid_dynamics_tpu.models.losses import rel_mse_per_graph
    p_raw = norm_mod.z_score(outputs["face_pressure"],
                             model.stats["face_pressure"], inverse=True)
    expect = jnp.mean(rel_mse_per_graph(
        p_raw, feats["face_y"][:, 2:3], tgraph.face_mask, tgraph.face_batch,
        tgraph.num_graphs))
    assert float(rel) == pytest.approx(float(expect), rel=1e-6)
    assert float(withrel["total_log_loss"]) > float(base["total_log_loss"])

    # gradient flows into the pressure head through the rel term alone
    only_rel = {"face_pressure_rel": 1.0}
    def f(params):
        vs = dict(variables); vs["params"] = params
        o, _ = model.forward(vs, tgraph, feats, mode="train")
        model.loss_weights = only_rel
        return model.loss(o, feats, tgraph)["total_log_loss"]
    g = jax.grad(f)(variables["params"])
    psum = float(jnp.abs(g["pressure_scale"]["scale"]).sum())
    assert np.isfinite(psum) and psum > 0
