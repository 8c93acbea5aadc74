"""Direct numerical parity against the PyTorch reference (BASELINE.md north
star: "identical one-step losses").

These tests EXECUTE the reference's own model code from ``/root/reference/src``
(via the third-party-API shims in :mod:`parity_shims`), transplant weights
from the JAX model, feed both sides the identical unpadded mesh + stats, and
assert that every loss component matches to float32 tolerance.

Covered: one variant per model family — FvgnA (``Fvgn.py:31-333``), FluxD
(``Flux.py:459-595``, the shipped flagship), MgnA (``Mgn.py:40-275``),
StreamFuncA (``StreamFunc.py:109-135``), ConservativeA
(``Conservative.py:49-262``), VertPotA (``VertPot.py:47-231``) — plus a FluxD
rollout-mode step (``update_features`` feedback) and a 50-step autoregressive
rollout. torch runs on CPU; JAX under the test conftest also runs on CPU.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from parity_shims import (copy_batchnorm, copy_conservative_weights,
                          copy_epd_weights, copy_vertpot_weights,
                          install_shims, make_ref_config, make_ref_dataset,
                          stats_to_python, to_reference_graphs)

install_shims()

from models.Fvgn import FvgnA as RefFvgnA            # noqa: E402
from models.Mgn import MgnA as RefMgnA               # noqa: E402
from models.Flux import FluxD as RefFluxD            # noqa: E402
from datasets.OpenFoam import NodeType as RefNodeType  # noqa: E402
from utils.loss import MSE_per_element_torch         # noqa: E402

from parity_shims import copy_scalar_params          # noqa: E402

from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, Trajectory
from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                   taylor_green_trajectory)
from gnn_fluid_dynamics_tpu.models import get_model_class
from gnn_fluid_dynamics_tpu.models.base import ModelConfig, feature_masks
from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator

HIDDEN, MP = 16, 2


def build_jax_side(name, loss_weights, num_timesteps=6, grad_weights=False,
                   **cfg_extra):
    """Unpadded single-mesh dataset + initialized JAX model + raw stats."""
    geom = make_geometry("cylinder", n_points=220, seed=3)
    fields = taylor_green_trajectory(geom, num_timesteps=num_timesteps,
                                     dt=0.01)
    ds = MeshDataset([Trajectory(mesh_id="m", geom=geom, fields=dict(fields))],
                     stride=1, data_window=2, pad_multiple=1)
    if grad_weights:
        ds.add_grad_weights("cell", 1)
    model = get_model_class(name)(
        ModelConfig(name=name, hidden_width=HIDDEN, mp_num=MP,
                    compute_dtype="float32", **cfg_extra),
        loss_weights=loss_weights)
    graph = ds.get_batch(ds.sample_map[:1])
    _, feats = model.transform_features(graph, None, mode="rollout")
    acc = StatsAccumulator(model.nmap)
    acc.update(feats, feature_masks(graph, feats))
    raw_stats = acc.finalize()
    model.set_stats(raw_stats)
    variables = jax.tree.map(
        np.asarray, dict(model.init(jax.random.PRNGKey(0), graph, feats)))
    return ds, model, graph, variables, raw_stats


def assert_losses_match(jax_losses, ref_losses, rtol=2e-4, atol=1e-6):
    for key, jval in jax_losses.items():
        assert key in ref_losses, f"reference missing {key}"
        rv = float(ref_losses[key])
        np.testing.assert_allclose(float(jval), rv, rtol=rtol, atol=atol,
                                   err_msg=f"loss component {key}")


# ---------------------------------------------------------------------------
# FvgnA
# ---------------------------------------------------------------------------

def test_fvgna_one_step_loss_parity():
    loss_weights = {"continuity": 0.1, "cell_velocity_change": 10.0,
                    "face_velocity": 1.0, "face_pressure": 1.0}
    ds, model, graph, variables, raw_stats = build_jax_side("FvgnA",
                                                            loss_weights)

    # --- JAX side: rollout-mode features (no noise/flip), train-mode forward
    tgraph, feats = model.transform_features(graph, None, mode="rollout")
    outputs, _ = model.forward(variables, tgraph, feats, mode="train")
    jax_losses = model.loss(outputs, feats, tgraph)

    # --- reference side
    cfg = make_ref_config(HIDDEN, MP, loss_weights)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = RefFvgnA(cfg, MSE_per_element_torch, dataset,
                   stats_to_python(raw_stats))
    copy_epd_weights(variables["params"]["EncodeProcessDecode_0"], ref, MP)
    copy_batchnorm(variables["params"]["integrator"]
                   ["face_area_norm"]["MaskedBatchNorm_0"]["BatchNorm_0"],
                   ref.integrator.face_area_norm)
    ref.train()

    graphs = to_reference_graphs(graph)
    graphs = RefFvgnA.transform_features(dataset, graphs)

    # feature parity first — catches transform drift separately from arch
    np.testing.assert_allclose(np.asarray(feats["cell_x"]),
                               graphs[0].x.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["face_x"]),
                               graphs[1].x.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["cell_y"]),
                               graphs[0].y.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["face_y"]),
                               graphs[1].y.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(feats["face_bc_mask"]),
                                  graphs[1].boundary_mask.numpy())

    with torch.no_grad():
        ref_out = ref(graphs, mode="train")
        ref_losses = ref.loss(ref_out, graphs)

    # output parity (normalized space)
    np.testing.assert_allclose(
        np.asarray(outputs["cell_velocity_change"]),
        ref_out["cell_velocity_change"].numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outputs["face_velocity"]),
        ref_out["face_velocity"].numpy(), rtol=2e-4, atol=1e-5)

    assert_losses_match(jax_losses, ref_losses)


# ---------------------------------------------------------------------------
# FluxD (the shipped flagship, Flux.py:459-595)
# ---------------------------------------------------------------------------

def test_fluxd_one_step_loss_parity():
    loss_weights = {"continuity": 0.1, "cell_velocity_change": 10.0,
                    "face_velocity": 1.0, "face_flux": 1.0,
                    "face_pressure": 1.0}
    ds, model, graph, variables, raw_stats = build_jax_side("FluxD",
                                                            loss_weights)

    tgraph, feats = model.transform_features(graph, None, mode="rollout")
    outputs, _ = model.forward(variables, tgraph, feats, mode="train")
    jax_losses = model.loss(outputs, feats, tgraph)

    cfg = make_ref_config(HIDDEN, MP, loss_weights)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = RefFluxD(cfg, MSE_per_element_torch, dataset,
                   stats_to_python(raw_stats))
    copy_epd_weights(variables["params"]["EncodeProcessDecode_0"], ref, MP)
    copy_scalar_params(variables["params"], ref,
                       ["velocity_scale_x", "velocity_scale_y",
                        "pressure_scale", "flux_scale", "diffusion_scale"])
    ref.train()

    graphs = to_reference_graphs(graph)
    graphs = RefFluxD.transform_features(dataset, graphs)

    np.testing.assert_allclose(np.asarray(feats["face_x"]),
                               graphs[1].x.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["face_y"]),
                               graphs[1].y.numpy(), rtol=1e-6, atol=1e-7)

    with torch.no_grad():
        ref_out = ref(graphs, mode="train")
        ref_losses = ref.loss(ref_out, graphs)

    for key in ("cell_velocity_change", "face_velocity", "face_pressure",
                "face_flux"):
        np.testing.assert_allclose(np.asarray(outputs[key]),
                                   ref_out[key].numpy(), rtol=5e-4,
                                   atol=1e-5, err_msg=key)
    np.testing.assert_allclose(np.asarray(outputs["cell_flux"]),
                               ref_out["cell_flux"].numpy(), rtol=5e-4,
                               atol=1e-5, err_msg="cell_flux")
    assert_losses_match(jax_losses, ref_losses)


def test_fluxd_rollout_mode_parity():
    """Rollout-mode forward (physical outputs, no re-normalization) +
    one ``update_features`` state-feedback step (Flux.py:489-515 rollout
    branch; FvgnA.update_features Fvgn.py:133-148)."""
    loss_weights = {"continuity": 0.1, "cell_velocity_change": 10.0,
                    "face_velocity": 1.0, "face_flux": 1.0,
                    "face_pressure": 1.0}
    ds, model, graph, variables, raw_stats = build_jax_side("FluxD",
                                                            loss_weights)
    tgraph, feats = model.transform_features(graph, None, mode="rollout")
    outputs, _ = model.forward(variables, tgraph, feats, mode="rollout")

    cfg = make_ref_config(HIDDEN, MP, loss_weights)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = RefFluxD(cfg, MSE_per_element_torch, dataset,
                   stats_to_python(raw_stats))
    copy_epd_weights(variables["params"]["EncodeProcessDecode_0"], ref, MP)
    copy_scalar_params(variables["params"], ref,
                       ["velocity_scale_x", "velocity_scale_y",
                        "pressure_scale", "flux_scale", "diffusion_scale"])
    ref.eval()

    graphs = to_reference_graphs(graph)
    graphs = RefFluxD.transform_features(dataset, graphs)
    with torch.no_grad():
        ref_out = ref([g.clone() for g in graphs], mode="rollout")

    for key in ("cell_velocity_change", "face_velocity", "face_pressure",
                "face_flux"):
        np.testing.assert_allclose(np.asarray(outputs[key]),
                                   ref_out[key].numpy(), rtol=5e-4,
                                   atol=1e-6, err_msg=key)


# ---------------------------------------------------------------------------
# MgnA (Mgn.py:40-275)
# ---------------------------------------------------------------------------

def test_mgna_one_step_loss_parity():
    loss_weights = {"cell_velocity_change": 1.0, "cell_pressure": 1.0}
    ds, model, graph, variables, raw_stats = build_jax_side("MgnA",
                                                            loss_weights)

    tgraph, feats = model.transform_features(graph, None, mode="rollout")
    outputs, _ = model.forward(variables, tgraph, feats, mode="train")
    jax_losses = model.loss(outputs, feats, tgraph)

    cfg = make_ref_config(HIDDEN, MP, loss_weights,
                          cell_grad_weights_order=1)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = RefMgnA(cfg, MSE_per_element_torch, dataset,
                  stats_to_python(raw_stats))
    copy_epd_weights(variables["params"]["EncodeProcessDecode_0"], ref, MP,
                     jax_decoder_key="decoder_cell")
    ref.train()

    graphs = to_reference_graphs(graph)
    graphs = RefMgnA.transform_features(dataset, graphs)

    np.testing.assert_allclose(np.asarray(feats["cell_x"]),
                               graphs[0].x.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["face_x"]),
                               graphs[1].x.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["cell_y"]),
                               graphs[0].y.numpy(), rtol=1e-6, atol=1e-7)

    with torch.no_grad():
        ref_out = ref(graphs, mode="train")
        ref_losses = ref.loss(ref_out, graphs)

    np.testing.assert_allclose(
        np.asarray(outputs["cell_velocity_change"]),
        ref_out["cell_velocity_change"].numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outputs["cell_pressure"]),
        ref_out["cell_pressure"].numpy(), rtol=2e-4, atol=1e-5)
    assert_losses_match(jax_losses, ref_losses)


# ---------------------------------------------------------------------------
# StreamFuncA (StreamFunc.py:109-135) — implementation-parity instrument for
# the "StreamFuncA never learns" investigation: if the executed reference
# produces the same losses, the learning failure is the variant's, not the
# port's.
# ---------------------------------------------------------------------------

def test_streamfunca_one_step_loss_parity():
    from models.StreamFunc import StreamFuncA as RefStreamFuncA
    loss_weights = {"cell_velocity": 10.0, "cell_pressure": 1.0}
    ds, model, graph, variables, raw_stats = build_jax_side(
        "StreamFuncA", loss_weights, grad_weights=True)

    tgraph, feats = model.transform_features(graph, None, mode="rollout")
    outputs, _ = model.forward(variables, tgraph, feats, mode="train")
    jax_losses = model.loss(outputs, feats, tgraph)

    cfg = make_ref_config(HIDDEN, MP, loss_weights,
                          cell_grad_weights_order=1)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = RefStreamFuncA(cfg, MSE_per_element_torch, dataset,
                         stats_to_python(raw_stats))
    copy_epd_weights(variables["params"]["EncodeProcessDecode_0"], ref, MP,
                     jax_decoder_key="decoder_cell")
    ref.train()

    graphs = to_reference_graphs(graph)
    graphs = RefStreamFuncA.transform_features(dataset, graphs)

    np.testing.assert_allclose(np.asarray(feats["cell_y"]),
                               graphs[0].y.numpy(), rtol=1e-6, atol=1e-7)

    with torch.no_grad():
        ref_out = ref(graphs, mode="train")
        ref_losses = ref.loss(ref_out, graphs)

    np.testing.assert_allclose(
        np.asarray(outputs["cell_velocity"]),
        ref_out["cell_velocity"].numpy(), rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(outputs["cell_pressure"]),
        ref_out["cell_pressure"].numpy(), rtol=5e-4, atol=1e-5)
    assert_losses_match(jax_losses, ref_losses, rtol=5e-4)


# ---------------------------------------------------------------------------
# ConservativeA (Conservative.py:49-262) — dual symm/asym encoder, asym gate
# in the first block, two-way signed cell aggregation, FvgnA integrator/loss.
# ---------------------------------------------------------------------------

def test_conservativea_one_step_loss_parity():
    from models.Conservative import ConservativeA as RefConsA
    loss_weights = {"continuity": 0.1, "cell_velocity_change": 10.0,
                    "face_velocity": 1.0, "face_pressure": 1.0}
    ds, model, graph, variables, raw_stats = build_jax_side("ConservativeA",
                                                            loss_weights)

    tgraph, feats = model.transform_features(graph, None, mode="rollout")
    outputs, _ = model.forward(variables, tgraph, feats, mode="train")
    jax_losses = model.loss(outputs, feats, tgraph)

    cfg = make_ref_config(HIDDEN, MP, loss_weights)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = RefConsA(cfg, MSE_per_element_torch, dataset,
                   stats_to_python(raw_stats))
    copy_conservative_weights(variables["params"], ref, MP)
    copy_batchnorm(variables["params"]["integrator"]
                   ["face_area_norm"]["MaskedBatchNorm_0"]["BatchNorm_0"],
                   ref.integrator.face_area_norm)
    ref.train()

    graphs = to_reference_graphs(graph)
    graphs = RefConsA.transform_features(dataset, graphs)

    # feature parity (x / x_symm / x_asym / targets / bc mask)
    np.testing.assert_allclose(np.asarray(feats["cell_x"]),
                               graphs[0].x.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["face_xs"]),
                               graphs[1].x_symm.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feats["face_xa"]),
                               graphs[1].x_asym.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["cell_y"]),
                               graphs[0].y.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["face_y"]),
                               graphs[1].y.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(feats["face_bc_mask"]),
                                  graphs[1].boundary_mask.numpy())

    with torch.no_grad():
        ref_out = ref(graphs, mode="train")
        ref_losses = ref.loss(ref_out, graphs)

    np.testing.assert_allclose(
        np.asarray(outputs["cell_velocity_change"]),
        ref_out["cell_velocity_change"].numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outputs["face_velocity"]),
        ref_out["face_velocity"].numpy(), rtol=2e-4, atol=1e-5)
    assert_losses_match(jax_losses, ref_losses)


# ---------------------------------------------------------------------------
# VertPotA (VertPot.py:47-231) — vertex-potential cell flux (exactly
# divergence-free by telescoping), flux-advection integrator with
# BatchNorm'd dt/V̄ coefficients, no flux loss.
# ---------------------------------------------------------------------------

def test_vertpota_one_step_loss_parity():
    from models.VertPot import VertPotA as RefVertPotA
    loss_weights = {"continuity": 0.1, "cell_velocity_change": 10.0,
                    "face_velocity": 1.0, "face_pressure": 1.0}
    ds, model, graph, variables, raw_stats = build_jax_side("VertPotA",
                                                            loss_weights)

    tgraph, feats = model.transform_features(graph, None, mode="rollout")
    outputs, _ = model.forward(variables, tgraph, feats, mode="train")
    jax_losses = model.loss(outputs, feats, tgraph)

    cfg = make_ref_config(HIDDEN, MP, loss_weights)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = RefVertPotA(cfg, MSE_per_element_torch, dataset,
                      stats_to_python(raw_stats))
    copy_vertpot_weights(variables["params"], ref, MP)
    copy_batchnorm(variables["params"]
                   ["face_area_norm"]["MaskedBatchNorm_0"]["BatchNorm_0"],
                   ref.integrator.face_area_norm)
    copy_batchnorm(variables["params"]
                   ["vol_dt_norm"]["MaskedBatchNorm_0"]["BatchNorm_0"],
                   ref.integrator.vol_dt_norm)
    ref.train()

    graphs = to_reference_graphs(graph)
    graphs = RefVertPotA.transform_features(dataset, graphs)

    np.testing.assert_allclose(np.asarray(feats["face_x"]),
                               graphs[1].x.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(feats["face_y"]),
                               graphs[1].y.numpy(), rtol=1e-6, atol=1e-7)

    with torch.no_grad():
        ref_out = ref(graphs, mode="train")
        ref_losses = ref.loss(ref_out, graphs)

    # exact divergence-free potential flux on both sides
    assert float(torch.abs(ref_out["cell_flux"].sum(dim=1)).max()) < 1e-5
    assert float(jnp_abs_max_rowsum(outputs["cell_flux"])) < 1e-5

    for key in ("cell_velocity_change", "cell_flux", "face_velocity",
                "face_pressure"):
        np.testing.assert_allclose(np.asarray(outputs[key]),
                                   ref_out[key].numpy(), rtol=5e-4,
                                   atol=1e-5, err_msg=key)
    assert_losses_match(jax_losses, ref_losses)


def jnp_abs_max_rowsum(x):
    arr = np.asarray(x)
    return np.abs(arr.sum(axis=1)).max()


# ---------------------------------------------------------------------------
# 50-step autoregressive rollout parity (stretch goal): my lax.scan rollout
# engine vs the reference's step loop (rollout.py:304-369 semantics: forward
# in rollout mode -> derive cell_velocity/cell_pressure -> update_features).
# ---------------------------------------------------------------------------

def _interp_face_to_centroid(face_vals, face_index):
    return (face_vals[face_index[0]] + face_vals[face_index[1]]
            + face_vals[face_index[2]]) / 3.0


def test_fluxd_50step_rollout_parity():
    from gnn_fluid_dynamics_tpu.rollout.engine import (RolloutConfig,
                                                       rollout_scan)

    loss_weights = {"continuity": 0.1, "cell_velocity_change": 10.0,
                    "face_velocity": 1.0, "face_flux": 1.0,
                    "face_pressure": 1.0}
    ds, model, graph, variables, raw_stats = build_jax_side("FluxD",
                                                            loss_weights)
    tgraph, feats = model.transform_features(graph, None, mode="rollout")

    # --- JAX: the production rollout path (lax.scan, engine.py)
    _, fields = rollout_scan(
        model, variables, tgraph, feats,
        config=RolloutConfig(num_steps=50, compute_error=False,
                             save_fields=True))
    jax_v = np.asarray(fields["cell_velocity"])          # (50, C, 2)
    jax_p = np.asarray(fields["cell_pressure"])          # (50, C, 1)

    # --- reference: eager step loop per rollout.py:313-369
    cfg = make_ref_config(HIDDEN, MP, loss_weights)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = RefFluxD(cfg, MSE_per_element_torch, dataset,
                   stats_to_python(raw_stats))
    copy_epd_weights(variables["params"]["EncodeProcessDecode_0"], ref, MP)
    copy_scalar_params(variables["params"], ref,
                       ["velocity_scale_x", "velocity_scale_y",
                        "pressure_scale", "flux_scale", "diffusion_scale"])
    ref.eval()

    graphs = to_reference_graphs(graph)
    graphs = RefFluxD.transform_features(dataset, graphs)
    ref_v, ref_p = [], []
    with torch.no_grad():
        for _ in range(50):
            out = ref([g.clone() for g in graphs], mode="rollout")
            solutions = dict(out)
            solutions["cell_velocity"] = (graphs[0].x[:, 0:2]
                                          + solutions["cell_velocity_change"])
            solutions["cell_pressure"] = _interp_face_to_centroid(
                solutions["face_pressure"], graphs[1].face)
            ref_v.append(solutions["cell_velocity"].numpy().copy())
            ref_p.append(solutions["cell_pressure"].numpy().copy())
            graphs = ref.update_features(solutions, graphs)
    ref_v, ref_p = np.stack(ref_v), np.stack(ref_p)

    # feedback amplifies fp differences: tight at step 1, relative-to-field
    # tolerance over the whole horizon
    scale_v = np.abs(ref_v).max()
    np.testing.assert_allclose(jax_v[0], ref_v[0], rtol=1e-3,
                               atol=1e-5 * scale_v)
    assert np.max(np.abs(jax_v - ref_v)) < 5e-3 * scale_v, (
        np.max(np.abs(jax_v - ref_v)), scale_v)
    scale_p = np.abs(ref_p).max()
    assert np.max(np.abs(jax_p - ref_p)) < 5e-3 * scale_p, (
        np.max(np.abs(jax_p - ref_p)), scale_p)


if __name__ == "__main__":
    test_fvgna_one_step_loss_parity()
    print("FvgnA parity OK")
    test_fluxd_one_step_loss_parity()
    print("FluxD parity OK")
    test_fluxd_rollout_mode_parity()
    print("FluxD rollout parity OK")
    test_mgna_one_step_loss_parity()
    print("MgnA parity OK")
    test_conservativea_one_step_loss_parity()
    print("ConservativeA parity OK")
    test_vertpota_one_step_loss_parity()
    print("VertPotA parity OK")
