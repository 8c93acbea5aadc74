"""Rollout-mode executed-reference parity, one variant per family (VERDICT r4
missing #2 / next #4).

The 38-row matrix (``test_parity_matrix``) checks train-mode one-step losses;
these tests exercise the rollout-specific code paths the matrix cannot see:

- rollout-mode ``forward`` (physical outputs, inverse normalization),
- ``update_features`` state feedback, incl. each family's BC-clamp choice
  (``Fvgn.py:133-148`` INFLOW|WALL; ``Mgn.py:139-151`` full boundary mask;
  ``Conservative.py:147-162`` writes x_asym; ``StreamFunc.py:77-91``
  INFLOW|WALL on the Mgn feature layout),
- a 50-step autoregressive trajectory vs the reference's eager step loop
  (``rollout.py:313-369`` semantics: forward -> derive cell_velocity /
  cell_pressure -> update_features).

Families: MgnA, FvgnA, ConservativeA, VertPotA, StreamFuncB. FluxD has the
same pair of checks in ``test_parity_reference``.

torch executes the reference from ``/root/reference/src`` on CPU; JAX runs on
CPU under the test conftest.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from parity_shims import (install_shims, make_ref_config, make_ref_dataset,
                          stats_to_python, to_reference_graphs)

install_shims()

from datasets.OpenFoam import NodeType as RefNodeType   # noqa: E402
from utils.loss import MSE_per_element_torch            # noqa: E402

from test_parity_matrix import SPECS, REF_FAMILY, build_jax, family_of  # noqa: E402

from gnn_fluid_dynamics_tpu.rollout.engine import (RolloutConfig,  # noqa: E402
                                                   rollout_scan)

ROLLOUT_FAMILIES = ["MgnA", "FvgnA", "ConservativeA", "VertPotA",
                    "StreamFuncB"]
STEPS = 50
# StreamFuncB's MLS-curl + neighbour-difference feedback is expansive under
# random weights (~x2.5/step noise growth even with the damped decoder), so
# fp drift swamps the comparison beyond ~step 20. A 20-step window at 1e-2
# rel is still a sharp semantic discriminator: re-introducing the pre-fix
# boundary-mask bug (commit history) produces rel=4.5e-1 at step 1.
COMPARE_STEPS = {"StreamFuncB": 20}
COMPARE_RTOL = {"StreamFuncB": 1e-2}


def _interp_face_to_centroid(face_vals, face_index):
    return (face_vals[face_index[0]] + face_vals[face_index[1]]
            + face_vals[face_index[2]]) / 3.0


def build_pair(name):
    """JAX model + transplanted reference model in eval (rollout) mode."""
    spec = SPECS[name]
    ds, model, graph, variables, raw_stats = build_jax(
        name, spec.loss_weights, **spec.build, **spec.jax_cfg)
    if name == "StreamFuncB":
        # An untrained psi-decoder makes |curl psi| explode ~7x/step, turning
        # the 50-step comparison into chaos-amplified fp noise by step 10
        # (verified: smooth exponential drift, no step discontinuity). Damp
        # the decoder BEFORE transplanting so BOTH sides run the identical
        # tamed weights and the horizon stays semantically comparable.
        dec = variables["params"]["EncodeProcessDecode_0"]["decoder_cell"]
        last = sorted(k for k in dec if k.startswith("Dense"))[-1]
        dec[last]["kernel"] = np.asarray(dec[last]["kernel"]) * 1e-2
        dec[last]["bias"] = np.asarray(dec[last]["bias"]) * 1e-2
    tgraph, feats = model.transform_features(graph, None, mode="rollout")

    ref_cls = getattr(REF_FAMILY[family_of(name)], name)
    cfg = make_ref_config(16, 2, spec.loss_weights, **spec.ref_cfg)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = ref_cls(cfg, MSE_per_element_torch, dataset,
                  stats_to_python(raw_stats))
    spec.transplant(variables["params"], ref)
    if spec.fix_ref is not None:
        spec.fix_ref(ref)
    ref.eval()   # reference rollout.py:270

    graphs = to_reference_graphs(tgraph)
    graphs = ref_cls.transform_features(dataset, graphs)
    return model, variables, tgraph, feats, ref, graphs


@pytest.mark.parametrize("name", ROLLOUT_FAMILIES)
def test_rollout_mode_forward_parity(name):
    """One rollout-mode forward: every shared physical output matches."""
    model, variables, tgraph, feats, ref, graphs = build_pair(name)
    outputs, _ = model.forward(variables, tgraph, feats, mode="rollout")
    with torch.no_grad():
        ref_out = ref([g.clone() for g in graphs], mode="rollout")

    compared = 0
    for key, jval in outputs.items():
        if key.startswith("_") or key not in ref_out or ref_out[key] is None:
            continue
        jarr, rarr = np.asarray(jval), ref_out[key].detach().numpy()
        assert jarr.shape == rarr.shape, (key, jarr.shape, rarr.shape)
        scale = max(np.abs(rarr).max(), 1e-6)
        np.testing.assert_allclose(jarr, rarr, rtol=2e-3, atol=2e-5 * scale,
                                   err_msg=f"{name} rollout output {key}")
        compared += 1
    assert compared >= 2, f"{name}: only {compared} shared outputs"


@pytest.mark.parametrize("name", ROLLOUT_FAMILIES)
def test_50step_rollout_parity(name):
    """lax.scan rollout engine vs the reference's eager loop, 50 steps."""
    model, variables, tgraph, feats, ref, graphs = build_pair(name)

    _, fields = rollout_scan(
        model, variables, tgraph, feats,
        config=RolloutConfig(num_steps=STEPS, compute_error=False,
                             save_fields=True))
    jax_v = np.asarray(fields["cell_velocity"])          # (STEPS, C, 2)
    jax_p = np.asarray(fields["cell_pressure"])          # (STEPS, C, 1)

    ref_v, ref_p = [], []
    with torch.no_grad():
        for _ in range(STEPS):
            out = ref([g.clone() for g in graphs], mode="rollout")
            sol = dict(out)
            if "cell_velocity" not in sol:
                sol["cell_velocity"] = (graphs[0].x[:, 0:2]
                                        + sol["cell_velocity_change"])
            if "cell_pressure" not in sol and "face_pressure" in sol:
                sol["cell_pressure"] = _interp_face_to_centroid(
                    sol["face_pressure"], graphs[1].face)
            ref_v.append(sol["cell_velocity"].numpy().copy())
            ref_p.append(sol["cell_pressure"].numpy().copy())
            graphs = ref.update_features(sol, graphs)
    ref_v, ref_p = np.stack(ref_v), np.stack(ref_p)

    # feedback amplifies fp differences: tight at step 1, relative-to-field
    # tolerance over the comparison window (same bars as the FluxD archetype)
    n = COMPARE_STEPS.get(name, STEPS)
    rtol = COMPARE_RTOL.get(name, 5e-3)
    jv, rv = jax_v[:n], ref_v[:n].reshape(jax_v[:n].shape)
    jp, rp = jax_p[:n], ref_p[:n].reshape(jax_p[:n].shape)
    scale_v = np.abs(rv).max()
    np.testing.assert_allclose(jv[0], rv[0], rtol=1e-3, atol=1e-5 * scale_v,
                               err_msg=f"{name} step-0 velocity")
    assert np.max(np.abs(jv - rv)) < rtol * scale_v, (
        name, np.max(np.abs(jv - rv)), scale_v)
    scale_p = max(np.abs(rp).max(), 1e-6)
    assert np.max(np.abs(jp - rp)) < rtol * scale_p, (
        name, np.max(np.abs(jp - rp)), scale_p)
    # the full horizon must still run without NaN/Inf on both sides
    assert np.isfinite(jax_v).all() and np.isfinite(ref_v).all()


if __name__ == "__main__":
    for nm in ROLLOUT_FAMILIES:
        test_rollout_mode_forward_parity(nm)
        print(nm, "rollout-mode forward parity OK")
        test_50step_rollout_parity(nm)
        print(nm, "50-step rollout parity OK")
