"""Golden-value one-step regression tests (SURVEY.md section 4, item 2).

Pins the total log-loss of one deterministic forward+loss step per model
family on a tiny synthetic mesh, guarding the numerics (feature transforms,
normalization, architecture wiring, loss composition) against silent change.
Regenerate the values intentionally when the numerical contract changes:

    python -m pytest tests/test_golden.py --collect-only  # see the recipe

VertPot* values regenerated after the executed-reference parity harness
(test_parity_reference.py) caught the vertex block aggregating the
post-residual edge latent; the reference sums the pre-residual edge output
(VertPot.py:201-208).
"""

import jax
import numpy as np
import pytest

from test_models import build_graph, make_model

# All 38 registered variants (VERDICT item 7). FvgnI pins to FvgnA's value
# by design: its update_features is literally identical to FvgnA's
# (Fvgn.py:133-148 vs 1117-1137) — the golden equality is itself the parity
# check. FvgnD differs from FvgnA only in 5th-decimal: pushforward_use makes
# its stats-only cell_y v[-1]-v[-2] instead of v[-1]-v[0] (Fvgn.py:833-835),
# shifting the Delta-v normalization stats on the window-3 fixture.
GOLDEN = {
    "ConservativeA": 4.890110,
    "ConservativeB": 3.452843,
    "ConservativeD": 3.222157,
    "ConservativeE": 3.090451,
    "ConservativeF": 3.131685,
    "ConservativeG": 3.302252,
    "ConservativeH": 2.516919,
    "ConservativeI": 3.243507,
    "ConservativeJ": 12.528793,
    "ConservativeK": 2.592932,
    "FluxA": 2.915838,
    "FluxB": 3.203664,
    "FluxC": 2.346259,
    "FluxD": 3.467191,
    "FvgnA": 3.236795,
    "FvgnB": 10.485601,
    "FvgnC": 4.906010,
    "FvgnD": 3.236751,
    "FvgnE": 2.233303,
    "FvgnF": 4.107755,
    "FvgnH": 3.399202,
    "FvgnI": 3.236795,
    # regenerated when the round-4 parity matrix caught FvgnJ using the
    # normalized FvgnIntegrator; the reference integrates in raw physical
    # areas with nu*plain-sum diffusion (Fvgn.py:1239-1273)
    "FvgnJ": 12.846555,
    "FvgnK": 9.002707,
    "MgnA": 2.639695,
    "MgnB": 2.461878,
    "MgnC": 2.099358,
    "StreamFuncA": 2.499359,
    "StreamFuncB": 2.499358,
    "StreamFuncC": 2.238754,
    "StreamFuncD": 2.087780,
    "VertPotA": 3.458636,
    # VertPotB/D/F/G regenerated after the round-4 executed-reference
    # parity matrix corrected their integrator/conversion semantics
    # (denormalize-before-integrate for B, FluxA-integrator splice for
    # D, fluxF shimmed semantics for F, scrambled last-write conversion
    # for G — see models/vertpot.py docstrings)
    "VertPotB": 12.229054,
    "VertPotC": 3.996113,
    "VertPotD": 3.574603,
    "VertPotE": 4.836900,
    "VertPotF": 17.416739,
    "VertPotG": 3.579032,
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_one_step_loss_golden(name):
    g = build_graph(grad_weights=True)
    kw = {"bundle_size": 2} if name == "FvgnC" else {}
    m = make_model(name, g, **kw)
    tg, feats = m.transform_features(g, None, mode="train")
    v = m.init(jax.random.PRNGKey(7), tg, feats)
    out, _ = m.forward(v, tg, feats, mode="train")
    losses = m.loss(out, feats, tg)
    np.testing.assert_allclose(float(losses["total_log_loss"]),
                               GOLDEN[name], rtol=1e-4)


def test_fvgna_forward_numpy_rederivation():
    """Independent numpy re-derivation of one full FvgnA rollout-mode forward
    (VERDICT item 7; reference contract ``src/models/Fvgn.py:150-333``):
    z-score input normalization, encoder MLPs, 'twice message passing'
    (edge-half scatter onto vertices + 3-vertex cell average), face blocks
    with owner/neighbour gathers, residuals, decoder, the BatchNorm'd
    area*dt/V-bar integrator, and inverse-z output denormalization — all
    re-implemented with plain numpy and compared against the jitted model."""
    g = build_graph(grad_weights=False)
    m = make_model("FvgnA", g)                    # hidden 32, mp_num 2
    tg, feats = m.transform_features(g, None, mode="rollout")
    v = m.init(jax.random.PRNGKey(3), tg, feats)
    out, _ = m.forward(v, tg, feats, mode="rollout")

    P = jax.tree.map(lambda x: np.asarray(x, np.float64), v["params"])
    BS = jax.tree.map(lambda x: np.asarray(x, np.float64), v["batch_stats"])
    stats = {k: {s: float(x) for s, x in d.items()} for k, d in m.stats.items()}

    # --- normalization (normalizer.py z_score; reference normalisation.py:284-291)
    def z(x, key, inv=False):
        mean = stats[key]["mean"]
        std = max(stats[key]["std"], 1e-8) + 1e-8
        return x * std + mean if inv else (x - mean) / std

    cell_x = np.asarray(feats["cell_x"], np.float64).copy()
    face_x = np.asarray(feats["face_x"], np.float64).copy()
    for f in m.nmap.inputs:
        tens = {"cell_x": cell_x, "face_x": face_x}.get(f.tensor)
        if tens is not None:
            tens[:, f.start:f.stop] = z(tens[:, f.start:f.stop], f.stat_key)

    # --- numpy NN primitives (arch.py MLP; reference Model.py:12-40)
    def dense(p, x):
        return x @ p["kernel"] + p["bias"]

    def silu(x):
        return x / (1.0 + np.exp(-x))

    def layernorm(p, x, eps=1e-5):  # torch-parity eps (arch.py MLP)
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * p["scale"] + p["bias"]

    def mlp(p, x, ln=True):
        x = silu(dense(p["Dense_0"], x))
        x = silu(dense(p["Dense_1"], x))
        x = dense(p["Dense_2"], x)
        return layernorm(p["LayerNorm_0"], x) if ln else x

    epd = P["EncodeProcessDecode_0"]
    cell = mlp(epd["Encoder_0"]["cell_mlp"], cell_x)
    edge = mlp(epd["Encoder_0"]["face_mlp"], face_x)

    vei = np.asarray(tg.vertex_edge_index)
    vface = np.asarray(tg.vertex_face)
    cei = np.asarray(tg.cell_edge_index)
    V = int(tg.num_vertices)
    H = cell.shape[1]
    for i in range(2):
        p = epd[f"GNBlock_{i}"]
        # twice message passing (reference Fvgn.py:305-321)
        vtx = np.zeros((V, H // 2))
        np.add.at(vtx, vei[0], edge[:, : H // 2])
        np.add.at(vtx, vei[1], edge[:, H // 2:])
        agg = (vtx[vface[0]] + vtx[vface[1]] + vtx[vface[2]]) / 3.0
        cell_new = mlp(p["CellBlock_0"]["MLP_0"],
                       np.concatenate([cell, agg], axis=1))
        edge_new = mlp(p["FaceBlock_0"]["MLP_0"],
                       np.concatenate([edge, cell_new[cei[0]],
                                       cell_new[cei[1]]], axis=1))
        cell = cell + cell_new
        edge = edge + edge_new
    face_out = mlp(epd["decoder_face"], edge, ln=False)

    # --- integrator (arch.py FvgnIntegrator; reference Fvgn.py:214-255)
    vol = np.asarray(tg.cell_volume, np.float64).reshape(-1)
    v_avg = np.maximum(0.5 * (vol[cei[0]] + vol[cei[1]]), 1e-12)
    scaled = (np.asarray(tg.face_area, np.float64).reshape(-1)
              * float(np.mean(np.asarray(tg.dt))) / v_avg)[:, None]
    bn_p = P["integrator"]["face_area_norm"]["MaskedBatchNorm_0"]["BatchNorm_0"]
    bn_s = BS["integrator"]["face_area_norm"]["MaskedBatchNorm_0"]["BatchNorm_0"]
    e_face = ((scaled - bn_s["mean"]) / np.sqrt(bn_s["var"] + 1e-5)
              * bn_p["scale"] + bn_p["bias"])

    fidx = np.asarray(tg.face_index).T                       # (C, 3)
    unv = np.asarray(tg.cell_normal, np.float64)             # (C, 3, 2)
    uv, pr, fd = face_out[:, :2], face_out[:, 2:3], face_out[:, 3:]
    uu = np.stack([uv[:, 0] * uv[:, 0], uv[:, 0] * uv[:, 1],
                   uv[:, 1] * uv[:, 0], uv[:, 1] * uv[:, 1]], axis=1)
    e3 = e_face[fidx]                                        # (C, 3, 1)
    a = np.einsum("cfkd,cfd->cfk", uu[fidx].reshape(-1, 3, 2, 2), unv)
    phi_a = np.sum(a * e3, axis=1)
    phi_d = np.sum(fd[fidx], axis=1)
    phi_p = np.sum(pr[fidx] * unv * e3, axis=1)
    acc = -phi_a - phi_p + phi_d
    acc *= np.asarray(tg.cell_mask)[:, None]

    # --- output denormalization (rollout mode)
    acc[:, 0] = z(acc[:, 0], "cell_velocity_change_x", inv=True)
    acc[:, 1] = z(acc[:, 1], "cell_velocity_change_y", inv=True)
    fo = face_out.copy()
    fo[:, 0] = z(fo[:, 0], "face_velocity_x", inv=True)
    fo[:, 1] = z(fo[:, 1], "face_velocity_y", inv=True)
    fo[:, 2] = z(fo[:, 2], "face_pressure", inv=True)

    np.testing.assert_allclose(np.asarray(out["cell_velocity_change"]), acc,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["face_velocity"]), fo[:, :2],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["face_pressure"]), fo[:, 2:3],
                               rtol=2e-4, atol=2e-5)
