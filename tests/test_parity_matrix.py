"""Executed-reference parity MATRIX: every registered variant (VERDICT r3
missing #2) vs the PyTorch reference run live from ``/root/reference/src``.

One parametrized test per variant: build the JAX model, transplant its
weights into the reference class of the same name, feed both the identical
unpadded mesh + statistics, and assert every loss component (and every
shared physical output) matches to float32 tolerance.

``scripts/parity_matrix.py`` runs the same rows outside pytest and writes
the committed matrix artifact ``runs/parity/matrix.json`` + ``PARITY.md``.

The six archetype rows duplicated from ``test_parity_reference.py`` are kept
here too so the matrix artifact is complete in one place; that module
additionally checks feature-level parity and a 50-step rollout.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from parity_shims import (_t, copy_batchnorm, copy_conservative_weights,
                          copy_epd_weights, copy_scalar_params,
                          copy_vertpot_weights, _copy_mlp, _copy_antisym_mlp,
                          install_shims, make_ref_config, make_ref_dataset,
                          stats_to_python, to_reference_graphs)

install_shims()

from datasets.OpenFoam import NodeType as RefNodeType   # noqa: E402
from utils.loss import MSE_per_element_torch            # noqa: E402
import models.Fvgn as RF                                # noqa: E402
import models.Flux as RFlux                             # noqa: E402
import models.Mgn as RMgn                               # noqa: E402
import models.Conservative as RCons                     # noqa: E402
import models.VertPot as RVP                            # noqa: E402
import models.StreamFunc as RSF                         # noqa: E402

from gnn_fluid_dynamics_tpu.data.pipeline import MeshDataset, Trajectory
from gnn_fluid_dynamics_tpu.data.synthetic import (make_geometry,
                                                   taylor_green_trajectory)
from gnn_fluid_dynamics_tpu.models import get_model_class
from gnn_fluid_dynamics_tpu.models.base import ModelConfig, feature_masks
from gnn_fluid_dynamics_tpu.models.normalizer import StatsAccumulator

HIDDEN, MP = 16, 2

LW_FVGN = {"continuity": 0.1, "cell_velocity_change": 10.0,
           "face_velocity": 1.0, "face_pressure": 1.0}
LW_FLUX = dict(LW_FVGN, face_flux=1.0)
LW_MGN = {"cell_velocity_change": 1.0, "cell_pressure": 1.0}
LW_MGNB = {"continuity": 0.1, "cell_velocity": 1.0, "cell_pressure": 1.0}
LW_SF = {"cell_velocity": 10.0, "cell_pressure": 1.0}

REF_FAMILY = {"Fvgn": RF, "Flux": RFlux, "Mgn": RMgn,
              "Conservative": RCons, "VertPot": RVP, "StreamFunc": RSF}


def family_of(name):
    for fam in REF_FAMILY:
        if name.startswith(fam):
            return fam
    raise KeyError(name)


def build_jax(name, loss_weights, *, window=2, n_steps=6, cell_gw=None,
              face_gw=None, **cfg_extra):
    """Unpadded single-mesh dataset + initialized JAX model + raw stats."""
    geom = make_geometry("cylinder", n_points=220, seed=3)
    fields = taylor_green_trajectory(geom, num_timesteps=n_steps, dt=0.01)
    ds = MeshDataset([Trajectory(mesh_id="m", geom=geom, fields=dict(fields))],
                     stride=1, data_window=window, pad_multiple=1)
    if cell_gw is not None:
        ds.add_grad_weights("cell", cell_gw)
    if face_gw is not None:
        ds.add_grad_weights("face", face_gw)
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


# ---------------------------------------------------------------------------
# Transplant helpers beyond parity_shims' family copiers
# ---------------------------------------------------------------------------

def copy_shared_block(params_epd, ref_model):
    """FvgnF layout: one shared GN block + step scalar (Fvgn.py:883-1010)."""
    enc = params_epd["Encoder_0"]
    _copy_mlp(enc["face_mlp"], ref_model.encoder.face_mlp, True)
    _copy_mlp(enc["cell_mlp"], ref_model.encoder.cell_mlp, True)
    blk = params_epd["GNBlock_0"]
    _copy_mlp(blk["CellBlock_0"]["MLP_0"], ref_model.gn_block.cell_block.cell_mlp,
              True)
    _copy_mlp(blk["FaceBlock_0"]["MLP_0"], ref_model.gn_block.face_block.face_mlp,
              True)
    _copy_mlp(params_epd["decoder_face"], ref_model.decoder.face_mlp, False)


def copy_fvgnj_scales(params, ref):
    """My per-channel LearnedScaleDenorm -> the reference's scalar x/y
    scale+bias parameters (Fvgn.py:1151-1162)."""
    p = {k: np.asarray(v["scale"]).reshape(-1) for k, v in params.items()
         if k.endswith("_scale")}
    b = {k: np.asarray(v["bias"]).reshape(-1) for k, v in params.items()
         if k.endswith("_scale")}
    with torch.no_grad():
        ref.velocity_scale_x.copy_(torch.tensor(float(p["velocity_scale"][0])))
        ref.velocity_scale_y.copy_(torch.tensor(float(p["velocity_scale"][1])))
        ref.pressure_scale.copy_(torch.tensor(float(p["pressure_scale"][0])))
        assert np.all(p["diffusion_scale"] == p["diffusion_scale"][0])
        ref.diffusion_scale.copy_(
            torch.tensor(float(p["diffusion_scale"][0])))
        ref.velocity_bias_x.copy_(torch.tensor(float(b["velocity_scale"][0])))
        ref.velocity_bias_y.copy_(torch.tensor(float(b["velocity_scale"][1])))
        ref.pressure_bias.copy_(torch.tensor(float(b["pressure_scale"][0])))
        assert np.all(b["diffusion_scale"] == b["diffusion_scale"][0])
        ref.diffusion_bias.copy_(torch.tensor(float(b["diffusion_scale"][0])))


def copy_scalar(params, ref, jax_name, ref_attr):
    with torch.no_grad():
        getattr(ref, ref_attr).copy_(
            torch.tensor(float(np.asarray(params[jax_name]).reshape(()))))


# ---------------------------------------------------------------------------
# Variant specs
# ---------------------------------------------------------------------------

class Spec:
    """One matrix row: how to build / transplant / compare a variant."""

    def __init__(self, loss_weights, transplant, *, jax_cfg=None, ref_cfg=None,
                 build=None, post_transform=None, rtol=5e-4, atol=2e-5,
                 out_rtol=5e-4, out_atol=5e-5, skip_loss=(),
                 compare_loss=True, fix_ref=None):
        self.loss_weights = loss_weights
        self.transplant = transplant
        self.jax_cfg = jax_cfg or {}
        self.ref_cfg = ref_cfg or {}
        self.build = build or {}
        self.post_transform = post_transform
        self.rtol, self.atol = rtol, atol
        self.out_rtol, self.out_atol = out_rtol, out_atol
        # loss keys my side reports that the reference computes but leaves
        # out of its return dict (e.g. FluxB's commented-out continuity,
        # Flux.py:278) — still inside both totals, so parity holds there
        self.skip_loss = frozenset(skip_loss)
        # compare_loss=False: the reference variant's loss is dead code
        # (VertPotD/F raise KeyError/TypeError as shipped) — forward-output
        # parity is the strongest executable check
        self.compare_loss = compare_loss
        # post-construction patch making an otherwise-unexecutable reference
        # variant runnable (documented per-variant in scripts/parity_matrix)
        self.fix_ref = fix_ref


def t_epd(params, ref, *, decoder_key="decoder_face", integ_bn=True):
    copy_epd_weights(params["EncodeProcessDecode_0"], ref, MP,
                     jax_decoder_key=decoder_key)
    if integ_bn:
        copy_batchnorm(params["integrator"]["face_area_norm"]
                       ["MaskedBatchNorm_0"]["BatchNorm_0"],
                       ref.integrator.face_area_norm)


def t_fvgnc(params, ref):
    copy_epd_weights(params["EncodeProcessDecode_0"], ref, MP)
    copy_batchnorm(params["face_area_norm"]["MaskedBatchNorm_0"]["BatchNorm_0"],
                   ref.integrator.face_area_norm)


def t_fvgnf(params, ref):
    copy_shared_block(params["EncodeProcessDecode_0"], ref)
    copy_batchnorm(params["integrator"]["face_area_norm"]
                   ["MaskedBatchNorm_0"]["BatchNorm_0"],
                   ref.integrator.face_area_norm)


def t_fvgnj(params, ref):
    copy_epd_weights(params["EncodeProcessDecode_0"], ref, MP)
    copy_fvgnj_scales(params, ref)


def t_fvgnk(params, ref):
    copy_epd_weights(params["EncodeProcessDecode_0"], ref, MP)
    copy_scalar(params, ref, "anisotropy_ratio", "anisotropy_ratio")


def retarget_pushforward(graphs):
    """train.py:250 with pushforward_factor=0: y <- y - x."""
    graphs[0].y = graphs[0].y - graphs[0].x
    return graphs


# The reference's VertPotD/F call fvm.convert_cell_flux_to_face_flux_alt,
# which does not exist anywhere in the reference tree (AttributeError at
# runtime — the variants are unrunnable as shipped). The only available
# conversion semantic is the owner-slot convert_cell_flux_to_face_flux
# (utils/fvm.py:55); alias it so the rest of those variants can execute.
import utils.fvm as ref_fvm                                    # noqa: E402

if not hasattr(ref_fvm, "convert_cell_flux_to_face_flux_alt"):
    ref_fvm.convert_cell_flux_to_face_flux_alt = \
        ref_fvm.convert_cell_flux_to_face_flux


def t_mgn(p, r):
    copy_epd_weights(p["EncodeProcessDecode_0"], r, MP,
                     jax_decoder_key="decoder_cell")


def t_fluxa(p, r):
    copy_epd_weights(p["EncodeProcessDecode_0"], r, MP)
    copy_batchnorm(p["integrator"]["face_area_norm"]["MaskedBatchNorm_0"]
                   ["BatchNorm_0"], r.integrator.face_area_norm)
    copy_batchnorm(p["integrator"]["vol_dt_norm"]["MaskedBatchNorm_0"]
                   ["BatchNorm_0"], r.integrator.vol_dt_norm)


def t_fluxc(p, r):
    copy_epd_weights(p["EncodeProcessDecode_0"], r, MP)
    copy_batchnorm(p["face_area_norm"]["MaskedBatchNorm_0"]["BatchNorm_0"],
                   r.integrator.face_area_norm)


def t_fluxd(p, r):
    copy_epd_weights(p["EncodeProcessDecode_0"], r, MP)
    copy_scalar_params(p, r, ["velocity_scale_x", "velocity_scale_y",
                              "pressure_scale", "flux_scale",
                              "diffusion_scale"])


def t_consa(p, r):
    copy_conservative_weights(p, r, MP)
    copy_batchnorm(p["integrator"]["face_area_norm"]["MaskedBatchNorm_0"]
                   ["BatchNorm_0"], r.integrator.face_area_norm)


def t_consb(p, r):
    enc = p["_ConsEncoder_0"]
    _copy_mlp(enc["faceS_mlp"], r.encoder.faceS_mlp, True)
    _copy_antisym_mlp(enc["faceA_mlp"], r.encoder.faceA_mlp)
    _copy_mlp(enc["cell_mlp"], r.encoder.cell_mlp, True)
    for i in range(MP):
        blk = p[f"_ConsABlock_{i}"]
        _copy_mlp(blk["face_mlp"], r.processer_list[i].face_block.face_mlp,
                  True)
        _copy_mlp(blk["cell_mlp"], r.processer_list[i].cell_block.cell_mlp,
                  True)
    _copy_mlp(p["decoder_cell"], r.decoder.node_mlp, False)


def t_consd(p, r):
    enc = p["_ConsEncoder_0"]
    _copy_mlp(enc["faceS_mlp"], r.encoder.faceS_mlp, True)
    _copy_antisym_mlp(enc["faceA_mlp"], r.encoder.faceA_mlp)
    _copy_mlp(enc["cell_mlp"], r.encoder.cell_mlp, True)
    for i in range(MP):
        blk = p[f"_ConsDBlock_{i}"]
        rb = r.processer_list[i]
        _copy_mlp(blk["face_symm"], rb.face_block_symm.face_mlp, True)
        _copy_antisym_mlp(blk["face_asym"], rb.face_block_asym.face_mlp)
        _copy_mlp(blk["cell_mlp"], rb.cell_block.cell_mlp, True)
    _copy_mlp(p["symm_mlp"], r.decoder.symm_mlp, False)
    _copy_antisym_mlp(p["asym_mlp"], r.decoder.asym_mlp)
    _copy_antisym_mlp(p["decoder_face"], r.decoder.final_mlp)
    copy_batchnorm(p["integrator"]["face_area_norm"]["MaskedBatchNorm_0"]
                   ["BatchNorm_0"], r.integrator.face_area_norm)


def t_cons_std(block_prefix):
    """ConsE/F/G/I: FvgnA-style encoder/decoder around custom blocks whose
    params live directly under the block module (face_mlp/cell_mlp)."""
    def _t(p, r):
        enc = p["Encoder_0"]
        _copy_mlp(enc["face_mlp"], r.encoder.face_mlp, True)
        _copy_mlp(enc["cell_mlp"], r.encoder.cell_mlp, True)
        for i in range(MP):
            blk = p[f"{block_prefix}_{i}"]
            _copy_mlp(blk["face_mlp"], r.processer_list[i].face_block.face_mlp,
                      True)
            _copy_mlp(blk["cell_mlp"], r.processer_list[i].cell_block.cell_mlp,
                      True)
        _copy_mlp(p["decoder_face"], r.decoder.face_mlp, False)
        copy_batchnorm(p["integrator"]["face_area_norm"]["MaskedBatchNorm_0"]
                       ["BatchNorm_0"], r.integrator.face_area_norm)
    return _t


def t_consh(p, r, integ_bn=True):
    _copy_mlp(p["faceS_mlp"], r.encoder.faceS_mlp, True)
    _copy_antisym_mlp(p["faceA_mlp"], r.encoder.faceA_mlp)
    _copy_mlp(p["cell_mlp"], r.encoder.cell_mlp, True)
    for i in range(MP):
        blk = p[f"_ConsHBlock_{i}"]
        rb = r.processer_list[i]
        _copy_mlp(blk["face_symm"], rb.face_block_symm.face_mlp, True)
        _copy_antisym_mlp(blk["face_asym"], rb.face_block_asym.face_mlp)
        _copy_mlp(blk["cell_mlp"], rb.cell_block.cell_mlp, True)
    _copy_mlp(p["decoder"]["even_mlp"], r.decoder.even_mlp, False)
    _copy_antisym_mlp(p["decoder"]["odd_mlp"], r.decoder.odd_mlp)
    if integ_bn:
        copy_batchnorm(p["integrator"]["face_area_norm"]["MaskedBatchNorm_0"]
                       ["BatchNorm_0"], r.integrator.face_area_norm)


def t_consj(p, r):
    t_consh(p, r, integ_bn=False)
    with torch.no_grad():
        for jname, rs, rb in (("velocity_scale_x", "velocity_scale_x",
                               "velocity_bias_x"),
                              ("velocity_scale_y", "velocity_scale_y",
                               "velocity_bias_y"),
                              ("pressure_scale", "pressure_scale",
                               "pressure_bias")):
            getattr(r, rs).copy_(torch.tensor(
                float(np.asarray(p[jname]["scale"]).reshape(()))))
            getattr(r, rb).copy_(torch.tensor(
                float(np.asarray(p[jname]["bias"]).reshape(()))))
        r.diffusion_scale.copy_(torch.tensor(
            float(np.asarray(p["diffusion_scale"]).reshape(()))))


def t_vertpot(bns=("face_area_norm", "vol_dt_norm")):
    def _t(p, r):
        copy_vertpot_weights(p, r, MP)
        for bn in bns:
            copy_batchnorm(p[bn]["MaskedBatchNorm_0"]["BatchNorm_0"],
                           getattr(r.integrator, bn))
    return _t


def t_vertpot_d(p, r):
    """VertPotD: the BNs live under the module's FluxIntegrator."""
    copy_vertpot_weights(p, r, MP)
    for bn in ("face_area_norm", "vol_dt_norm"):
        copy_batchnorm(p["integrator"][bn]["MaskedBatchNorm_0"]["BatchNorm_0"],
                       getattr(r.integrator, bn))


SPECS = {
    "FvgnA": Spec(LW_FVGN, t_epd),
    "FvgnB": Spec(LW_FVGN, lambda p, r: t_epd(p, r, integ_bn=False),
                  build={"face_gw": 2}, ref_cfg={"face_grad_weights_order": 2}),
    "FvgnC": Spec(LW_FVGN, t_fvgnc, jax_cfg={"bundle_size": 2},
                  ref_cfg={"bundle_size": 2}, build={"window": 3}),
    "FvgnD": Spec(LW_FVGN, t_epd, post_transform=retarget_pushforward),
    "FvgnE": Spec(LW_FVGN, t_epd),
    "FvgnF": Spec(LW_FVGN, t_fvgnf),
    "FvgnH": Spec(LW_FVGN, t_epd),
    "FvgnI": Spec(LW_FVGN, t_epd),
    # dt/V-amplified physical outputs (|acc| ~ 1e3) accumulate fp32 noise:
    # rel tolerance reflects magnitude, not a numerical-contract difference
    "FvgnJ": Spec(LW_FVGN, t_fvgnj, out_rtol=3e-3, out_atol=2e-4),
    "FvgnK": Spec(LW_FVGN, t_fvgnk),

    "MgnA": Spec(LW_MGN, t_mgn, build={"cell_gw": 1},
                 ref_cfg={"cell_grad_weights_order": 1}),
    "MgnB": Spec(LW_MGNB, t_mgn, build={"cell_gw": 1},
                 ref_cfg={"cell_grad_weights_order": 1}),
    "MgnC": Spec(LW_MGNB, t_mgn, build={"cell_gw": 1},
                 ref_cfg={"cell_grad_weights_order": 1}),

    "FluxA": Spec(LW_FLUX, t_fluxa),
    "FluxB": Spec(LW_FLUX, t_epd, skip_loss={"continuity_loss"}),
    "FluxC": Spec(LW_FLUX, t_fluxc),
    "FluxD": Spec(LW_FLUX, t_fluxd),

    "ConservativeA": Spec(LW_FVGN, t_consa),
    "ConservativeB": Spec(LW_MGN, t_consb),
    "ConservativeD": Spec(LW_FVGN, t_consd),
    "ConservativeE": Spec(LW_FVGN, t_cons_std("_ConsEBlock")),
    "ConservativeF": Spec(LW_FVGN, t_cons_std("_ConsFBlock")),
    "ConservativeG": Spec(LW_FVGN, t_cons_std("_ConsGBlock")),
    "ConservativeH": Spec(LW_FVGN, t_consh),
    "ConservativeI": Spec(LW_FVGN, t_cons_std("_ConsIBlock")),
    "ConservativeJ": Spec(LW_FVGN, t_consj, out_rtol=3e-3, out_atol=2e-4),
    "ConservativeK": Spec(LW_FVGN, t_consh),

    "VertPotA": Spec(LW_FVGN, t_vertpot()),
    "VertPotB": Spec(LW_FVGN, t_vertpot(bns=()), build={"face_gw": 2},
                     ref_cfg={"face_grad_weights_order": 2},
                     out_rtol=3e-3, out_atol=2e-4),
    "VertPotC": Spec(LW_FVGN, t_vertpot(bns=("face_area_norm",))),
    # VertPotD as shipped cannot compute its loss: forward returns no
    # cell_flux, the inherited FluxA.loss KeyErrors (VertPot.py:447-492,
    # Flux.py:123). Forward parity (incl. the owner-slot face_flux under
    # the _alt alias) is the strongest executable check.
    "VertPotD": Spec(LW_FLUX, t_vertpot_d, compare_loss=False),
    "VertPotE": Spec(LW_FLUX, t_vertpot(bns=("face_area_norm",))),
    # VertPotF as shipped is triple-dead (undefined _alt conversion, nu=None
    # TypeError in the integrator, KeyError in the inherited loss); with the
    # _alt alias + nu=1e-3 patch its forward executes for comparison
    "VertPotF": Spec(LW_FLUX, t_vertpot(bns=()), build={"face_gw": 2},
                     ref_cfg={"face_grad_weights_order": 2},
                     compare_loss=False,
                     fix_ref=lambda r: setattr(r.integrator, "nu", 1e-3),
                     out_rtol=3e-3, out_atol=2e-4),
    # reference omits face_flux_loss from its return dict (VertPot.py:766-773)
    "VertPotG": Spec(LW_FLUX, t_vertpot(), skip_loss={"face_flux_loss"}),

    "StreamFuncA": Spec(LW_SF, t_mgn, build={"cell_gw": 1},
                        ref_cfg={"cell_grad_weights_order": 1}),
    "StreamFuncB": Spec(LW_SF, t_mgn, build={"cell_gw": 1},
                        ref_cfg={"cell_grad_weights_order": 1}),
    "StreamFuncC": Spec(LW_SF, t_mgn, build={"cell_gw": 1},
                        ref_cfg={"cell_grad_weights_order": 1}),
    # the smoothness regularizer sits inside the compared total but the
    # reference leaves it out of its return dict (StreamFunc.py:270-275)
    "StreamFuncD": Spec(LW_SF, t_mgn, build={"cell_gw": 1},
                        ref_cfg={"cell_grad_weights_order": 1},
                        skip_loss={"potential_smoothness_loss"}),
}


# ---------------------------------------------------------------------------
# Generic runner
# ---------------------------------------------------------------------------

def run_variant(name):
    """Execute one matrix row; returns a record with max abs/rel errors."""
    spec = SPECS[name]
    ds, model, graph, variables, raw_stats = build_jax(
        name, spec.loss_weights, **spec.build, **spec.jax_cfg)

    tgraph, feats = model.transform_features(graph, None, mode="rollout")
    outputs, _ = model.forward(variables, tgraph, feats, mode="train")
    jax_losses = model.loss(outputs, feats, tgraph)

    fam = family_of(name)
    ref_cls = getattr(REF_FAMILY[fam], name)
    cfg = make_ref_config(HIDDEN, MP, spec.loss_weights, **spec.ref_cfg)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = ref_cls(cfg, MSE_per_element_torch, dataset,
                  stats_to_python(raw_stats))
    spec.transplant(variables["params"], ref)
    if spec.fix_ref is not None:
        spec.fix_ref(ref)
    ref.train()

    graphs = to_reference_graphs(tgraph)
    graphs = ref_cls.transform_features(dataset, graphs)
    if spec.post_transform is not None:
        graphs = spec.post_transform(graphs)

    with torch.no_grad():
        ref_out = ref(graphs, mode="train")
        ref_losses = ref.loss(ref_out, graphs) if spec.compare_loss else {}

    record = {"variant": name, "outputs": {}, "losses": {}, "status": "ok"}

    # shared physical outputs (underscore keys are internal)
    for key, jval in outputs.items():
        if key.startswith("_") or key not in ref_out or ref_out[key] is None:
            continue
        jarr = np.asarray(jval)
        rarr = ref_out[key].detach().numpy()
        if jarr.shape != rarr.shape:
            record["outputs"][key] = f"shape {jarr.shape} vs {rarr.shape}"
            record["status"] = "shape-mismatch"
            continue
        denom = np.maximum(np.abs(rarr), spec.out_atol / spec.out_rtol)
        rel = float(np.max(np.abs(jarr - rarr) / denom))
        record["outputs"][key] = rel
        np.testing.assert_allclose(jarr, rarr, rtol=spec.out_rtol,
                                   atol=spec.out_atol, err_msg=f"output {key}")

    if not spec.compare_loss:
        record["losses"] = "reference loss is dead code (see note)"
        return record

    # every loss component the JAX side produces must exist and match
    for key, jval in jax_losses.items():
        if key in spec.skip_loss:
            record["losses"][key] = "ref-omits"
            continue
        assert key in ref_losses, f"reference missing loss {key}"
        rv = float(ref_losses[key])
        jv = float(jval)
        rel = abs(jv - rv) / max(abs(rv), 1e-12)
        record["losses"][key] = rel
        np.testing.assert_allclose(jv, rv, rtol=spec.rtol, atol=spec.atol,
                                   err_msg=f"loss {key}")
    return record


@pytest.mark.parametrize("name", sorted(SPECS))
def test_variant_parity(name):
    run_variant(name)


def test_lastwrite_conversion_matches_reference_verbatim():
    """fvm.cell_flux_to_face_flux_lastwrite replicates the reference
    ``geometry.cell_flux_to_face_flux`` (geometry.py:539-570) bit-for-bit on
    arbitrary (non-antisymmetric) cell flux — including the scrambled
    slot-major/cell-major index pairing and last-write-wins duplicate
    resolution that VertPotG's output path depends on."""
    import utils.geometry as ref_geom
    from gnn_fluid_dynamics_tpu.ops import fvm as myfvm

    ds, model, graph, _, _ = build_jax("VertPotA", LW_FVGN)
    rng = np.random.default_rng(0)
    cf = rng.normal(size=(int(graph.num_cells), 3)).astype(np.float32)
    mine = np.asarray(myfvm.cell_flux_to_face_flux_lastwrite(
        jnp.asarray(cf), graph.cell_edge_index, graph.face_index))
    ref = ref_geom.cell_flux_to_face_flux(
        torch.from_numpy(cf), _t(graph.cell_edge_index, torch.long),
        _t(graph.face_index, torch.long)).numpy()
    np.testing.assert_allclose(mine, ref, rtol=0, atol=0)
