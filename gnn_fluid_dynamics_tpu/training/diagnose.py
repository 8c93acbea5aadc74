"""Per-head checkpoint diagnostics: correlation / relative error of every
model output against its target, in normalized and physical space.

Motivated by the FluxD pressure-collapse investigation: integrator models
(FvgnJ/FluxD-style learned-scale heads) can silently zero out individual
supervised face heads when the dt/V-amplified cell-velocity-change loss
outweighs their direct supervision (the optimizer parks the head at the
constant that minimises its leverage on the momentum balance). A rollout
error of ~1.0 for a field while its one-step loss "looks finite" is the
signature; this tool makes the per-head state visible in seconds.

Usage:
    python -m gnn_fluid_dynamics_tpu.training.diagnose \
        --config cfg.json --ckpt checkpoints/e2e/fluxd/best [--sample 5]

Reference context: the reference has no such tool — its nearest analogue is
ModelMonitor's per-channel gradient logging (monitoring.py:8-97), which shows
collapse only while training. This inspects any saved checkpoint post hoc.
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import numpy as np


def head_report(model, variables, graph, feats) -> dict:
    """Returns {head: {space: {corr, rel, pred_mean, pred_std, tgt_mean,
    tgt_std}}} for every supervised output the model exposes."""
    import jax

    report: dict = {}

    def add(name, space, pred, tgt, mask):
        p = np.asarray(pred, np.float64).reshape(mask.shape[0], -1)[mask]
        t = np.asarray(tgt, np.float64).reshape(mask.shape[0], -1)[mask]
        p, t = p.reshape(-1), t.reshape(-1)
        denom = float((t ** 2).sum())
        corr = (float(np.corrcoef(p, t)[0, 1])
                if p.std() > 0 and t.std() > 0 else 0.0)
        report.setdefault(name, {})[space] = {
            "corr": corr,
            "rel": float(((p - t) ** 2).sum() / denom) if denom else None,
            "pred_mean": float(p.mean()), "pred_std": float(p.std()),
            "tgt_mean": float(t.mean()), "tgt_std": float(t.std()),
        }

    cmask = np.asarray(graph.cell_mask) > 0
    fmask = np.asarray(graph.face_mask) > 0

    # normalized (train/valid) space: predictions vs the normalized targets
    # the training loss actually sees
    out_n, _ = model.forward(variables, graph, feats, mode="valid")
    nfeats = out_n["_nfeats"]
    # physical (rollout) space: denormalized predictions vs raw targets
    out_p, _ = model.forward(variables, graph, feats, mode="rollout")

    def pairings(out, fy, cy):
        pairs = []
        if "face_velocity" in out and fy is not None and fy.shape[1] >= 2:
            pairs.append(("face_velocity_x", out["face_velocity"][:, 0],
                          fy[:, 0], fmask))
            pairs.append(("face_velocity_y", out["face_velocity"][:, 1],
                          fy[:, 1], fmask))
        if "face_pressure" in out and fy is not None and fy.shape[1] >= 3:
            pairs.append(("face_pressure", out["face_pressure"][:, 0],
                          fy[:, 2], fmask))
        if "face_flux" in out and fy is not None and fy.shape[1] >= 4:
            pairs.append(("face_flux", out["face_flux"][:, 0],
                          fy[:, 3], fmask))
        if "cell_velocity_change" in out and cy is not None:
            pairs.append(("cell_velocity_change", out["cell_velocity_change"],
                          cy[:, 0:2], cmask))
        # MGN/StreamFunc families: cell_y = [v_x, v_y, p] (Mgn.py:293,
        # StreamFunc.py:56-63)
        if "cell_velocity" in out and cy is not None and cy.shape[1] >= 2:
            pairs.append(("cell_velocity", out["cell_velocity"],
                          cy[:, 0:2], cmask))
        if "cell_pressure" in out and cy is not None and cy.shape[1] >= 3:
            pairs.append(("cell_pressure", out["cell_pressure"][:, 0],
                          cy[:, 2], cmask))
        return pairs

    nfy = np.asarray(nfeats.get("face_y")) if "face_y" in nfeats else None
    ncy = np.asarray(nfeats.get("cell_y")) if "cell_y" in nfeats else None
    for name, pred, tgt, mask in pairings(out_n, nfy, ncy):
        add(name, "normalized", pred, tgt, mask)

    fy = np.asarray(feats.get("face_y")) if "face_y" in feats else None
    cy = np.asarray(feats.get("cell_y")) if "cell_y" in feats else None
    for name, pred, tgt, mask in pairings(out_p, fy, cy):
        add(name, "physical", pred, tgt, mask)

    # learned scalar parameters (FvgnJ/FluxD-family scale heads)
    def walk(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
            elif np.asarray(v).size == 1 and "scale" in path:
                report.setdefault("_scalar_params", {})[path] = float(
                    np.asarray(v).reshape(()))
    walk(jax.tree.map(np.asarray, variables.get("params", {})))
    return report


def main(argv: Optional[list] = None):
    import jax

    from gnn_fluid_dynamics_tpu.models import get_model_class
    from gnn_fluid_dynamics_tpu.models.base import ModelConfig
    from gnn_fluid_dynamics_tpu.training.checkpoint import Checkpointer
    from gnn_fluid_dynamics_tpu.training.config import (Config, load_config)
    from gnn_fluid_dynamics_tpu.training.train import build_datasets
    from gnn_fluid_dynamics_tpu.training.trainer import Trainer

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True,
                        help="checkpoint dir, or dir/{latest,best}")
    parser.add_argument("--sample", type=int, default=0,
                        help="validation sample index to probe")
    parser.add_argument("--json", action="store_true",
                        help="print the full report as JSON")
    args = parser.parse_args(argv)

    config = load_config(args.config)
    base = args.ckpt.rstrip("/")
    which = base.split("/")[-1]
    ckpt_dir = "/".join(base.split("/")[:-1]) \
        if which in ("latest", "best") else base
    which = which if which in ("latest", "best") else "latest"
    checkpointer = Checkpointer(ckpt_dir)
    _, meta = checkpointer.load(which)
    assert meta is not None, f"no checkpoint at {args.ckpt}"
    # adopt the checkpoint's training config (rollout CLI semantics)
    train_config = Config.from_dict(meta["config"])
    train_config.dataset.dpath = (config.dataset.dpath
                                  or train_config.dataset.dpath)
    train_config.rollout = config.rollout
    config = train_config

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
                    scale_init=config.model.scale_init,
                    integrator_detach=tuple(config.model.integrator_detach),
                    pushforward=config.model.pushforward),
        loss_weights=config.training.loss_weights)
    model.set_stats(meta["stats"])

    # only the validation set is probed — skip the train set entirely
    _, valid_ds = build_datasets(config, model_cls, splits=("valid",))
    graph = valid_ds.get_item(args.sample)
    _, feats = model.transform_rollout(graph)
    trainer = Trainer(config, model)
    state0 = trainer.init_state(jax.random.PRNGKey(0), graph, feats)
    tree, _ = checkpointer.load(which, template={
        "params": state0.params, "batch_stats": state0.batch_stats,
        "opt_state": state0.opt_state, "step": state0.step,
        "rng": state0.rng})
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    report = head_report(model, variables, graph, feats)
    if args.json:
        print(json.dumps(report, indent=2))
        return report
    print(f"checkpoint {args.ckpt} (mini_epoch {meta['mini_epoch']}) "
          f"model {config.model.name}")
    scalars = report.pop("_scalar_params", {})
    for name, spaces in report.items():
        for space, r in spaces.items():
            flag = ""
            if r["tgt_std"] > 0 and r["pred_std"] < 0.05 * r["tgt_std"]:
                flag = "  << COLLAPSED (constant prediction)"
            rel = float("nan") if r["rel"] is None else r["rel"]
            print(f"  {name:24s} {space:10s} corr {r['corr']:+.3f} "
                  f"rel {rel:-8.3f} pred(m={r['pred_mean']:+.4f},"
                  f"s={r['pred_std']:.4f}) tgt(m={r['tgt_mean']:+.4f},"
                  f"s={r['tgt_std']:.4f}){flag}")
    for path, val in scalars.items():
        print(f"  scalar {path} = {val:.6g}")
    return report


if __name__ == "__main__":
    main()
