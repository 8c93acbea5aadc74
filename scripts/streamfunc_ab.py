"""StreamFuncA learning-failure demonstration (VERDICT r2 weak #2 / next #3).

Trains three models side by side on the identical tiny cylinder fixture:

  A. my JAX StreamFuncA            (gnn_fluid_dynamics_tpu.models.streamfunc)
  B. the EXECUTED PyTorch reference StreamFuncA
     (/root/reference/src/models/StreamFunc.py via tests/parity_shims)
  C. my JAX MgnC — the same MgnC base StreamFuncA inherits from, with a
     direct velocity head instead of the curl-of-psi head (control)

A and B start from the SAME transplanted weights and use Adam with the same
hyperparameters; one-step loss parity between them is separately proven by
tests/test_parity_reference.py::test_streamfunca_one_step_loss_parity. If A
tracks B and both plateau while C learns, the failure is the variant's
curl-of-psi head (reference StreamFunc.py:93-106), not this port.

Run:  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/repo/tests \
        python scripts/streamfunc_ab.py [--steps 400]
Writes runs/diag3/streamfunc_ab.jsonl.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

import jax
import optax
import torch

from parity_shims import (copy_epd_weights, install_shims, make_ref_config,
                          make_ref_dataset, stats_to_python,
                          to_reference_graphs)

install_shims()

from models.StreamFunc import StreamFuncA as RefStreamFuncA  # noqa: E402
from datasets.OpenFoam import NodeType as RefNodeType        # noqa: E402
from utils.loss import MSE_per_element_torch                 # noqa: E402

from test_parity_reference import build_jax_side, HIDDEN, MP  # noqa: E402

LR = 1e-3
SF_WEIGHTS = {"cell_velocity": 10.0, "cell_pressure": 1.0}
MGN_WEIGHTS = {"cell_velocity_change": 10.0, "cell_pressure": 1.0,
               "cell_velocity": 10.0}


def train_jax(name, loss_weights, steps, log_every, grad_weights=True):
    ds, model, graph, variables, raw_stats = build_jax_side(
        name, loss_weights, grad_weights=grad_weights)
    tgraph, feats = model.transform_features(graph, None, mode="rollout")

    tx = optax.adam(LR)

    def loss_fn(params, other):
        out, _ = model.forward({**other, "params": params}, tgraph, feats,
                               mode="train")
        losses = model.loss(out, feats, tgraph)
        return losses["total_log_loss"], losses

    @jax.jit
    def step(params, other, opt_state):
        (tot, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, other)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses

    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)
    curve = []
    for i in range(steps + 1):
        params, opt_state, losses = step(params, other, opt_state)
        if i % log_every == 0:
            curve.append({k: float(v) for k, v in losses.items()})
    return variables, curve, (ds, model, graph, raw_stats)


def train_ref_streamfunc(variables, raw_stats, graph, steps, log_every):
    cfg = make_ref_config(HIDDEN, MP, SF_WEIGHTS, cell_grad_weights_order=1)
    dataset = make_ref_dataset(RefNodeType, cfg, mode="rollout")
    ref = RefStreamFuncA(cfg, MSE_per_element_torch, dataset,
                         stats_to_python(raw_stats))
    copy_epd_weights(variables["params"]["EncodeProcessDecode_0"], ref, MP,
                     jax_decoder_key="decoder_cell")
    ref.train()
    opt = torch.optim.Adam(ref.parameters(), lr=LR)

    graphs0 = to_reference_graphs(graph)
    graphs0 = RefStreamFuncA.transform_features(dataset, graphs0)

    curve = []
    for i in range(steps + 1):
        graphs = [g.clone() for g in graphs0]
        out = ref(graphs, mode="train")
        losses = ref.loss(out, graphs)
        opt.zero_grad()
        losses["total_log_loss"].backward()
        opt.step()
        if i % log_every == 0:
            curve.append({k: float(v.detach()) for k, v in losses.items()})
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--log-every", type=int, default=25)
    args = ap.parse_args()

    print("== A: JAX StreamFuncA ==")
    variables, curve_a, (ds, model, graph, raw_stats) = train_jax(
        "StreamFuncA", SF_WEIGHTS, args.steps, args.log_every)
    for i, c in enumerate(curve_a):
        print(f"  step {i*args.log_every:4d} total {c['total_log_loss']:+.4f}"
              f" vel {c['cell_velocity_loss']:.4f}")

    print("== B: executed reference StreamFuncA (same init) ==")
    curve_b = train_ref_streamfunc(variables, raw_stats, graph, args.steps,
                                   args.log_every)
    for i, c in enumerate(curve_b):
        print(f"  step {i*args.log_every:4d} total {c['total_log_loss']:+.4f}"
              f" vel {c['cell_velocity_loss']:.4f}")

    print("== C: JAX MgnC control (direct velocity head) ==")
    _, curve_c, _ = train_jax("MgnC", MGN_WEIGHTS, args.steps, args.log_every)
    for i, c in enumerate(curve_c):
        key = ("cell_velocity_loss" if "cell_velocity_loss" in c
               else "cell_velocity_change_loss")
        print(f"  step {i*args.log_every:4d} total {c['total_log_loss']:+.4f}"
              f" vel {c[key]:.4f}")

    os.makedirs("runs/diag3", exist_ok=True)
    with open("runs/diag3/streamfunc_ab.jsonl", "w") as f:
        for tag, curve in (("jax_streamfunca", curve_a),
                           ("ref_streamfunca", curve_b),
                           ("jax_mgnc", curve_c)):
            for i, c in enumerate(curve):
                f.write(json.dumps({"model": tag,
                                    "step": i * args.log_every, **c}) + "\n")
    print("wrote runs/diag3/streamfunc_ab.jsonl")


if __name__ == "__main__":
    main()
