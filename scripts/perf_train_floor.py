#!/usr/bin/env python
"""Analytic roofline floor for the PRODUCTION TRAINING STEP (VERDICT r3
weak #5): FluxD hidden 128 / mp 15, batch 2, 3456-cell/5248-face graphs,
banded aggregation, bf16 compute, per-block remat, pushforward_factor 2 —
the exact shape of config/e2e/fluxd-r3.json measured at 6.7 ms/step
(~4.5 ms device time) in PERF.md.

The model mirrors scripts/perf_production.py --floor (the rollout floor the
round-3 kernels were driven against): per-op MXU FLOPs at 197 Tbf16/s vs
HBM bytes at 819 GB/s, taking the max per phase. Prints a per-phase
breakdown and the total floor to compare against the measured step.

Counting rules:
- A forward pass of the net is counted once; the training step runs
  pf=2 no-grad pushforward forwards + 1 supervised forward + backward.
- Backward ~= 2x forward FLOPs (dgrad + wgrad) + 1x forward recompute
  (per-block remat, PERF.md: recompute beats activation traffic).
- Banded aggregation: one-hot einsum FLOPs = 2 * rows * band * h per
  application; table bytes stream once per application (int8 tables).
- Optimizer (AdamW): read p, g, m, v; write p, m, v (f32).
"""

import argparse
import json

MXU_BF16 = 197e12          # measured-attainable MXU rate (PERF.md)
HBM = 819e9                # measured-attainable HBM bandwidth (PERF.md)


def mlp_flops(n_rows, d_in, h, d_out):
    """3-layer MLP MAC->FLOPs for n_rows rows."""
    return 2 * n_rows * (d_in * h + h * h + h * d_out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--mp", type=int, default=15)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--cells", type=int, default=3456)
    ap.add_argument("--faces", type=int, default=5248)
    ap.add_argument("--vertices", type=int, default=1920)
    ap.add_argument("--pushforward", type=int, default=2)
    ap.add_argument("--table-bytes", type=int, default=2,
                    help="bytes/entry the one-hot tables stream at "
                         "(2 = bf16 XLA banded path; 4 if left f32)")
    ap.add_argument("--params", type=float, default=2.21e6)
    ap.add_argument("--measured-ms", type=float, default=6.7)
    ap.add_argument("--measured-device-ms", type=float, default=4.5)
    ap.add_argument("--from-graph", action="store_true",
                    help="build the production-bucket graph and take the "
                         "banded table shapes from it (CPU, ~1 min)")
    args = ap.parse_args()

    # banded-table shapes: (tiles, 128, band). Defaults are the shapes the
    # structured production-bucket build produces (--from-graph rederives).
    tables = {"es": (15, 128, 512), "er": (15, 128, 512),
              "hv": (15, 128, 1024), "fc3": (87, 128, 384)}
    if args.from_graph:
        import __graft_entry__ as ge
        _, _, graph, _ = ge._build(
            "FluxD", hidden=args.hidden, mp_num=args.mp, nx=49, ny=37,
            pad=128, aggregation="banded", compute_dtype="bfloat16")
        for key in tables:
            t = getattr(graph, f"{key}_onehot", None)
            if t is not None:
                tables[key] = tuple(t.shape)
        args.cells, args.faces = int(graph.num_cells), int(graph.num_faces)
        args.vertices = int(graph.num_vertices)

    h = args.hidden
    B = args.batch
    C, F, V = args.cells * B, args.faces * B, args.vertices * B
    bf2 = 2   # bf16 bytes

    # ---- one forward pass of the net --------------------------------------
    fwd_flops = {}
    fwd_bytes = {}

    # encoder: face_x ~10 cols, cell_x 2 cols
    fwd_flops["encoder"] = mlp_flops(F, 10, h, h) + mlp_flops(C, 2, h, h)
    fwd_bytes["encoder"] = (F * (10 + h) + C * (2 + h)) * bf2

    # per-block MLPs: cell (h + h/2 -> h), face (3h -> h)
    blk_mlp = mlp_flops(C, h + h // 2, h, h) + mlp_flops(F, 3 * h, h, h)
    # per-block aggregation (twice message passing, banded): each one-hot
    # einsum is tiles x (128, band) @ (band, h/2) per batch element
    def agg(shape, width):
        tiles, rows, band = shape
        return 2 * B * tiles * rows * band * width
    agg_flops = (agg(tables["es"], h // 2) + agg(tables["er"], h // 2)
                 + agg(tables["hv"], h // 2))
    table_bytes = B * args.table_bytes * sum(
        t[0] * t[1] * t[2]
        for t in (tables["es"], tables["er"], tables["hv"]))
    # activation traffic per block: read cell+face latents, write same;
    # aggregation reads the 2F half-latents + the one-hot tables
    blk_bytes = ((C + F) * h * 2 * bf2                    # read + write latents
                 + 2 * F * (h // 2) * bf2                 # two-way edge halves
                 + table_bytes)
    fwd_flops["blocks"] = args.mp * (blk_mlp + agg_flops)
    fwd_bytes["blocks"] = args.mp * blk_bytes

    # decoder + integrator/loss glue (fc3 selector einsums)
    fwd_flops["decoder"] = mlp_flops(F, h, h, 6)
    fwd_bytes["decoder"] = F * (h + 6) * bf2
    fwd_flops["physics"] = 2 * C * 3 * 16 * 8   # fc3 selector einsums, small
    fwd_bytes["physics"] = (F * 8 + C * 8) * 4

    fwd_total_flops = sum(fwd_flops.values())
    fwd_total_bytes = sum(fwd_bytes.values())

    # ---- full training step ------------------------------------------------
    # pf no-grad forwards + supervised forward + backward(2x) + remat(1x)
    net_flops = (args.pushforward + 1 + 2 + 1) * fwd_total_flops
    net_bytes = (args.pushforward + 1 + 2 + 1) * fwd_total_bytes

    # params: read once per forward-like pass (weights stay resident only if
    # HBM-read each pass; MXU streams them) + AdamW update traffic in f32
    param_bytes = ((args.pushforward + 1 + 2 + 1) * args.params * bf2
                   + 7 * args.params * 4)   # g read, p/m/v read+write
    opt_flops = 10 * args.params            # AdamW elementwise

    total_flops = net_flops + opt_flops
    total_bytes = net_bytes + param_bytes

    t_mxu = total_flops / MXU_BF16
    t_hbm = total_bytes / HBM
    floor_ms = 1e3 * max(t_mxu, t_hbm)

    report = {
        "shape": f"FluxD h{h} mp{args.mp} batch{B} cells{args.cells} "
                 f"faces{args.faces} pf{args.pushforward} remat banded-bf16",
        "fwd_flops_G": round(fwd_total_flops / 1e9, 2),
        "fwd_bytes_MB": round(fwd_total_bytes / 1e6, 2),
        "step_flops_G": round(total_flops / 1e9, 2),
        "step_bytes_MB": round(total_bytes / 1e6, 2),
        "t_mxu_ms": round(1e3 * t_mxu, 3),
        "t_hbm_ms": round(1e3 * t_hbm, 3),
        "floor_ms": round(floor_ms, 3),
        "bound": "MXU" if t_mxu > t_hbm else "HBM",
        "measured_ms": args.measured_ms,
        "measured_device_ms": args.measured_device_ms,
        "device_vs_floor": round(args.measured_device_ms / floor_ms, 2),
        "phases_fwd_flops_G": {k: round(v / 1e9, 2)
                               for k, v in fwd_flops.items()},
        "phases_fwd_bytes_MB": {k: round(v / 1e6, 2)
                                for k, v in fwd_bytes.items()},
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
