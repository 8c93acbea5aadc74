#!/usr/bin/env bash
# Round-5 stage 2: pressure-focused flagship fine-tune on the inflow data.
#
# The r5 evidence run met the velocity bar (0.0105 <= 0.02) and confirmed the
# identifiability diagnosis (spatial-mean error component collapsed to 2-6%),
# but pressure sits at 0.282 vs the <0.15 bar, dominated by the TIME-MEAN
# pressure field's per-sim amplitude (runs/diag5/). This stage warm-starts
# from the r5 best checkpoint with face_pressure loss weight 100 -> 300 and
# a 1.5e-4 cosine restart for 12 epochs, rolls out best+latest, and promotes
# into rollouts/e2e/rollout-cyl-r5 ONLY if pressure improves while velocity
# stays within the bar.
#
#   nohup scripts/tpu_queue_r5b.sh > /dev/null 2>&1 &
set -u
cd /root/repo

exec 200>/tmp/queue_r4.lock
flock 200   # blocking: wait for the r5 queue to release the TPU
echo $$ > /tmp/queue_r5b.pid

LOG=runs/e2e/queue-r5b.log
mkdir -p runs/e2e
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "queue-r5b start"

if [ ! -e runs/e2e/.fluxd_r5_pft_done ]; then
    GFD_EPOCH_LIMIT=6 DEADLINE_S=${PFT_DEADLINE_S:-5400} bash scripts/chain_train.sh \
        config/e2e/fluxd-r5-pft.json checkpoints/e2e/fluxd-r5-pft \
        runs/e2e/fluxd-r5-pft.log
    rc=$?
    note "pft chain exit=$rc"
    { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch runs/e2e/.fluxd_r5_pft_done
fi

for cand in best latest; do
    out="rollout-cyl-r5pft-$cand"
    if [ -e "checkpoints/e2e/fluxd-r5-pft/${cand}.json" ] \
       && [ ! -e "rollouts/e2e/$out/errors.json" ]; then
        PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "config/e2e/$out.json" --output "$out" \
            > "runs/e2e/$out.log" 2>&1
        note "pft rollout $cand exit=$?"
    fi
done

python - >> "$LOG" 2>&1 <<'EOF'
import json, os, shutil

def metrics(path):
    d = json.load(open(path))["scalar"]
    return (d["velocity_error"]["mean_all"], d["pressure_error"]["mean_all"])

base = "rollouts/e2e/rollout-cyl-r5/errors.json"
bv, bp = metrics(base)
print(f"incumbent: vel {bv:.4f} prs {bp:.4f}")
best_cand, best_p = None, bp
for cand in ("best", "latest"):
    p = f"rollouts/e2e/rollout-cyl-r5pft-{cand}/errors.json"
    if not os.path.exists(p):
        continue
    v, pr = metrics(p)
    print(f"pft-{cand}: vel {v:.4f} prs {pr:.4f}")
    # promote only if pressure improves AND velocity stays within the bar
    if v <= 0.02 and pr < best_p:
        best_cand, best_p = cand, pr
if best_cand:
    src = f"rollouts/e2e/rollout-cyl-r5pft-{best_cand}"
    dst = "rollouts/e2e/rollout-cyl-r5"
    shutil.rmtree(dst)
    shutil.copytree(src, dst)
    meta = json.load(open(f"{dst}/meta.json"))
    meta["promoted_from"] = f"pft-{best_cand}"
    meta["incumbent_scores"] = {"velocity": bv, "pressure": bp}
    json.dump(meta, open(f"{dst}/meta.json", "w"), indent=1)
    print("promoted", best_cand)
else:
    print("no pft candidate beat the incumbent under the velocity bar")
EOF
note "pft promotion done"
note "queue-r5b done"
