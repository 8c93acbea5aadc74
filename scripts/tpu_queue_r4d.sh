#!/usr/bin/env bash
# Round-4 session-3 queue: flagship plan-B warm-start fine-tune.
#   1. 12-epoch fine-tune of FluxD from checkpoints/e2e/fluxd-r3/latest
#      (the better 676-step rollout candidate) at lr_max 1.2e-4,
#      pushforward from epoch 0 — config/e2e/fluxd-r4-ft.json
#   2. 676-step rollouts of the fine-tune's best + latest checkpoints
#   3. promote whichever of {current rollout-cyl-r4, ft-best, ft-latest}
#      scores lowest (velocity + pressure mean_all) into rollout-cyl-r4
#
#   nohup scripts/tpu_queue_r4d.sh > /dev/null 2>&1 &
set -u
cd /root/repo

exec 200>/tmp/queue_r4.lock
if ! flock -n 200; then
    echo "queue_r4 already running (lock held)" >&2
    exit 1
fi
echo $$ > /tmp/queue_r4d.pid

LOG=runs/e2e/queue-r4d.log
mkdir -p runs/e2e
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "queue-r4d start"

# 1. fine-tune chain
if [ ! -e runs/e2e/.flagship_r4d_done ]; then
    GFD_EPOCH_LIMIT=6 DEADLINE_S=${FT_DEADLINE_S:-9000} bash scripts/chain_train.sh \
        config/e2e/fluxd-r4-ft.json checkpoints/e2e/fluxd-r4-ft runs/e2e/fluxd-r4-ft.log
    rc=$?
    note "ft chain exit=$rc"
    { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch runs/e2e/.flagship_r4d_done
fi

# 2. rollouts at the 676-step reference horizon
for cand in best latest; do
    out="rollout-cyl-r4ft-$cand"
    if [ -e checkpoints/e2e/fluxd-r4-ft/${cand}.json ] \
       && [ ! -e "rollouts/e2e/$out/errors.json" ]; then
        PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "config/e2e/rollout-cyl-r4ft-$cand.json" \
            --output "$out" > "runs/e2e/$out.log" 2>&1
        note "rollout ft-$cand exit=$?"
    fi
done

# 3. promote the best of {incumbent, ft-best, ft-latest} into rollout-cyl-r4
python - >> "$LOG" 2>&1 <<'EOF'
import json, os, shutil

def score(path):
    d = json.load(open(path))["scalar"]
    return (d["velocity_error"]["mean_all"] + d["pressure_error"]["mean_all"])

cands = {}
for name, path in [
    ("incumbent", "rollouts/e2e/rollout-cyl-r4"),
    ("ft-best", "rollouts/e2e/rollout-cyl-r4ft-best"),
    ("ft-latest", "rollouts/e2e/rollout-cyl-r4ft-latest"),
]:
    p = os.path.join(path, "errors.json")
    if os.path.exists(p):
        cands[name] = (score(p), path)
print("candidate scores (velocity+pressure mean_all):",
      {k: round(v[0], 5) for k, v in cands.items()})
if cands:
    winner = min(cands, key=lambda k: cands[k][0])
    print("winner:", winner)
    if winner != "incumbent":
        src = cands[winner][1]
        if os.path.exists("rollouts/e2e/rollout-cyl-r4"):
            shutil.rmtree("rollouts/e2e/rollout-cyl-r4")
        shutil.copytree(src, "rollouts/e2e/rollout-cyl-r4")
        meta = "rollouts/e2e/rollout-cyl-r4/meta.json"
        m = json.load(open(meta)) if os.path.exists(meta) else {}
        m["promoted_from"] = winner
        m["candidate_scores"] = {k: v[0] for k, v in cands.items()}
        json.dump(m, open(meta, "w"), indent=1)
        print("promoted", winner)
EOF
note "ft promotion done"
note "queue-r4d done"
