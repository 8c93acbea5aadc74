#!/usr/bin/env bash
# Round-4 stint 2: blocks on the SAME flock as tpu_queue_r4.sh, so it starts
# automatically the moment the main evidence queue finishes (and can never
# run concurrently with it — the round-3 failure mode). Continues flagship
# training to the configured 30 epochs (the stage-1 deadline usually lands
# ~e24, before the final LR decay), then evaluates BOTH the best-valid and
# the latest checkpoint at the 676-step reference horizon and promotes the
# better one to rollouts/e2e/rollout-cyl-r4 (the trainer's short-horizon
# valid metric does not always rank long-rollout quality).
#
#   nohup scripts/tpu_queue_r4b.sh > /dev/null 2>&1 &
set -u
cd /root/repo

exec 200>/tmp/queue_r4.lock
flock 200          # blocks until tpu_queue_r4.sh releases the lock
echo $$ > /tmp/queue_r4b.pid

LOG=runs/e2e/queue-r4b.log
mkdir -p runs/e2e runs/perf
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "queue-r4b start (main queue finished)"

# 1. flagship stint 2: resume to the full 30 epochs (exit 0) or deadline
if [ ! -e runs/e2e/.flagship_r4b_done ]; then
    GFD_EPOCH_LIMIT=6 DEADLINE_S=${STINT2_DEADLINE_S:-7200} bash scripts/chain_train.sh \
        config/e2e/fluxd-r3.json checkpoints/e2e/fluxd-r3 runs/e2e/fluxd-r3.log
    rc=$?
    note "flagship stint2 exit=$rc"
    { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch runs/e2e/.flagship_r4b_done
fi

# 2. keep the stint-1 artifact for provenance
if [ -e rollouts/e2e/rollout-cyl-r4/errors.json ] \
   && [ ! -d rollouts/e2e/rollout-cyl-r4-stint1 ]; then
    mv rollouts/e2e/rollout-cyl-r4 rollouts/e2e/rollout-cyl-r4-stint1
fi

# 3. roll out BOTH candidate checkpoints at the reference horizon
for cand in best latest; do
    cfg=config/e2e/rollout-cyl-r4.json
    [ "$cand" = latest ] && cfg=config/e2e/rollout-cyl-r4-latest.json
    out="rollout-cyl-r4-$cand"
    if [ ! -e "rollouts/e2e/$out/errors.json" ]; then
        PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "$cfg" --output "$out" \
            > "runs/e2e/$out.log" 2>&1
        note "rollout $cand exit=$?"
    fi
done

# 4. promote the better candidate (velocity + pressure mean_all) to the
#    final artifact name; record the decision in the log
python - >> "$LOG" 2>&1 <<'EOF'
import json, os, shutil

def score(path):
    d = json.load(open(path))["scalar"]
    return (d["velocity_error"]["mean_all"] + d["pressure_error"]["mean_all"])

cands = {}
for cand in ("best", "latest"):
    p = f"rollouts/e2e/rollout-cyl-r4-{cand}/errors.json"
    if os.path.exists(p):
        cands[cand] = score(p)
print("candidate scores (velocity+pressure mean_all):", cands)
if cands:
    winner = min(cands, key=cands.get)
    src = f"rollouts/e2e/rollout-cyl-r4-{winner}"
    if os.path.exists("rollouts/e2e/rollout-cyl-r4"):
        shutil.rmtree("rollouts/e2e/rollout-cyl-r4")
    shutil.copytree(src, "rollouts/e2e/rollout-cyl-r4")
    meta = "rollouts/e2e/rollout-cyl-r4/meta.json"
    m = json.load(open(meta)) if os.path.exists(meta) else {}
    m["promoted_from"] = winner
    m["candidate_scores"] = cands
    json.dump(m, open(meta, "w"), indent=1)
    print("promoted", winner)
EOF
note "promotion done"

# 5. final recorded bench
python bench.py > runs/perf/bench-r4b.json 2> runs/perf/bench-r4b.log
note "queue-r4b done"
