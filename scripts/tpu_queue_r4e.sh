#!/usr/bin/env bash
# Round-4 session-3 family queue (runs after queue-r4d releases the TPU lock):
#   1. ConservativeA warm-start fine-tune (full 44-sim set, pushforward from
#      epoch 0) -> 676-step rollout; promote into rollout-conservativea-r4
#      if the velocity+pressure score improves.
#   2. StreamFuncB retrain with pushforward (full 44-sim set) -> 676-step
#      rollout; promote into rollout-streamfuncb-r4 likewise.
#
#   nohup scripts/tpu_queue_r4e.sh > /dev/null 2>&1 &
set -u
cd /root/repo

exec 200>/tmp/queue_r4.lock
flock 200   # blocking: wait for the r4d fine-tune queue to finish
echo $$ > /tmp/queue_r4e.pid

LOG=runs/e2e/queue-r4e.log
mkdir -p runs/e2e
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "queue-r4e start"

promote() {  # promote SRC into DST if SRC scores lower (vel+pres mean_all)
    python - "$1" "$2" >> "$LOG" 2>&1 <<'EOF'
import json, os, shutil, sys
src, dst = sys.argv[1], sys.argv[2]

def score(path):
    d = json.load(open(os.path.join(path, "errors.json")))["scalar"]
    return d["velocity_error"]["mean_all"] + d["pressure_error"]["mean_all"]

if not os.path.exists(os.path.join(src, "errors.json")):
    print(f"no candidate at {src}"); sys.exit(0)
s_new = score(src)
s_old = score(dst) if os.path.exists(os.path.join(dst, "errors.json")) else float("inf")
print(f"promotion check: {src}={s_new:.5f} vs {dst}={s_old:.5f}")
if s_new < s_old:
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    meta = os.path.join(dst, "meta.json")
    m = json.load(open(meta)) if os.path.exists(meta) else {}
    m["promoted_from"] = os.path.basename(src)
    m["candidate_scores"] = {"new": s_new, "old": s_old}
    json.dump(m, open(meta, "w"), indent=1)
    print("promoted", src, "->", dst)
EOF
}

# 1. ConservativeA fine-tune
if [ ! -e runs/e2e/.conservativea_r4e_done ]; then
    GFD_EPOCH_LIMIT=6 DEADLINE_S=${CONS_DEADLINE_S:-7200} bash scripts/chain_train.sh \
        config/e2e/conservativea-r4-ft.json checkpoints/e2e/conservativea-r4-ft \
        runs/e2e/conservativea-r4-ft.log
    rc=$?
    note "conservativea ft chain exit=$rc"
    { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch runs/e2e/.conservativea_r4e_done
fi
if [ -e checkpoints/e2e/conservativea-r4-ft/best.json ] \
   && [ ! -e rollouts/e2e/rollout-conservativea-r4ft/errors.json ]; then
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config config/e2e/rollout-conservativea-r4ft.json \
        --output rollout-conservativea-r4ft \
        > runs/e2e/rollout-conservativea-r4ft.log 2>&1
    note "conservativea ft rollout exit=$?"
fi
promote rollouts/e2e/rollout-conservativea-r4ft rollouts/e2e/rollout-conservativea-r4

# 2. StreamFuncB retrain with pushforward
if [ ! -e runs/e2e/.streamfuncb_r4e_done ]; then
    GFD_EPOCH_LIMIT=6 DEADLINE_S=${SFB_DEADLINE_S:-7200} bash scripts/chain_train.sh \
        config/e2e/streamfuncb-r4.json checkpoints/e2e/streamfuncb-r4 \
        runs/e2e/streamfuncb-r4.log
    rc=$?
    note "streamfuncb chain exit=$rc"
    { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch runs/e2e/.streamfuncb_r4e_done
fi
if [ -e checkpoints/e2e/streamfuncb-r4/best.json ] \
   && [ ! -e rollouts/e2e/rollout-streamfuncb-r4b/errors.json ]; then
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config config/e2e/rollout-streamfuncb-r4b.json \
        --output rollout-streamfuncb-r4b \
        > runs/e2e/rollout-streamfuncb-r4b.log 2>&1
    note "streamfuncb rollout exit=$?"
fi
promote rollouts/e2e/rollout-streamfuncb-r4b rollouts/e2e/rollout-streamfuncb-r4

note "queue-r4e done"
