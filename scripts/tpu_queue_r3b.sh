#!/usr/bin/env bash
# Round-3 TPU queue, stage 2: after tpu_queue_r3.sh finishes, train + roll
# out StreamFuncB — the learnable StreamFunc variant (TRAINING.md failure
# mode 3: SFA's normalized-space curl target is structurally unreachable;
# SFB curls in physical space).
#
#   WAIT_PID=<pid of tpu_queue_r3.sh> scripts/tpu_queue_r3b.sh
set -u
cd /root/repo
LOG=runs/e2e/queue-r3.log
if [ -n "${WAIT_PID:-}" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%T) stage-2: streamfuncb-r3 ===" >> "$LOG"
GFD_EPOCH_LIMIT=10 bash scripts/chain_train.sh \
    config/e2e/streamfuncb-r3.json checkpoints/e2e/streamfuncb-r3 \
    runs/e2e/streamfuncb-r3.log
echo "=== $(date +%T) streamfuncb-r3 train exit=$? ===" >> "$LOG"
PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
    --config config/e2e/rollout-streamfuncb-r3.json \
    --output rollouts/e2e/rollout-streamfuncb-r3 >> runs/e2e/rollout-streamfuncb-r3.log 2>&1
echo "=== $(date +%T) streamfuncb-r3 rollout exit=$? ===" >> "$LOG"
echo "=== $(date +%T) stage-2 done ===" >> "$LOG"
