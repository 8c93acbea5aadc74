#!/usr/bin/env bash
# Round-3 TPU work queue: wait for the in-flight flagship chain (fluxd-r3)
# to finish, then roll it out, then train + roll out the family-evidence
# models with the flagship stabilization recipe (pushforward + warmup).
# Single-chip TPU: strictly sequential.
#
#   WAIT_PID=<pid of the running chain_train.sh> scripts/tpu_queue_r3.sh
set -u
cd /root/repo
LOG=runs/e2e/queue-r3.log
echo "=== $(date +%T) queue start (waiting on ${WAIT_PID:-none}) ===" >> "$LOG"

# 1. Wait for the running chain_train.sh (flagship) to exit.
if [ -n "${WAIT_PID:-}" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%T) flagship chain done ===" >> "$LOG"

# 2. Flagship rollout (389 steps, 4 valid sims) on the r3 best checkpoint.
if [ -e checkpoints/e2e/fluxd-r3/best.json ]; then
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config config/e2e/rollout-r3.json \
        --output rollouts/e2e/rollout-cyl-r3 >> runs/e2e/rollout-r3.log 2>&1
    echo "=== $(date +%T) flagship rollout exit=$? ===" >> "$LOG"
fi

# 3. Family evidence runs with the flagship recipe.
for fam in conservativea vertpota; do
    GFD_EPOCH_LIMIT=10 bash scripts/chain_train.sh \
        "config/e2e/${fam}-r3.json" "checkpoints/e2e/${fam}-r3" \
        "runs/e2e/${fam}-r3.log"
    echo "=== $(date +%T) ${fam}-r3 train exit=$? ===" >> "$LOG"
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config "config/e2e/rollout-${fam}-r3.json" \
        --output "rollouts/e2e/rollout-${fam}-r3" >> "runs/e2e/rollout-${fam}-r3.log" 2>&1
    echo "=== $(date +%T) ${fam}-r3 rollout exit=$? ===" >> "$LOG"
done
echo "=== $(date +%T) queue done ===" >> "$LOG"
