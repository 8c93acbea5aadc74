#!/usr/bin/env bash
# Chained training runner for the tunneled-TPU host-RSS growth issue
# (TRAINING.md "Ops note"): run training in bounded-epoch slices, restarting
# from the latest checkpoint until the configured epochs complete.
#
#   GFD_EPOCH_LIMIT=6 scripts/chain_train.sh config/e2e/fluxd-r3.json [ckpt_dir] [log]
#
# Exit codes from the train CLI: 0 = all epochs done, 3 = epoch-limit break
# (resume), anything else = crash (also resumed, bounded retries).
# DEADLINE_S (optional): wall-clock budget in seconds — no new slice starts
# past it; the best checkpoint so far is what ships (exit 4).
set -u
CONFIG=${1:?usage: chain_train.sh CONFIG [CKPT_DIR] [LOG]}
CKPT=${2:-}
LOG=${3:-/dev/stdout}
MAX_RUNS=${MAX_RUNS:-40}
DEADLINE_S=${DEADLINE_S:-}
START_TS=$(date +%s)

CKPT_ARGS=()
[ -n "$CKPT" ] && CKPT_ARGS=(--ckpt-dir "$CKPT")

for i in $(seq 1 "$MAX_RUNS"); do
    if [ -n "$DEADLINE_S" ] && [ $(( $(date +%s) - START_TS )) -ge "$DEADLINE_S" ]; then
        echo "chain: deadline reached after $(( $(date +%s) - START_TS ))s" >> "$LOG"
        exit 4
    fi
    RESUME=()
    if [ -n "$CKPT" ] && [ -e "$CKPT/latest.json" ]; then
        RESUME=(--resume latest)
    fi
    echo "=== $(date +%T) chain run $i: ${RESUME[*]:-fresh} ===" >> "$LOG"
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.training.train --config "$CONFIG" \
        "${CKPT_ARGS[@]}" "${RESUME[@]}" >> "$LOG" 2>&1
    rc=$?
    echo "=== $(date +%T) chain run $i exit=$rc ===" >> "$LOG"
    if [ $rc -eq 0 ]; then
        echo "chain: training complete" >> "$LOG"
        exit 0
    fi
    sleep 5
done
echo "chain: MAX_RUNS exhausted" >> "$LOG"
exit 1
