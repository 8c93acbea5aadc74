#!/usr/bin/env bash
# Round-3 master TPU queue (replaces the 3-stage chain): strictly sequential
# single-chip work. Perf sweep moved directly after the flagship rollout so
# kernel results arrive early enough to iterate on within the round.
#
#   WAIT_PID=<pid of the running flagship chain_train.sh> scripts/tpu_queue_r3_master.sh
set -u
cd /root/repo
echo $$ > /tmp/queue_r3_master.pid
LOG=runs/e2e/queue-r3.log
echo "=== $(date +%T) master queue start (waiting on ${WAIT_PID:-none}) ===" >> "$LOG"

# 1. flagship training chain
if [ -n "${WAIT_PID:-}" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%T) flagship chain done ===" >> "$LOG"

# 2. flagship rollout (389 steps, 4 valid sims) on the r3 best checkpoint
if [ -e checkpoints/e2e/fluxd-r3/best.json ]; then
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config config/e2e/rollout-r3.json \
        --output rollouts/e2e/rollout-cyl-r3 > runs/e2e/rollout-r3.log 2>&1
    echo "=== $(date +%T) flagship rollout exit=$? ===" >> "$LOG"
fi

# 3. production-scale perf sweep + trace (early: results feed kernel work)
mkdir -p runs/perf
PYTHONUNBUFFERED=1 python scripts/perf_production.py --sweep \
    > runs/perf/sweep-14k.jsonl 2> runs/perf/sweep-14k.log
echo "=== $(date +%T) sweep exit=$? ===" >> "$LOG"
PYTHONUNBUFFERED=1 python scripts/perf_production.py \
    --trace runs/perf/trace-14k --aggregation pallas --banded-dtype int8 \
    >> runs/perf/sweep-14k.jsonl 2>> runs/perf/sweep-14k.log
echo "=== $(date +%T) trace exit=$? ===" >> "$LOG"

# 4-6. family evidence runs with the flagship recipe, then StreamFuncB
for fam in conservativea vertpota streamfuncb; do
    rm -f "runs/e2e/${fam}-r3.log"
    GFD_EPOCH_LIMIT=10 bash scripts/chain_train.sh \
        "config/e2e/${fam}-r3.json" "checkpoints/e2e/${fam}-r3" \
        "runs/e2e/${fam}-r3.log"
    echo "=== $(date +%T) ${fam}-r3 train exit=$? ===" >> "$LOG"
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config "config/e2e/rollout-${fam}-r3.json" \
        --output "rollouts/e2e/rollout-${fam}-r3" \
        > "runs/e2e/rollout-${fam}-r3.log" 2>&1
    echo "=== $(date +%T) ${fam}-r3 rollout exit=$? ===" >> "$LOG"
done

# 7. final recorded bench (post-optimization numbers for PERF.md)
python bench.py > runs/perf/bench-r3.json 2> runs/perf/bench-r3.log
echo "=== $(date +%T) final bench exit=$? ===" >> "$LOG"
echo "=== $(date +%T) master queue done ===" >> "$LOG"
