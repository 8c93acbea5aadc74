#!/usr/bin/env bash
# Round-3 TPU queue, stage 3: production-scale perf evidence (VERDICT r2
# item 7). After the stage-2 (streamfuncb) queue finishes, sweep the ~14k-cell
# rollout backends and capture an xplane trace for the floor analysis.
#
#   WAIT_PID=<pid of tpu_queue_r3b.sh> scripts/tpu_queue_r3c.sh
set -u
cd /root/repo
LOG=runs/e2e/queue-r3.log
if [ -n "${WAIT_PID:-}" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%T) stage-3: production perf sweep ===" >> "$LOG"
mkdir -p runs/perf
PYTHONUNBUFFERED=1 python scripts/perf_production.py --sweep \
    > runs/perf/sweep-14k.jsonl 2> runs/perf/sweep-14k.log
echo "=== $(date +%T) sweep exit=$? ===" >> "$LOG"
PYTHONUNBUFFERED=1 python scripts/perf_production.py \
    --trace runs/perf/trace-14k --aggregation pallas --banded-dtype int8 \
    >> runs/perf/sweep-14k.jsonl 2>> runs/perf/sweep-14k.log
echo "=== $(date +%T) trace exit=$? ===" >> "$LOG"
echo "=== $(date +%T) stage-3 done ===" >> "$LOG"
