#!/usr/bin/env bash
# Round-4 stint 2: blocks on the SAME flock as tpu_queue_r4.sh, so it starts
# automatically the moment the main evidence queue finishes (and can never
# run concurrently with it — the round-3 failure mode). Continues flagship
# training to the configured 30 epochs (the stage-1 deadline usually lands
# ~e24, before the final LR decay), then re-runs the 676-step rollout with
# the improved best checkpoint and the final bench.
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

# 2. re-run the reference-horizon rollout with the improved best checkpoint
#    (keep the stint-1 artifact for provenance)
if [ -e rollouts/e2e/rollout-cyl-r4/errors.json ] \
   && [ ! -d rollouts/e2e/rollout-cyl-r4-stint1 ]; then
    mv rollouts/e2e/rollout-cyl-r4 rollouts/e2e/rollout-cyl-r4-stint1
fi
if [ -e checkpoints/e2e/fluxd-r3/best.json ] \
   && [ ! -e rollouts/e2e/rollout-cyl-r4/errors.json ]; then
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config config/e2e/rollout-cyl-r4.json \
        --output rollout-cyl-r4 > runs/e2e/rollout-cyl-r4.log 2>&1
    rc=$?
    note "flagship rollout (stint2) exit=$rc"
fi

# 3. final recorded bench
python bench.py > runs/perf/bench-r4b.json 2> runs/perf/bench-r4b.log
note "queue-r4b done"
