#!/usr/bin/env bash
# Round-3 master queue, rev d: the workspace was restored from git at the
# start of this session, wiping /root/data — so the queue now starts from
# raw-data generation and runs everything sequentially on the one chip:
#   wait for 55 raw sims -> convert to h5_50 -> flagship chain (deadline)
#   -> flagship rollout -> family evidence runs -> final bench.
#
#   scripts/tpu_queue_r3d.sh   (nohup, background)
set -u
cd /root/repo
echo $$ > /tmp/queue_r3d.pid
LOG=runs/e2e/queue-r3.log
mkdir -p runs/e2e runs/perf
echo "=== $(date +%T) queue-r3d start ===" >> "$LOG"

# 1. wait for the raw generation (55 sims) and the perf sweep to finish
while :; do
    n=$(ls /root/data/e2e/raw/*/fields.npz 2>/dev/null | wc -l)
    sweep_alive=0
    [ -e /tmp/sweep.pid ] && kill -0 "$(cat /tmp/sweep.pid)" 2>/dev/null && sweep_alive=1
    [ "$n" -ge 55 ] && [ "$sweep_alive" -eq 0 ] && break
    sleep 120
done
echo "=== $(date +%T) raw generation done (55 sims) ===" >> "$LOG"

# 2. convert raw -> h5_50 (80/10/10 subsets: 44 train / 5 valid / 6 test)
if [ ! -e /root/data/e2e/h5_50/.converted ]; then
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.generate.conversion \
        --raw /root/data/e2e/raw --meshes /root/data/e2e/meshes \
        --out /root/data/e2e/h5_50 >> "$LOG" 2>&1 \
        && touch /root/data/e2e/h5_50/.converted
    echo "=== $(date +%T) conversion exit=$? ===" >> "$LOG"
fi

# 3. flagship training chain (bounded wall clock; best ckpt survives)
rm -f runs/e2e/fluxd-r3.log
GFD_EPOCH_LIMIT=6 DEADLINE_S=${FLAGSHIP_DEADLINE_S:-13500} bash scripts/chain_train.sh \
    config/e2e/fluxd-r3.json checkpoints/e2e/fluxd-r3 runs/e2e/fluxd-r3.log
echo "=== $(date +%T) flagship chain exit=$? ===" >> "$LOG"

# 4. flagship rollout (389 steps, 4 valid sims) on the r3 best checkpoint
if [ -e checkpoints/e2e/fluxd-r3/best.json ]; then
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config config/e2e/rollout-r3.json \
        --output rollouts/e2e/rollout-cyl-r3 > runs/e2e/rollout-r3.log 2>&1
    echo "=== $(date +%T) flagship rollout exit=$? ===" >> "$LOG"
fi

# 5. family evidence runs with the flagship recipe, then StreamFuncB
for fam in conservativea vertpota streamfuncb; do
    rm -f "runs/e2e/${fam}-r3.log"
    GFD_EPOCH_LIMIT=10 DEADLINE_S=${FAMILY_DEADLINE_S:-3300} bash scripts/chain_train.sh \
        "config/e2e/${fam}-r3.json" "checkpoints/e2e/${fam}-r3" \
        "runs/e2e/${fam}-r3.log"
    echo "=== $(date +%T) ${fam}-r3 train exit=$? ===" >> "$LOG"
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config "config/e2e/rollout-${fam}-r3.json" \
        --output "rollouts/e2e/rollout-${fam}-r3" \
        > "runs/e2e/rollout-${fam}-r3.log" 2>&1
    echo "=== $(date +%T) ${fam}-r3 rollout exit=$? ===" >> "$LOG"
done

# 6. final recorded bench (post-optimization numbers for PERF.md)
python bench.py > runs/perf/bench-r3.json 2> runs/perf/bench-r3.log
echo "=== $(date +%T) final bench exit=$? ===" >> "$LOG"
echo "=== $(date +%T) queue-r3d done ===" >> "$LOG"
