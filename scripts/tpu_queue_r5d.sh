#!/usr/bin/env bash
# Round-5 stage 3 (replaces tpu_queue_r5c.sh): remaining evidence, reordered.
#
# The flagship pressure fine-tune (queue r5b) did not improve pressure
# (0.2886 vs incumbent 0.2818 at 676 steps) — the per-graph relative
# pressure loss at weight 100 moved neither bar.  ConservativeA, by
# contrast, already meets the <0.15 pressure bar (0.146) and its 20-epoch
# valid curve was still descending when the cosine annealed (0.19 -> 0.10
# over the last two epochs), so a short warm-start fine-tune is the
# cheapest credible path to a model that meets BOTH flagship bars
# (velocity <= 0.02 AND pressure < 0.15).  Order:
#   1. conservativea-r5-vft: 10-epoch warm-start fine-tune (lr restart
#      1e-4 cosine) + 676-step rollout of best
#   2. streamfuncb: full run (VERDICT item 3 bar: velocity mean_all < 0.1)
#      + 676-step rollout
#   3. vertpota: only if enough round time remains (family pressure bar)
#
#   nohup scripts/tpu_queue_r5d.sh > /dev/null 2>&1 &
set -u
cd /root/repo

# let r5b finish first (it holds the flock through its promotion step)
for i in $(seq 1 60); do
    grep -q "queue-r5b done" runs/e2e/queue-r5b.log 2>/dev/null && break
    sleep 30
done

exec 200>/tmp/queue_r4.lock
flock 200
echo $$ > /tmp/queue_r5d.pid

LOG=runs/e2e/queue-r5d.log
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "queue-r5d start"

# round wall-clock end (driver started ~04:01 UTC + 12 h); leave a commit margin
ROUND_END=${ROUND_END:-$(date -d "today 15:52" +%s)}
left() { echo $(( ROUND_END - $(date +%s) )); }

train_and_rollout() {
    fam=$1; cfg=$2; deadline=$3; epoch_limit=$4; rollout_cfg=$5; rollout_out=$6
    if [ ! -e "runs/e2e/.${fam}_r5d_done" ]; then
        GFD_EPOCH_LIMIT=$epoch_limit DEADLINE_S=$deadline bash scripts/chain_train.sh \
            "config/e2e/${cfg}.json" "checkpoints/e2e/${cfg}" \
            "runs/e2e/${cfg}.log"
        rc=$?
        note "${fam} train exit=$rc (deadline ${deadline}s)"
        { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch "runs/e2e/.${fam}_r5d_done"
    fi
    if [ -e "checkpoints/e2e/${cfg}/best.json" ] \
       && [ ! -e "rollouts/e2e/${rollout_out}/errors.json" ]; then
        PYTHONUNBUFFERED=1 timeout 1800 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "config/e2e/${rollout_cfg}.json" \
            --output "${rollout_out}" > "runs/e2e/${rollout_out}.log" 2>&1
        note "${fam} rollout exit=$?"
    fi
}

# 1. ConservativeA velocity fine-tune: shapes match the base run, so the
# XLA compile cache should make slices cheap; hard-cap at 35 min anyway.
train_and_rollout conservativea_vft conservativea-r5-vft 2100 12 \
    rollout-conservativea-r5vft-best rollout-conservativea-r5vft-best

# 2. StreamFuncB: whatever remains minus the vertpota margin, capped.
SF_DEADLINE=$(( $(left) - 3000 ))
[ "$SF_DEADLINE" -gt 4500 ] && SF_DEADLINE=4500
[ "$SF_DEADLINE" -lt 1200 ] && SF_DEADLINE=1200
train_and_rollout streamfuncb streamfuncb-r5 "$SF_DEADLINE" 10 \
    rollout-streamfuncb-r5 rollout-streamfuncb-r5

# 3. VertPotA: only with a real budget (needs from-scratch train + rollout).
VP_DEADLINE=$(( $(left) - 1500 ))
if [ "$VP_DEADLINE" -gt 1200 ]; then
    train_and_rollout vertpota vertpota-r5 "$VP_DEADLINE" 10 \
        rollout-vertpota-r5 rollout-vertpota-r5
else
    note "vertpota skipped: only $(left)s of round left"
fi

note "queue-r5d done"
