#!/usr/bin/env bash
# Round-5 stage 3: remaining family evidence on the inflow data.
#
# The r5 queue was reordered mid-flight (skip-markers on vertpota/streamfuncb)
# so the flagship pressure fine-tune (queue r5b, VERDICT item 1) gets the TPU
# before the remaining families.  This queue runs after r5b:
#   1. streamfuncb: full 20-epoch run (VERDICT item 3 bar: 676-step velocity
#      mean_all < 0.1) + 676-step rollout
#   2. vertpota: from-scratch run sized to the remaining round wall time
#      (the r4 warm-start checkpoints did not survive the VM recycle) +
#      676-step rollout; skipped if under 40 min remain
#
#   nohup scripts/tpu_queue_r5c.sh > /dev/null 2>&1 &
set -u
cd /root/repo

# r5b is already waiting on the flock; make sure it wins the TPU first.
for i in $(seq 1 210); do
    grep -q "queue-r5b done" runs/e2e/queue-r5b.log 2>/dev/null && break
    sleep 60
done

exec 200>/tmp/queue_r4.lock
flock 200
echo $$ > /tmp/queue_r5c.pid

LOG=runs/e2e/queue-r5c.log
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "queue-r5c start"

# remove the skip-markers this queue owns (the r5 queue's family loop has
# exited by now — r5b could only run after r5 released the lock)
rm -f runs/e2e/.vertpota_r5_done runs/e2e/.streamfuncb_r5_done

# round wall-clock end (driver started ~04:01 UTC + 12 h); leave a commit margin
ROUND_END=${ROUND_END:-$(date -d "today 15:55" +%s)}
left() { echo $(( ROUND_END - $(date +%s) )); }

run_family() {
    fam=$1; deadline=$2
    if [ ! -e "runs/e2e/.${fam}_r5c_done" ]; then
        GFD_EPOCH_LIMIT=6 DEADLINE_S=$deadline bash scripts/chain_train.sh \
            "config/e2e/${fam}-r5.json" "checkpoints/e2e/${fam}-r5" \
            "runs/e2e/${fam}-r5.log"
        rc=$?
        note "${fam} train exit=$rc (deadline ${deadline}s)"
        { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch "runs/e2e/.${fam}_r5c_done"
    fi
    if [ -e "checkpoints/e2e/${fam}-r5/best.json" ] \
       && [ ! -e "rollouts/e2e/rollout-${fam}-r5/errors.json" ]; then
        PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "config/e2e/rollout-${fam}-r5.json" \
            --output "rollout-${fam}-r5" > "runs/e2e/rollout-${fam}-r5.log" 2>&1
        note "${fam} rollout exit=$?"
    fi
}

# streamfuncb: full run, but never eat the whole remaining round
SF_DEADLINE=$(( $(left) - 2700 ))   # leave vertpota+rollout margin
[ "$SF_DEADLINE" -gt 5400 ] && SF_DEADLINE=5400
[ "$SF_DEADLINE" -lt 1200 ] && SF_DEADLINE=1200
run_family streamfuncb "$SF_DEADLINE"

# vertpota: whatever remains minus the ~15 min rollout
VP_DEADLINE=$(( $(left) - 1200 ))
if [ "$VP_DEADLINE" -gt 1500 ]; then
    run_family vertpota "$VP_DEADLINE"
else
    note "vertpota skipped: only $(left)s of round left"
fi

note "queue-r5c done"
