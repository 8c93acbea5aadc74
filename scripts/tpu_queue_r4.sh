#!/usr/bin/env bash
# Round-4 evidence queue — race-proofed per VERDICT r3 ("what's weak" #3):
#   * single-instance enforcement via flock on a lock file
#   * exit codes captured in variables immediately (ADVICE r3)
#   * conversion gated on time.log done-markers (written last, atomic npz)
#   * every stage idempotent: reruns skip completed work
#
# Sequence (one TPU chip, one CPU — everything serial):
#   1. flagship FluxD chain (resumes checkpoints/e2e/fluxd-r3, deadline-bounded)
#   2. wait for the 6 long (680-step) validation sims -> convert to h5_long
#   3. flagship rollout at the reference 676-step horizon, 5 sims
#   4. family evidence runs (conservativea, vertpota, streamfuncb) + rollouts
#   5. final bench
#
#   nohup scripts/tpu_queue_r4.sh > /dev/null 2>&1 &
set -u
cd /root/repo

exec 200>/tmp/queue_r4.lock
if ! flock -n 200; then
    echo "queue_r4 already running (lock held)" >&2
    exit 1
fi
echo $$ > /tmp/queue_r4.pid

LOG=runs/e2e/queue-r4.log
mkdir -p runs/e2e runs/perf
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "queue-r4 start"

# 1. flagship training chain (resume; best ckpt survives the deadline)
if [ ! -e runs/e2e/.flagship_r4_done ]; then
    GFD_EPOCH_LIMIT=6 DEADLINE_S=${FLAGSHIP_DEADLINE_S:-12600} bash scripts/chain_train.sh \
        config/e2e/fluxd-r3.json checkpoints/e2e/fluxd-r3 runs/e2e/fluxd-r3.log
    rc=$?
    note "flagship chain exit=$rc"
    [ $rc -eq 0 ] || [ $rc -eq 4 ] && touch runs/e2e/.flagship_r4_done
fi

# 2. wait for long validation sims, then convert (idempotent, atomic inputs)
if [ ! -e /root/data/e2e/h5_long/.converted ]; then
    while :; do
        n=$(ls /root/data/e2e/raw_long/*/time.log 2>/dev/null | wc -l)
        [ "$n" -ge 6 ] && break
        gen_alive=0
        [ -e /tmp/simgen_long.pid ] && kill -0 "$(cat /tmp/simgen_long.pid)" 2>/dev/null && gen_alive=1
        if [ "$gen_alive" -eq 0 ]; then
            if [ "$n" -ge 5 ]; then
                note "long simgen dead with $n/6 done; proceeding"
                break
            fi
            note "long simgen dead with only $n/6 done; relaunching"
            nice -n 10 python -m gnn_fluid_dynamics_tpu.generate.simulation \
                --meshes /root/data/e2e/meshes_long --out /root/data/e2e/raw_long \
                --steps 680 --backend builtin >> /root/data/e2e/simgen_long.log 2>&1 &
            echo $! > /tmp/simgen_long.pid
        fi
        sleep 60
    done
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.generate.conversion \
        --raw /root/data/e2e/raw_long --meshes /root/data/e2e/meshes_long \
        --out /root/data/e2e/h5_long \
        --subsets config/e2e/subsets_long.json >> "$LOG" 2>&1
    rc=$?
    note "long conversion exit=$rc"
    [ $rc -eq 0 ] && touch /root/data/e2e/h5_long/.converted
fi

# 3. flagship rollout at the 676-step reference horizon
if [ -e checkpoints/e2e/fluxd-r3/best.json ] && [ -e /root/data/e2e/h5_long/.converted ] \
   && [ ! -e rollouts/e2e/rollout-cyl-r4/errors.json ]; then
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
        --config config/e2e/rollout-cyl-r4.json \
        --output rollout-cyl-r4 > runs/e2e/rollout-cyl-r4.log 2>&1
    rc=$?
    note "flagship rollout exit=$rc"
fi

# 4. family evidence runs with the flagship recipe, then rollouts
for fam in conservativea vertpota streamfuncb; do
    if [ ! -e "runs/e2e/.${fam}_r4_done" ]; then
        GFD_EPOCH_LIMIT=10 DEADLINE_S=${FAMILY_DEADLINE_S:-3600} bash scripts/chain_train.sh \
            "config/e2e/${fam}-r3.json" "checkpoints/e2e/${fam}-r3" \
            "runs/e2e/${fam}-r3.log"
        rc=$?
        note "${fam} train exit=$rc"
        [ $rc -eq 0 ] || [ $rc -eq 4 ] && touch "runs/e2e/.${fam}_r4_done"
    fi
    if [ -e "checkpoints/e2e/${fam}-r3/best.json" ] \
       && [ ! -e "rollouts/e2e/rollout-${fam}-r4/errors.json" ]; then
        PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "config/e2e/rollout-${fam}-r4.json" \
            --output "rollout-${fam}-r4" > "runs/e2e/rollout-${fam}-r4.log" 2>&1
        rc=$?
        note "${fam} rollout exit=$rc"
    fi
done

# 5. final recorded bench
python bench.py > runs/perf/bench-r4.json 2> runs/perf/bench-r4.log
note "final bench exit=$?"
note "queue-r4 done"
