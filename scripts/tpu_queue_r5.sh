#!/usr/bin/env bash
# Round-4 session-3, stage 3: full evidence chain on the reference-faithful
# "inflow" dataset (/root/data/e2e5, scripts/datagen_r5.sh):
#   1. wait for the 49 train+valid sims -> convert to h5_50 (44/5 split)
#   2. flagship FluxD 30-epoch run (proven r3 recipe, new data)
#   3. wait for the 680-step eval sims -> convert to h5_long
#   4. flagship rollouts (best + latest) at the 676-step reference horizon,
#      promote the better one to rollouts/e2e/rollout-cyl-r5
#   5. family evidence runs (conservativea, vertpota, streamfuncb) + rollouts
#   6. test split conversion; final bench
#
#   nohup scripts/tpu_queue_r5.sh > /dev/null 2>&1 &
set -u
cd /root/repo

exec 200>/tmp/queue_r4.lock
flock 200   # blocking: wait for the r4d/r4e queues to release the TPU
echo $$ > /tmp/queue_r5.pid

LOG=runs/e2e/queue-r5.log
mkdir -p runs/e2e runs/perf
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "queue-r5 start"

# 1. wait for train+valid raw sims, convert once
if [ ! -e /root/data/e2e5/h5_50/.converted ]; then
    while [ ! -e /root/data/e2e5/raw/.trainvalid_done ]; do sleep 60; done
    echo '{"train": [0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,24,25,26,27,28,29,30,31,32,33,34,35,36,37,38,39,40,41,42,43], "valid": [44,45,46,47,48]}' \
        > /root/data/e2e5/subsets_trainvalid.json
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.generate.conversion \
        --raw /root/data/e2e5/raw --meshes /root/data/e2e5/meshes \
        --out /root/data/e2e5/h5_50 \
        --subsets /root/data/e2e5/subsets_trainvalid.json >> "$LOG" 2>&1
    rc=$?
    note "h5_50 conversion exit=$rc"
    [ $rc -eq 0 ] && touch /root/data/e2e5/h5_50/.converted
fi

# 2. flagship training
if [ ! -e runs/e2e/.flagship_r5_done ]; then
    GFD_EPOCH_LIMIT=6 DEADLINE_S=${FLAGSHIP_DEADLINE_S:-10800} bash scripts/chain_train.sh \
        config/e2e/fluxd-r5.json checkpoints/e2e/fluxd-r5 runs/e2e/fluxd-r5.log
    rc=$?
    note "flagship chain exit=$rc"
    { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch runs/e2e/.flagship_r5_done
fi

# 3. wait for long sims, convert
if [ ! -e /root/data/e2e5/h5_long/.converted ]; then
    while [ ! -e /root/data/e2e5/raw_long/.long_done ]; do sleep 60; done
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.generate.conversion \
        --raw /root/data/e2e5/raw_long --meshes /root/data/e2e5/meshes_long \
        --out /root/data/e2e5/h5_long \
        --subsets config/e2e/subsets_long.json >> "$LOG" 2>&1
    rc=$?
    note "h5_long conversion exit=$rc"
    [ $rc -eq 0 ] && touch /root/data/e2e5/h5_long/.converted
fi

# 4. flagship rollouts: best AND latest, promote the better
for cand in best latest; do
    out="rollout-cyl-r5-$cand"
    if [ -e checkpoints/e2e/fluxd-r5/${cand}.json ] \
       && [ ! -e "rollouts/e2e/$out/errors.json" ]; then
        PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "config/e2e/$out.json" --output "$out" \
            > "runs/e2e/$out.log" 2>&1
        note "rollout $cand exit=$?"
    fi
done
python - >> "$LOG" 2>&1 <<'EOF'
import json, os, shutil

def score(path):
    d = json.load(open(path))["scalar"]
    return (d["velocity_error"]["mean_all"] + d["pressure_error"]["mean_all"])

cands = {}
for cand in ("best", "latest"):
    p = f"rollouts/e2e/rollout-cyl-r5-{cand}/errors.json"
    if os.path.exists(p):
        cands[cand] = score(p)
print("candidate scores (velocity+pressure mean_all):", cands)
if cands:
    winner = min(cands, key=cands.get)
    src = f"rollouts/e2e/rollout-cyl-r5-{winner}"
    if os.path.exists("rollouts/e2e/rollout-cyl-r5"):
        shutil.rmtree("rollouts/e2e/rollout-cyl-r5")
    shutil.copytree(src, "rollouts/e2e/rollout-cyl-r5")
    meta = "rollouts/e2e/rollout-cyl-r5/meta.json"
    m = json.load(open(meta)) if os.path.exists(meta) else {}
    m["promoted_from"] = winner
    m["candidate_scores"] = cands
    json.dump(m, open(meta, "w"), indent=1)
    print("promoted", winner)
EOF
note "flagship promotion done"

# 5. family evidence runs, then rollouts
for fam in conservativea vertpota streamfuncb; do
    if [ ! -e "runs/e2e/.${fam}_r5_done" ]; then
        GFD_EPOCH_LIMIT=6 DEADLINE_S=${FAMILY_DEADLINE_S:-5400} bash scripts/chain_train.sh \
            "config/e2e/${fam}-r5.json" "checkpoints/e2e/${fam}-r5" \
            "runs/e2e/${fam}-r5.log"
        rc=$?
        note "${fam} train exit=$rc"
        { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch "runs/e2e/.${fam}_r5_done"
    fi
    if [ -e "checkpoints/e2e/${fam}-r5/best.json" ] \
       && [ ! -e "rollouts/e2e/rollout-${fam}-r5/errors.json" ]; then
        PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "config/e2e/rollout-${fam}-r5.json" \
            --output "rollout-${fam}-r5" > "runs/e2e/rollout-${fam}-r5.log" 2>&1
        note "${fam} rollout exit=$?"
    fi
done

# 6. test split conversion (provenance completeness)
if [ -e /root/data/e2e5/raw/mesh_54/time.log ] \
   && [ ! -e /root/data/e2e5/h5_50/test.h5 ]; then
    echo '{"test": [49,50,51,52,53,54]}' > /root/data/e2e5/subsets_test.json
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.generate.conversion \
        --raw /root/data/e2e5/raw --meshes /root/data/e2e5/meshes \
        --out /root/data/e2e5/h5_50 \
        --subsets /root/data/e2e5/subsets_test.json >> "$LOG" 2>&1
    note "test conversion exit=$?"
fi

# 7. final recorded bench
python bench.py > runs/perf/bench-r5.json 2> runs/perf/bench-r5.log
note "final bench exit=$?"
note "queue-r5 done"
