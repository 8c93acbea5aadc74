#!/usr/bin/env bash
# Round-4 session-2 evidence queue. The VM restart wiped /root/data and all
# r4 checkpoints; scripts/datagen_r4.sh regenerates raw data in priority
# order (train+valid 400-step sims first, then the 680-step eval sims, then
# test). This queue:
#   1. waits for the 49 train+valid sims -> converts to h5_50 (44/5 split)
#   2. flagship FluxD 30-epoch chain (device-resident fused path — ~2 min/epoch)
#   3. waits for the long sims -> converts to h5_long
#   4. flagship rollouts (best + latest) at the 676-step reference horizon,
#      promotes the better one to rollouts/e2e/rollout-cyl-r4
#   5. family evidence runs (conservativea, vertpota, streamfuncb) + rollouts
#   6. converts the test split when present; final bench
#
#   nohup scripts/tpu_queue_r4c.sh > /dev/null 2>&1 &
set -u
cd /root/repo

exec 200>/tmp/queue_r4.lock
if ! flock -n 200; then
    echo "queue_r4 already running (lock held)" >&2
    exit 1
fi
echo $$ > /tmp/queue_r4c.pid

LOG=runs/e2e/queue-r4c.log
mkdir -p runs/e2e runs/perf
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "queue-r4c start"

# 1. wait for train+valid raw sims, convert once
if [ ! -e /root/data/e2e/h5_50/.converted ]; then
    while [ ! -e /root/data/e2e/raw/.trainvalid_done ]; do sleep 60; done
    echo '{"train": [0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,24,25,26,27,28,29,30,31,32,33,34,35,36,37,38,39,40,41,42,43], "valid": [44,45,46,47,48]}' \
        > /root/data/e2e/subsets_trainvalid.json
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.generate.conversion \
        --raw /root/data/e2e/raw --meshes /root/data/e2e/meshes \
        --out /root/data/e2e/h5_50 \
        --subsets /root/data/e2e/subsets_trainvalid.json >> "$LOG" 2>&1
    rc=$?
    note "h5_50 conversion exit=$rc"
    [ $rc -eq 0 ] && touch /root/data/e2e/h5_50/.converted
fi

# 2. flagship training chain to the full 30 epochs
if [ ! -e runs/e2e/.flagship_r4c_done ]; then
    GFD_EPOCH_LIMIT=10 DEADLINE_S=${FLAGSHIP_DEADLINE_S:-14400} bash scripts/chain_train.sh \
        config/e2e/fluxd-r3.json checkpoints/e2e/fluxd-r3 runs/e2e/fluxd-r3.log
    rc=$?
    note "flagship chain exit=$rc"
    { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch runs/e2e/.flagship_r4c_done
fi

# 3. wait for long sims, convert
if [ ! -e /root/data/e2e/h5_long/.converted ]; then
    while [ ! -e /root/data/e2e/raw_long/.long_done ]; do sleep 60; done
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.generate.conversion \
        --raw /root/data/e2e/raw_long --meshes /root/data/e2e/meshes_long \
        --out /root/data/e2e/h5_long \
        --subsets config/e2e/subsets_long.json >> "$LOG" 2>&1
    rc=$?
    note "h5_long conversion exit=$rc"
    [ $rc -eq 0 ] && touch /root/data/e2e/h5_long/.converted
fi

# 4. flagship rollouts at the 676-step reference horizon: best AND latest
for cand in best latest; do
    cfg=config/e2e/rollout-cyl-r4.json
    [ "$cand" = latest ] && cfg=config/e2e/rollout-cyl-r4-latest.json
    out="rollout-cyl-r4-$cand"
    if [ -e checkpoints/e2e/fluxd-r3/best.json ] \
       && [ ! -e "rollouts/e2e/$out/errors.json" ]; then
        PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "$cfg" --output "$out" > "runs/e2e/$out.log" 2>&1
        note "rollout $cand exit=$?"
    fi
done

# promote the better candidate (velocity + pressure mean_all)
python - >> "$LOG" 2>&1 <<'EOF'
import json, os, shutil

def score(path):
    d = json.load(open(path))["scalar"]
    return (d["velocity_error"]["mean_all"] + d["pressure_error"]["mean_all"])

cands = {}
for cand in ("best", "latest"):
    p = f"rollouts/e2e/rollout-cyl-r4-{cand}/errors.json"
    if os.path.exists(p):
        cands[cand] = score(p)
print("candidate scores (velocity+pressure mean_all):", cands)
if cands:
    winner = min(cands, key=cands.get)
    src = f"rollouts/e2e/rollout-cyl-r4-{winner}"
    if os.path.exists("rollouts/e2e/rollout-cyl-r4"):
        shutil.rmtree("rollouts/e2e/rollout-cyl-r4")
    shutil.copytree(src, "rollouts/e2e/rollout-cyl-r4")
    meta = "rollouts/e2e/rollout-cyl-r4/meta.json"
    m = json.load(open(meta)) if os.path.exists(meta) else {}
    m["promoted_from"] = winner
    m["candidate_scores"] = cands
    json.dump(m, open(meta, "w"), indent=1)
    print("promoted", winner)
EOF
note "flagship promotion done"

# 5. family evidence runs with the flagship recipe, then rollouts
for fam in conservativea vertpota streamfuncb; do
    if [ ! -e "runs/e2e/.${fam}_r4c_done" ]; then
        GFD_EPOCH_LIMIT=10 DEADLINE_S=${FAMILY_DEADLINE_S:-5400} bash scripts/chain_train.sh \
            "config/e2e/${fam}-r3.json" "checkpoints/e2e/${fam}-r3" \
            "runs/e2e/${fam}-r3.log"
        rc=$?
        note "${fam} train exit=$rc"
        { [ $rc -eq 0 ] || [ $rc -eq 4 ]; } && touch "runs/e2e/.${fam}_r4c_done"
    fi
    if [ -e "checkpoints/e2e/${fam}-r3/best.json" ] \
       && [ ! -e "rollouts/e2e/rollout-${fam}-r4/errors.json" ]; then
        PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.rollout.run \
            --config "config/e2e/rollout-${fam}-r4.json" \
            --output "rollout-${fam}-r4" > "runs/e2e/rollout-${fam}-r4.log" 2>&1
        note "${fam} rollout exit=$?"
    fi
done

# 6. test split conversion (provenance completeness; nothing reads it yet)
if [ -e /root/data/e2e/raw/mesh_54/time.log ] \
   && [ ! -e /root/data/e2e/h5_50/test.h5 ]; then
    echo '{"test": [49,50,51,52,53,54]}' > /root/data/e2e/subsets_test.json
    PYTHONUNBUFFERED=1 python -m gnn_fluid_dynamics_tpu.generate.conversion \
        --raw /root/data/e2e/raw --meshes /root/data/e2e/meshes \
        --out /root/data/e2e/h5_50 \
        --subsets /root/data/e2e/subsets_test.json >> "$LOG" 2>&1
    note "test conversion exit=$?"
fi

# 7. final recorded bench
python bench.py > runs/perf/bench-r4c.json 2> runs/perf/bench-r4c.log
note "final bench exit=$?"
note "queue-r4c done"
