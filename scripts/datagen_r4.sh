#!/usr/bin/env bash
# Round-4 session-2 data regeneration (the VM restart wiped /root/data).
# Priority order chosen so TPU training can start as early as possible:
#   1. raw mesh_0..48 at 400 steps  (44 train + 5 valid -> h5_50)
#   2. raw_long mesh_44..49 at 680 steps (the 676-step eval horizon -> h5_long)
#   3. raw mesh_49..54 at 400 steps (test split; evidence never reads it)
# Conversions are triggered by the consumer queue, not here.
set -u
cd /root/repo
exec 201>/tmp/datagen_r4.lock
if ! flock -n 201; then echo "datagen already running" >&2; exit 1; fi
echo $$ > /tmp/datagen_r4.pid
LOG=/root/data/e2e/datagen.log
note() { echo "=== $(date +%T) $* ===" >> "$LOG"; }
note "datagen_r4 start"

# the sim driver shards over the LEX-sorted mesh list; map numeric -> lex
lex() { python -c "print(sorted(f'mesh_{j}' for j in range(55)).index('mesh_$1'))"; }

for i in $(seq 0 48); do
    [ -e "/root/data/e2e/raw/mesh_$i/time.log" ] && continue
    python -m gnn_fluid_dynamics_tpu.generate.simulation \
        --meshes /root/data/e2e/meshes --out /root/data/e2e/raw \
        --steps 400 --backend builtin \
        --shard-index "$(lex $i)" --num-shards 55 >> "$LOG" 2>&1
done
note "train+valid raw done (0..48)"
touch /root/data/e2e/raw/.trainvalid_done

for i in 0 1 2 3 4 5; do
    python -m gnn_fluid_dynamics_tpu.generate.simulation \
        --meshes /root/data/e2e/meshes_long --out /root/data/e2e/raw_long \
        --steps 680 --backend builtin \
        --shard-index "$i" --num-shards 6 >> "$LOG" 2>&1
done
note "long raw done (44..49 @ 680)"
touch /root/data/e2e/raw_long/.long_done

for i in $(seq 49 54); do
    [ -e "/root/data/e2e/raw/mesh_$i/time.log" ] && continue
    python -m gnn_fluid_dynamics_tpu.generate.simulation \
        --meshes /root/data/e2e/meshes --out /root/data/e2e/raw \
        --steps 400 --backend builtin \
        --shard-index "$(lex $i)" --num-shards 55 >> "$LOG" 2>&1
done
note "test raw done (49..54)"
note "datagen_r4 done"
