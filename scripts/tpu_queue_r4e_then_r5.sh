#!/usr/bin/env bash
# Deterministic sequencing: old-data family queue (r4e) first, then the
# inflow-regime evidence chain (r5). Both scripts flock the same TPU lock;
# running them from one wrapper fixes the acquisition order.
set -u
cd /root/repo
CONS_DEADLINE_S=${CONS_DEADLINE_S:-5400} SFB_DEADLINE_S=${SFB_DEADLINE_S:-5400} \
    bash scripts/tpu_queue_r4e.sh
bash scripts/tpu_queue_r5.sh
