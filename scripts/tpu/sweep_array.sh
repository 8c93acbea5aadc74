#!/usr/bin/env bash
# Array-style sweep sharding without SLURM: set SHARD_INDEX / NUM_SHARDS per
# worker (the counterpart of reference scripts/slurm/sweep.sh's #SBATCH --array)
set -euo pipefail
CONFIG=${1:-config/sweep.json}
exec python -m gnn_fluid_dynamics_tpu.training.sweep --config "$CONFIG" \
  --shard-index "${SHARD_INDEX:-0}" --num-shards "${NUM_SHARDS:-1}"
