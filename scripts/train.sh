#!/usr/bin/env bash
# Training launcher (the counterpart of reference scripts/train.sh):
# single-host JAX process; on a TPU pod slice, run this once per host
# (jax.distributed initializes from the TPU environment).
set -euo pipefail
CONFIG=${1:-config/train.json}
shift || true
exec python -m gnn_fluid_dynamics_tpu.training.train --config "$CONFIG" "$@"
