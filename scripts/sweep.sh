#!/usr/bin/env bash
set -euo pipefail
CONFIG=${1:-config/sweep.json}
shift || true
exec python -m gnn_fluid_dynamics_tpu.training.sweep --config "$CONFIG" "$@"
