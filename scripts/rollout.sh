#!/usr/bin/env bash
set -euo pipefail
CONFIG=${1:-config/rollout.json}
shift || true
exec python -m gnn_fluid_dynamics_tpu.rollout.run --config "$CONFIG" "$@"
