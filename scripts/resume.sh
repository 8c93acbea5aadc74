#!/usr/bin/env bash
# Resume from the latest checkpoint (reference scripts/resume.sh)
set -euo pipefail
CONFIG=${1:-config/train.json}
shift || true
exec python -m gnn_fluid_dynamics_tpu.training.train --config "$CONFIG" --resume latest "$@"
