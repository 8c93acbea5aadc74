#!/usr/bin/env bash
# Dataset preprocessing: VTK/DeepMind sources -> canonical HDF5
set -euo pipefail
exec python -m gnn_fluid_dynamics_tpu.generate.conversion "$@"
