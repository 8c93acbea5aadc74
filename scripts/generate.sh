#!/usr/bin/env bash
# Full data generation: meshes -> CFD -> HDF5 (reference scripts/generate.sh)
set -euo pipefail
OUT=${OUT:-data}
python -m gnn_fluid_dynamics_tpu.generate.mesh --num "${NUM:-10}" --out "$OUT/meshes"
python -m gnn_fluid_dynamics_tpu.generate.simulation --meshes "$OUT/meshes" --out "$OUT/raw" --steps "${STEPS:-400}"
python -m gnn_fluid_dynamics_tpu.generate.conversion --raw "$OUT/raw" --meshes "$OUT/meshes" --out "$OUT/h5"
