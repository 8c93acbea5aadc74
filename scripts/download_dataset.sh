#!/usr/bin/env bash
# Download a DeepMind MeshGraphNets dataset (cylinder_flow, airfoil, ...)
# from the public GCS bucket, then convert to the framework's HDF5 layout.
# Counterpart of the reference's src/datasets/download/download_dataset.sh.
#
# Usage: bash scripts/download_dataset.sh cylinder_flow data/raw/cylinder_flow
set -euo pipefail

DATASET=${1:-cylinder_flow}
OUT=${2:-data/raw/${DATASET}}
BASE="https://storage.googleapis.com/dm-meshgraphnets/${DATASET}"

mkdir -p "${OUT}"
for f in meta.json train.tfrecord valid.tfrecord test.tfrecord; do
  echo "fetching ${BASE}/${f}"
  curl -fL --retry 3 -o "${OUT}/${f}" "${BASE}/${f}"
done

cat <<EOF
Done. Convert with:
  python -m gnn_fluid_dynamics_tpu.data.preproc \\
      --config config/preproc_tfrecord.json --subsets train valid test
(set dataset.module="tfrecord" and preproc.vtk_dpath="${OUT}" in the config)
EOF
