#!/usr/bin/env bash
# TPU pod-slice launcher — the TPU-native counterpart of the reference's
# SLURM scripts (scripts/slurm/train.sh): run the same command on every host
# of the slice; JAX picks up the slice topology from the TPU runtime.
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd $REPO && bash scripts/tpu/train_pod.sh config/train.json"
set -euo pipefail
CONFIG=${1:-config/train.json}
exec python -m gnn_fluid_dynamics_tpu.training.train --config "$CONFIG"
