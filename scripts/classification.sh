#!/bin/bash
# TPU-VM launcher for classifier training — the cluster-layer equivalent of
# the reference's SLURM script (classifier_model/classification.sh: sbatch,
# 1 node / 1 GPU). On TPU VMs there is no scheduler wrapper: run directly on
# the VM (or via `gcloud compute tpus tpu-vm ssh ... --command`).
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"

PYTHONPATH=.:${PYTHONPATH:-} python -m polyp_tpu.cli.train_classifier \
    --data-root "${DATA_ROOT:-./data}" \
    --batch_size 16 --learning_rate 1e-3 --weight_decay 1e-3 \
    --hidden_features 256 --image_size 224 --dropout 0.5 \
    "$@"   # e.g. --weighted_loss / --weighted_sampling / --one_vs_all
