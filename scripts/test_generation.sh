#!/bin/bash
# TPU-VM launcher for the downstream augmentation eval — equivalent of
# generator_model/test_generation.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"

PYTHONPATH=.:${PYTHONPATH:-} python -m polyp_tpu.cli.eval_augmentation \
    --data-root "${DATA_ROOT:-./data}" \
    "$@"   # --path_model <run folder> [--run_id <id>] [--ad_vs_rest]
