#!/bin/bash
# TPU-VM launcher for diffusion generator training — equivalent of
# generator_model/generation.sh (SLURM, 1 GPU, 3-day walltime).
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"

PYTHONPATH=.:${PYTHONPATH:-} python -m polyp_tpu.cli.train_scratch \
    --data-root "${DATA_ROOT:-./data}" \
    "$@"   # e.g. --one_vs_rest --conditional_generation
