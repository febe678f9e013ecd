#!/usr/bin/env bash
# Multi-host TPU pod launcher — the rebuild's equivalent of the reference's
# PBS/SLURM launchers (SURVEY.md §2 layer 8).  On a TPU pod slice (e.g.
# v5e-16), run the same script on every host; jax.distributed picks up the
# topology from the TPU runtime environment.
#
# Usage (per host, e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`):
#   bash launchers/tpu_pod_run.sh scripts/explosive_source.py \
#       --dim 3 --n 48 --degree 3 --shards 16 --T 1.0
set -euo pipefail

SCRIPT=${1:?usage: tpu_pod_run.sh <script.py> [args...]}
shift

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}
# One process per host; jax.distributed.initialize() autodetects coordinator
# and process count from the TPU metadata on Cloud TPU VMs.
exec python - "$SCRIPT" "$@" <<'PYEOF'
import runpy
import sys

import jax

try:
    jax.distributed.initialize()  # no-op / autodetect on single host
except Exception as e:  # single-host dev boxes
    print(f"[tpu_pod_run] jax.distributed.initialize skipped: {e}",
          file=sys.stderr)

script = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(script, run_name="__main__")
PYEOF
