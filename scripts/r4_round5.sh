#!/bin/bash
# Round-4 batch 8: pml_ab repair (scripts/pml_ab.py missed the repo-root
# sys.path bootstrap every other script carries; ModuleNotFoundError).
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_round5.pid
. scripts/r4_lib.sh

echo "=== r4 round5 batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (round5)" >> "$LOG"; exit 1; }

[ -f results/r4_pml_ab.json ] || { wait_tpu; \
  run_retry pml_ab 2400 python scripts/pml_ab.py --n 64 --degree 3 \
    --steps 50 --out results/r4_pml_ab.json; }

echo "=== r4 round5 batch done $(date -u +%FT%TZ) ===" >> "$LOG"
