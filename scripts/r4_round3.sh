#!/bin/bash
# Round-4 batch 6: repair of the two C-PML rows from r4_round2.sh, which
# failed on a wrong CLI flag (explosive_source.py takes --report, not
# --json; see results/r4_batch.log 21:32).  Artifact-gated like every
# other batch — safe to relaunch.
#   pml       C-PML mixed-cost row: einsum+pml (VERDICT r3 #9)
#   pml_base  plain einsum twin of the same config (the cost denominator)
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_round3.pid
. scripts/r4_lib.sh

echo "=== r4 round3 batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (round3)" >> "$LOG"; exit 1; }

[ -f results/r4_pml.json ] || { wait_tpu; \
  run_retry pml 2400 python scripts/explosive_source.py --dim 2 --n 64 \
    --degree 3 --T 0.3 --impl einsum --pml 0.15 \
    --report results/r4_pml.json; }
[ -f results/r4_pml_base.json ] || { wait_tpu; \
  run_retry pml_base 2400 python scripts/explosive_source.py --dim 2 \
    --n 64 --degree 3 --T 0.3 --impl einsum \
    --report results/r4_pml_base.json; }

echo "=== r4 round3 batch done $(date -u +%FT%TZ) ===" >> "$LOG"
