#!/bin/bash
# Round-5 batch 5: curvilinear scan-level A/B (VERDICT r4 next-round
# #9) — prices the per-element-matrix formulation against the affine
# twins and its own batched-GEMM bounds (design note in
# scripts/curvi_ab.py: per-element operands have no shared-table lane
# form; the exact formulation is already in its natural TPU shape).
set -u
cd /root/repo
LOG=results/r5_batch.log
echo $$ > /tmp/r5_curvi.pid
. scripts/r4_lib.sh

for dep in r5_perf r5_pk r5_cpml; do
  if [ -f /tmp/$dep.pid ]; then
    P=$(cat /tmp/$dep.pid)
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
  fi
done
echo "=== r5 curvi batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (r5_curvi)" >> "$LOG"; exit 1; }

[ -s results/r5_curvi_ab.json ] || { wait_tpu; \
  run_retry curvi_ab 2400 python scripts/curvi_ab.py --nx 96 --nz 48 \
    --degree 3 --steps 50 --out results/r5_curvi_ab.json; }

touch results/r5_curvi_done
echo "=== r5 curvi batch done $(date -u +%FT%TZ) ===" >> "$LOG"
