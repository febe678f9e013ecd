#!/bin/bash
# Round-5 batch 2: packed-gradient hardware row (VERDICT r4 next-round
# #4b).  P1 E=83k gradient A/B: lane vs merged vs merged_pk (the packed
# adjoint engine landed this round) — r4 measured lane 7.71e8 / merged
# 7.20e8 grad-DOF/s at this config, with merged LOSING to lane only at
# P1 (the tile-padding outlier the forward path fixed at 1.39x).
set -u
cd /root/repo
LOG=results/r5_batch.log
echo $$ > /tmp/r5_pk.pid
. scripts/r4_lib.sh

if [ -f /tmp/r5_perf.pid ]; then
  P=$(cat /tmp/r5_perf.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== r5 pk batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (r5_pk)" >> "$LOG"; exit 1; }

[ -s results/r5_fwi_grad_p1_pk.json ] || { wait_tpu; \
  run_retry fwi_grad_p1_pk 7200 python -m seigen_tpu.bench.fwi_grad \
    24 1 200 2 --shots 2 --segment 20 --paths lane,merged,merged_pk \
    --out results/r5_fwi_grad_p1_pk.json; }

touch results/r5_pk_done
echo "=== r5 pk batch done $(date -u +%FT%TZ) ===" >> "$LOG"
