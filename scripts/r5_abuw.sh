#!/bin/bash
# Round-5 batch 0b: unstructured upwind panel-gather ATTRIBUTION
# (VERDICT r4 next-round #2b).  gT4 = own-rows build only (restriction
# + traction) — the producer-side-emission lever's ceiling; g4 - gT4 =
# neighbour takes + materialization (irreducible).  Decides implement
# vs decisive-negative for the emission lever.
set -u
cd /root/repo
LOG=results/r5_batch.log
echo $$ > /tmp/r5_abuw.pid
. scripts/r4_lib.sh
if [ -f /tmp/r5_perf.pid ]; then
  P=$(cat /tmp/r5_perf.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== r5 abuw batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (r5_abuw)" >> "$LOG"; exit 1; }

[ -s results/r5_ab_upwind_u_split.json ] || { wait_tpu; \
  run_retry ab_upwind_u_split 3600 python -m seigen_tpu.bench.ab \
    --n 24 --degree 3 --steps 50 --impl upwind_u \
    --out results/r5_ab_upwind_u_split.json; }

touch results/r5_abuw_done
echo "=== r5 abuw batch done $(date -u +%FT%TZ) ===" >> "$LOG"
