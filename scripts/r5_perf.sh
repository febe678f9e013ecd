#!/bin/bash
# Round-5 batch 1: per-degree re-pin + P2/P4 scan splits + the flagship
# gradient A/B (VERDICT r4 next-round #3 and #4).
#   per_degree_p{1..4}  same-session per-degree table on the CURRENT
#                       merged engine (P1 packed at the retuned block;
#                       P2/P4 were never remeasured after the packed
#                       refactor)
#   ab_p2 / ab_p4       scan-level step/k6/vel3 splits at the per-degree
#                       configs (the r4 itemization covered P1/P3 only)
#   fwi_grad_p3_full    gradient rate at the FLAGSHIP config E=83k P3 —
#                       the config the forward headline quotes
# Every stage artifact-gated on non-empty ([ -s ]) terminal files; safe
# to relaunch.  Writes results/r5_perf_done as the watchdog marker.
set -u
cd /root/repo
LOG=results/r5_batch.log
echo $$ > /tmp/r5_perf.pid
. scripts/r4_lib.sh

echo "=== r5 perf batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (r5_perf)" >> "$LOG"; exit 1; }

[ -s results/r5_per_degree_p1.json ] || { wait_tpu; \
  run_retry per_degree_p1 2400 python -m seigen_tpu.bench.sweep \
    --degrees 1 --sizes 32 --steps 100 --impl merged_pk --block 1024 \
    --out results/r5_per_degree_p1.json; }
[ -s results/r5_per_degree_p2.json ] || { wait_tpu; \
  run_retry per_degree_p2 2400 python -m seigen_tpu.bench.sweep \
    --degrees 2 --sizes 24 --steps 100 --impl merged \
    --out results/r5_per_degree_p2.json; }
[ -s results/r5_per_degree_p3.json ] || { wait_tpu; \
  run_retry per_degree_p3 2400 python -m seigen_tpu.bench.sweep \
    --degrees 3 --sizes 24 --steps 100 --impl merged \
    --out results/r5_per_degree_p3.json; }
[ -s results/r5_per_degree_p4.json ] || { wait_tpu; \
  run_retry per_degree_p4 2400 python -m seigen_tpu.bench.sweep \
    --degrees 4 --sizes 16 --steps 100 --impl merged \
    --out results/r5_per_degree_p4.json; }
[ -s results/r5_ab_p2.json ] || { wait_tpu; \
  run_retry ab_p2 2400 python -m seigen_tpu.bench.ab \
    --n 24 --degree 2 --steps 50 --impl merged \
    --out results/r5_ab_p2.json; }
[ -s results/r5_ab_p4.json ] || { wait_tpu; \
  run_retry ab_p4 2400 python -m seigen_tpu.bench.ab \
    --n 16 --degree 4 --steps 50 --impl merged \
    --out results/r5_ab_p4.json; }
[ -s results/r5_fwi_grad_p3_full.json ] || { wait_tpu; \
  run_retry fwi_grad_p3_full 7200 python -m seigen_tpu.bench.fwi_grad \
    24 3 100 2 --shots 2 --segment 20 --paths lane,merged \
    --out results/r5_fwi_grad_p3_full.json; }

touch results/r5_perf_done
echo "=== r5 perf batch done $(date -u +%FT%TZ) ===" >> "$LOG"
