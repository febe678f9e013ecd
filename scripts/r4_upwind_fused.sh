#!/bin/bash
# r4 late: unstructured upwind fused-RK4-epilogue measurement
# (artifact-gated, safe to relaunch)
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_upwind_fused.pid
. scripts/r4_lib.sh
echo "=== r4 upwind_fused batch start $(date -u +%FT%TZ) ===" >> "$LOG"
[ -f results/r4_ab_upwind_u_fused.json ] || { wait_tpu; \
  run_retry ab_upwind_u_fused 2400 bash -c \
    "python -m seigen_tpu.bench.ab --n 24 --degree 3 --steps 50 --impl upwind_u > results/r4_ab_upwind_u_fused.json"; }
[ -f results/r4_upwind_lane_u_fused.json ] || { wait_tpu; \
  run_retry upwind_lane_u_fused 3600 python -m seigen_tpu.bench.sweep \
    --degrees 3 --sizes 24 --steps 50 --impl upwind_lane_u --scramble \
    --out results/r4_upwind_lane_u_fused.json; }
echo "=== r4 upwind_fused batch done $(date -u +%FT%TZ) ===" >> "$LOG"
# stage 2: kernel-fused dense injection + in-register final damp
[ -f results/r4_ab_upwind_u_inj.json ] || { wait_tpu; \
  run_retry ab_upwind_u_inj 2400 bash -c \
    "python -m seigen_tpu.bench.ab --n 24 --degree 3 --steps 50 --impl upwind_u > results/r4_ab_upwind_u_inj.json"; }
[ -f results/r4_upwind_lane_u_inj.json ] || { wait_tpu; \
  run_retry upwind_lane_u_inj 3600 python -m seigen_tpu.bench.sweep \
    --degrees 3 --sizes 24 --steps 50 --impl upwind_lane_u --scramble \
    --out results/r4_upwind_lane_u_inj.json; }
echo "=== r4 upwind_inj batch done $(date -u +%FT%TZ) ===" >> "$LOG"
