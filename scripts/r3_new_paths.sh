#!/bin/bash
# Chained after r3_resume_batch.sh: TPU rows for the paths added late in
# round 3 — unstructured upwind/RK4 (solver/lane_upwind_u.py), VTI
# through the merged and lane_u engines (in-kernel Voigt-C Hooke), and
# the structured upwind row refresh after the visco source-injection
# ordering fix.  Artifact-gated; appends to results/r3_batch.log.
set -u
cd /root/repo
LOG=results/r3_batch.log
echo $$ > /tmp/r3_new_paths.pid  # chained scripts gate on this pid

if [ -f /tmp/r3_resume.pid ]; then
  P=$(cat /tmp/r3_resume.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== new-paths batch start $(date -u +%FT%TZ) ===" >> "$LOG"

wait_tpu() {
  for i in $(seq 1 500); do
    if timeout 180 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((128, 128)); (x @ x).block_until_ready()
print('tpu-up')" >> "$LOG" 2>&1; then
      return 0
    fi
    echo "tpu poll $i: down $(date -u +%T)" >> "$LOG"
    sleep 60
  done
  return 1
}

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "--- $name start $(date -u +%T)" >> "$LOG"
  if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
    echo "--- $name OK $(date -u +%T)" >> "$LOG"
    return 0
  fi
  echo "--- $name FAILED rc=$? $(date -u +%T)" >> "$LOG"
  return 1
}

wait_tpu || { echo "TPU never came up (new-paths)" >> "$LOG"; exit 1; }

# 1) unstructured upwind/RK4 at E=83k P3 (vs the structured 2.09e9 row)
[ -f results/r3_upwind_lane_u.json ] || \
  run upwind_lane_u 3600 python -m seigen_tpu.bench.sweep --degrees 3 \
      --sizes 24 --steps 50 --impl upwind_lane_u --scramble \
      --out results/r3_upwind_lane_u.json

# 2) structured upwind row refresh (source-injection ordering fix)
[ -f results/r3_upwind_lane_refresh.json ] || { wait_tpu; \
  run upwind_lane_r 3600 python -m seigen_tpu.bench.sweep --degrees 3 \
      --sizes 24 --steps 50 --impl upwind_lane \
      --out results/r3_upwind_lane_refresh.json; }

# 3) VTI rows: merged (structured) + lane_u (unstructured) vs their
#    isotropic rates (round-2 verdict item 3 done-bar: within 1.5x)
[ -f results/r3_vti_merged.json ] || { wait_tpu; \
  run vti_merged 3600 python -m seigen_tpu.bench.sweep --degrees 3 \
      --sizes 24 --steps 50 --impl merged --vti \
      --out results/r3_vti_merged.json; }
[ -f results/r3_vti_lane_u.json ] || { wait_tpu; \
  run vti_lane_u 3600 python -m seigen_tpu.bench.sweep --degrees 3 \
      --sizes 24 --steps 50 --impl lane_u --vti --scramble \
      --out results/r3_vti_lane_u.json; }
[ -f results/r3_iso_lane_u_refresh.json ] || { wait_tpu; \
  run iso_lane_u 3600 python -m seigen_tpu.bench.sweep --degrees 3 \
      --sizes 24 --steps 50 --impl lane_u --scramble \
      --out results/r3_iso_lane_u_refresh.json; }

echo "=== new-paths batch done $(date -u +%FT%TZ) ===" >> "$LOG"
