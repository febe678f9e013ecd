#!/bin/bash
# Consolidated resume of the round-3 TPU measurement chain (the original
# chained scripts died with their session while the TPU was down for
# hours).  Artifact-gated: anything already measured is skipped, so this
# is safe to relaunch any number of times.  Priority order puts the
# driver-critical bench.py cache-warm FIRST in case the TPU window is
# short.  Appends to results/r3_batch.log.
# Usage: bash scripts/r3_resume_batch.sh
set -u
cd /root/repo
LOG=results/r3_batch.log
echo $$ > /tmp/r3_resume.pid  # chained scripts gate on this pid
echo "=== resume batch start $(date -u +%FT%TZ) ===" >> "$LOG"

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

wait_tpu || { echo "TPU never came up (resume batch)" >> "$LOG"; exit 1; }

# 1) driver-critical: bench.py on the real chip -> XLA programs land in
#    .jax_cache so the driver's round-end run cannot hit the ~14-min
#    fresh-compile timeout
grep -q '"metric"' "$LOG" || run bench_warmup 3600 python bench.py

# 2) per-degree v3 table, P4 rung (P1-P3 already recorded)
[ -f results/r3_per_degree_p4.json ] || { wait_tpu; \
  run pdeg_p4 3600 python -m seigen_tpu.bench.sweep --degrees 4 --sizes 16 \
      --steps 100 --impl merged --out results/r3_per_degree_p4.json; }

# 3) 2D impl A/B at P3 E=131072: does v3 flip the 2D fused regression?
for impl in lane fused merged; do
  [ -f results/r3_2d_$impl.json ] || { wait_tpu; \
    run d2_$impl 3600 python -m seigen_tpu.bench.sweep --dim 2 --degrees 3 \
        --sizes 256 --steps 100 --impl $impl \
        --out results/r3_2d_$impl.json; }
done

# 4) P1 packing probe (round-2 verdict diagnostic item 9)
grep -q "^packed:" "$LOG" || { wait_tpu; \
  run p1_pack 3600 python -m seigen_tpu.bench.p1_pack_probe 196608 300; }

# 5) gradient-path A/B + hardware gradient agreement (E=83k P1)
grep -q "speedup" "$LOG" || { wait_tpu; \
  run fwi_grad_ab 7200 python -m seigen_tpu.bench.fwi_grad 24 1 200 2; }

# 6) salt FWI demos (verdict item 7 done-bar) on the fast gradient
#    paths, with inversion-state checkpointing so TPU faults resume
#    bitwise instead of restarting
run_salt() {  # run_salt <gradpath> <out>
  local gp=$1 out=$2
  [ -f "$out" ] && return 0
  local ck="results/salt_ck_${gp}.npz"
  for try in 1 2 3 4; do
    wait_tpu || return 1
    local resume=""
    [ -f "$ck" ] && resume="--inv-resume"
    if run "salt_$gp(try$try)" 14400 python scripts/fwi.py --dim 3 \
        --n 24 --degree 1 --salt --iters 12 --shots 4 --optimizer adam \
        --bands 4,8 --T 1.4 --segment 24 --grad-path "$gp" \
        --inv-checkpoint "$ck" $resume --out "$out"; then
      return 0
    fi
  done
  return 1
}

run_salt lane results/fwi_salt3d_lane.npz
run_salt merged results/fwi_salt3d_merged.npz

echo "=== resume batch done $(date -u +%FT%TZ) ===" >> "$LOG"
