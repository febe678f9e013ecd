#!/bin/bash
# Round-3 follow-on: TPU-validate the lane-path FWI gradient
# (bench.fwi_grad A/B vs the roll path: timing + f32 gradient agreement),
# then run the 3D salt FWI demo on the lane gradient path (an order of
# magnitude less device time per iteration than the roll path that kept
# dying to transient TPU UNAVAILABLE).  Waits for the retry batch
# (/tmp/r3_retry.pid) to release the TPU first.
# Usage: bash scripts/r3_fwigrad_batch.sh
set -u
cd /root/repo
LOG=results/r3_batch.log

for f in /tmp/r3_batch.pid /tmp/r3_retry.pid; do
  if [ -f "$f" ]; then
    P=$(cat "$f")
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
  fi
done
echo "=== fwigrad batch start $(date -u +%FT%TZ) ===" >> "$LOG"

wait_tpu() {
  for i in $(seq 1 240); do
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
  else
    echo "--- $name FAILED rc=$? $(date -u +%T)" >> "$LOG"
  fi
}

wait_tpu || { echo "TPU never came up (fwigrad batch)" >> "$LOG"; exit 1; }

# 1) gradient-path A/B + hardware gradient validation (E=83k P1, 200 steps)
run fwi_grad_ab 7200 python -m seigen_tpu.bench.fwi_grad 24 1 200 2

# 2) salt FWI demo on the lane gradient path (verdict item 7 done-bar)
wait_tpu
[ -f results/fwi_salt3d_lane.npz ] || \
  run fwi_salt_lane 14400 python scripts/fwi.py --dim 3 --n 24 --degree 1 \
      --salt --iters 12 --shots 4 --optimizer adam --bands 4,8 --T 1.4 \
      --segment 24 --grad-path lane --out results/fwi_salt3d_lane.npz

echo "=== fwigrad batch done $(date -u +%FT%TZ) ===" >> "$LOG"
