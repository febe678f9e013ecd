#!/bin/bash
# Chained after r3_fwigrad_batch.sh: if the fwi_grad A/B validated the
# merged gradient engine on hardware, run the salt FWI demo on it too
# (fastest production inversion path).
set -u
cd /root/repo
LOG=results/r3_batch.log

if [ -f /tmp/r3_fwigrad.pid ]; then
  P=$(cat /tmp/r3_fwigrad.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== merged-salt batch start $(date -u +%FT%TZ) ===" >> "$LOG"

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

run() {
  local name=$1 tmo=$2; shift 2
  echo "--- $name start $(date -u +%T)" >> "$LOG"
  if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
    echo "--- $name OK $(date -u +%T)" >> "$LOG"
  else
    echo "--- $name FAILED rc=$? $(date -u +%T)" >> "$LOG"
  fi
}

wait_tpu || { echo "TPU never came up (merged-salt)" >> "$LOG"; exit 1; }

# merged-engine gradient A/B row (roll/lane rows already measured by the
# fwigrad batch; rerun with all three for the merged timing + agreement)
grep -q "speedup_merged_vs_lane" "$LOG" || \
  run fwi_grad_merged 7200 python -m seigen_tpu.bench.fwi_grad 24 1 200 2

wait_tpu
[ -f results/fwi_salt3d_merged.npz ] || \
  run fwi_salt_merged 14400 python scripts/fwi.py --dim 3 --n 24 \
      --degree 1 --salt --iters 12 --shots 4 --optimizer adam --bands 4,8 \
      --T 1.4 --segment 24 --grad-path merged \
      --out results/fwi_salt3d_merged.npz

echo "=== merged-salt batch done $(date -u +%FT%TZ) ===" >> "$LOG"
