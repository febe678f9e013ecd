#!/bin/bash
# Chained after r3_bench_warmup.sh: if the earlier batches' salt FWI
# demos were killed by transient TPU UNAVAILABLE faults, re-run them
# with inversion-state checkpointing (--inv-checkpoint/--inv-resume,
# solver/fwi.py) in a retry loop — each retry continues bitwise from
# the last completed iteration instead of restarting.
set -u
cd /root/repo
LOG=results/r3_batch.log

if [ -f /tmp/r3_warmup.pid ]; then
  P=$(cat /tmp/r3_warmup.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== salt-resilient batch start $(date -u +%FT%TZ) ===" >> "$LOG"

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

run_salt() {  # run_salt <gradpath> <out>
  local gp=$1 out=$2
  [ -f "$out" ] && return 0
  local ck="results/salt_ck_${gp}.npz"
  for try in 1 2 3 4; do
    wait_tpu || return 1
    echo "--- salt_$gp try $try start $(date -u +%T)" >> "$LOG"
    local resume=""
    [ -f "$ck" ] && resume="--inv-resume"
    if timeout 14400 python scripts/fwi.py --dim 3 --n 24 --degree 1 \
        --salt --iters 12 --shots 4 --optimizer adam --bands 4,8 \
        --T 1.4 --segment 24 --grad-path "$gp" \
        --inv-checkpoint "$ck" $resume --out "$out" >> "$LOG" 2>&1; then
      echo "--- salt_$gp OK $(date -u +%T)" >> "$LOG"
      return 0
    fi
    echo "--- salt_$gp try $try FAILED rc=$? $(date -u +%T)" >> "$LOG"
  done
  return 1
}

run_salt lane results/fwi_salt3d_lane.npz
run_salt merged results/fwi_salt3d_merged.npz

echo "=== salt-resilient batch done $(date -u +%FT%TZ) ===" >> "$LOG"
