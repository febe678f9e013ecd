#!/bin/bash
# Retries for the r3_measure_batch.sh items that hit the 1200 s timeout
# (fresh XLA compiles through the axon tunnel run ~14 min — see
# BENCH_NOTES round 3 — so a first-compile run cannot fit in 1200 s and
# dies before the persistent cache is written).  Waits for the main
# batch (PID file /tmp/r3_batch.pid) to finish, then re-runs anything
# whose output artifact is missing, with 3600 s budgets.
# Usage: bash scripts/r3_retry_batch.sh
set -u
cd /root/repo
LOG=results/r3_batch.log

# wait for the main batch to release the TPU
if [ -f /tmp/r3_batch.pid ]; then
  BPID=$(cat /tmp/r3_batch.pid)
  while kill -0 "$BPID" 2>/dev/null; do sleep 60; done
fi
echo "=== retry batch start $(date -u +%FT%TZ) ===" >> "$LOG"

wait_tpu() {
  for i in $(seq 1 120); do
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

wait_tpu || { echo "TPU never came up (retry batch)" >> "$LOG"; exit 1; }

[ -f results/r3_per_degree_p4.json ] || \
  run pdeg_p4_r 3600 python -m seigen_tpu.bench.sweep --degrees 4 --sizes 16 \
      --steps 100 --impl merged --out results/r3_per_degree_p4.json

for impl in lane fused merged; do
  [ -f results/r3_2d_$impl.json ] || \
    run d2_${impl}_r 3600 python -m seigen_tpu.bench.sweep --dim 2 --degrees 3 \
        --sizes 256 --steps 100 --impl $impl \
        --out results/r3_2d_$impl.json
done

grep -q "^packed:" "$LOG" || { wait_tpu; \
  run p1_pack_r 3600 python -m seigen_tpu.bench.p1_pack_probe 196608 300; }

[ -f results/fwi_salt3d.npz ] || { wait_tpu; \
  run fwi_salt_r 21600 python scripts/fwi.py --dim 3 --n 24 --degree 1 --salt \
      --iters 12 --shots 4 --optimizer adam --bands 4,8 --T 1.4 \
      --batch host --out results/fwi_salt3d.npz; }

echo "=== retry batch done $(date -u +%FT%TZ) ===" >> "$LOG"
