#!/bin/bash
# Round-3 remaining TPU measurements, batched with a TPU-availability
# wait loop (the axon tunnel goes transiently UNAVAILABLE; see
# BENCH_NOTES).  Appends everything to results/r3_batch.log.
# Usage: bash scripts/r3_measure_batch.sh
set -u
cd /root/repo
LOG=results/r3_batch.log
echo "=== batch start $(date -u +%FT%TZ) ===" >> "$LOG"

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

wait_tpu || { echo "TPU never came up" >> "$LOG"; exit 1; }

# 1) per-degree table on the v3 merged engine (matches r2 sizes:
#    P1 E=196608 (n=32), P2/P3 E=82944 (n=24), P4 E=24576 (n=16))
run pdeg_p1 1200 python -m seigen_tpu.bench.sweep --degrees 1 --sizes 32 \
    --steps 100 --impl merged --out results/r3_per_degree_p1.json
run pdeg_p2 1200 python -m seigen_tpu.bench.sweep --degrees 2 --sizes 24 \
    --steps 100 --impl merged --out results/r3_per_degree_p2.json
run pdeg_p3 1200 python -m seigen_tpu.bench.sweep --degrees 3 --sizes 24 \
    --steps 100 --impl merged --out results/r3_per_degree_p3.json
run pdeg_p4 1200 python -m seigen_tpu.bench.sweep --degrees 4 --sizes 16 \
    --steps 100 --impl merged --out results/r3_per_degree_p4.json

# 2) 2D impl comparison at P3 E=131072 (n=256): does v3 flip the 2D verdict?
for impl in lane fused merged; do
  run d2_$impl 1200 python -m seigen_tpu.bench.sweep --dim 2 --degrees 3 \
      --sizes 256 --steps 100 --impl $impl \
      --out results/r3_2d_$impl.json
done

# 3) P1 packing probe (verdict item 9)
wait_tpu
run p1_pack 1800 python -m seigen_tpu.bench.p1_pack_probe 196608 300

# 4) FWI salt demo at E=82944 (verdict item 7 done-bar) — the long one
wait_tpu
run fwi_salt 14400 python scripts/fwi.py --dim 3 --n 24 --degree 1 --salt \
    --iters 12 --shots 4 --optimizer adam --bands 4,8 --T 1.4 \
    --batch host --out results/fwi_salt3d.npz

echo "=== batch done $(date -u +%FT%TZ) ===" >> "$LOG"
