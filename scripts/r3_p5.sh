#!/bin/bash
# Chained after r3_overlap.sh: P5 high-order rung on the real chip.
# P5 tets have n_p=56 (exactly 7x8 lanes, contraction depth K=56 vs
# P3's 20) — the direct probe of BENCH_NOTES' small-K MXU-ceiling story.
# Artifact-gated; appends to results/r3_batch.log.
set -u
cd /root/repo
LOG=results/r3_batch.log
echo $$ > /tmp/r3_p5.pid

if [ -f /tmp/r3_overlap.pid ]; then
  P=$(cat /tmp/r3_overlap.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== p5 batch start $(date -u +%FT%TZ) ===" >> "$LOG"

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

wait_tpu || { echo "TPU never came up (p5)" >> "$LOG"; exit 1; }

# P5 on the flagship merged engine (E=24576 tets at n=16, 12.4M DOF)
[ -f results/r3_p5_merged.json ] || \
  run p5_merged 3600 python -m seigen_tpu.bench.sweep --degrees 5 \
      --sizes 16 --steps 50 --impl merged --out results/r3_p5_merged.json

# P5 on the v1 lane engine for the same case (engine A/B at high order)
[ -f results/r3_p5_lane.json ] || { wait_tpu; \
  run p5_lane 3600 python -m seigen_tpu.bench.sweep --degrees 5 \
      --sizes 16 --steps 50 --impl lane --out results/r3_p5_lane.json; }

echo "=== p5 batch done $(date -u +%FT%TZ) ===" >> "$LOG"
