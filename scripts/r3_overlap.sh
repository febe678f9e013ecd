#!/bin/bash
# Chained after r3_round_off.sh: 1-shard hardware A/B of the
# interior/boundary overlap split in the slab-sharded merged engine
# (BENCH_NOTES strong-scaling headroom item 2).  At P=1 the ppermute is
# self-to-self so there is nothing to hide; the A/B measures the COST of
# the split (extra kernel launches + a possible XLA copy of the trace
# array when pre- and post-fill values are simultaneously live).  If
# overlap ~= no-overlap at 1 shard, the split is free and stays default;
# if it regresses, flip the ShardedFusedRunner default.
# Artifact-gated; appends to results/r3_batch.log.
set -u
cd /root/repo
LOG=results/r3_batch.log
echo $$ > /tmp/r3_overlap.pid

if [ -f /tmp/r3_round_off.pid ]; then
  P=$(cat /tmp/r3_round_off.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== overlap batch start $(date -u +%FT%TZ) ===" >> "$LOG"

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

wait_tpu || { echo "TPU never came up (overlap)" >> "$LOG"; exit 1; }

# E=83k P3 fused_sharded at 1 shard, overlap ON vs OFF (one process per
# program: fresh-compile isolation through the axon tunnel)
[ -f results/r3_overlap_on.json ] || \
  run overlap_on 3600 python -m seigen_tpu.bench.sweep --degrees 3 \
      --sizes 24 --steps 50 --impl fused_sharded \
      --out results/r3_overlap_on.json
[ -f results/r3_overlap_off.json ] || { wait_tpu; \
  run overlap_off 3600 python -m seigen_tpu.bench.sweep --degrees 3 \
      --sizes 24 --steps 50 --impl fused_sharded --no-overlap \
      --out results/r3_overlap_off.json; }

echo "=== overlap batch done $(date -u +%FT%TZ) ===" >> "$LOG"
