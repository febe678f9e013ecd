#!/bin/bash
# Chained after r3_new_paths.sh: round-3 closing artifacts on the real
# chip — the 3D RTM demo at production size on the merged (v3-rate)
# gradient path.  Artifact-gated; appends to results/r3_batch.log.
set -u
cd /root/repo
LOG=results/r3_batch.log
echo $$ > /tmp/r3_round_off.pid

if [ -f /tmp/r3_new_paths.pid ]; then
  P=$(cat /tmp/r3_new_paths.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== round-off batch start $(date -u +%FT%TZ) ===" >> "$LOG"

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

wait_tpu || { echo "TPU never came up (round-off)" >> "$LOG"; exit 1; }

# 3D RTM at E=83k on the merged gradient engine (one vg evaluation +
# imaging post-processing; wall dominated by compile)
[ -f results/rtm3d_merged.json ] || \
  run rtm3d_merged 7200 python scripts/rtm.py --dim 3 --n 24 \
      --degree 1 --shots 4 --receivers 24 --grad-path merged \
      --segment 24 --out results/rtm3d_merged.npz \
      --json results/rtm3d_merged.json

# 2D RTM reference artifact on hardware (lane path, fast)
[ -f results/rtm2d_lane.json ] || { wait_tpu; \
  run rtm2d_lane 3600 python scripts/rtm.py --n 32 --degree 2 \
      --shots 6 --receivers 24 --grad-path lane \
      --out results/rtm2d_lane.npz --json results/rtm2d_lane.json; }

echo "=== round-off batch done $(date -u +%FT%TZ) ===" >> "$LOG"
