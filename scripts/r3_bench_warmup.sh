#!/bin/bash
# Chained after r3_merged_salt.sh: run the driver's exact bench.py
# invocation once on the real chip so its XLA programs land in
# .jax_cache — the driver's round-end bench run then skips the ~14-min
# fresh-compile (BENCH_NOTES round-3 compile-service caveat) and cannot
# time out.  Also refreshes the recorded headline.
set -u
cd /root/repo
LOG=results/r3_batch.log

if [ -f /tmp/r3_merged_salt.pid ]; then
  P=$(cat /tmp/r3_merged_salt.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== bench warmup start $(date -u +%FT%TZ) ===" >> "$LOG"

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

wait_tpu || { echo "TPU never came up (bench warmup)" >> "$LOG"; exit 1; }

echo "--- bench_warmup start $(date -u +%T)" >> "$LOG"
if timeout 3600 python bench.py >> "$LOG" 2>&1; then
  echo "--- bench_warmup OK $(date -u +%T)" >> "$LOG"
else
  echo "--- bench_warmup FAILED rc=$? $(date -u +%T)" >> "$LOG"
fi
echo "=== bench warmup done $(date -u +%FT%TZ) ===" >> "$LOG"
