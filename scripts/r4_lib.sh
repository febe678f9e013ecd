# Shared helpers for the round-4 TPU measurement batches.
# Source me: . scripts/r4_lib.sh   (expects $LOG set by the caller)
#
# Fixes the round-3 chain's two reporting bugs (VERDICT r3, Weak #2):
#  - run() captured $? AFTER the `if` statement, which resets it to 0
#    ("FAILED rc=0"); now the rc is captured on the command line itself.
#  - failed stages were never retried; run_retry() re-polls the TPU and
#    retries once before giving up (transient axon UNAVAILABLE faults).

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
  local name=$1 tmo=$2 rc; shift 2
  echo "--- $name start $(date -u +%T)" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1; rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "--- $name OK $(date -u +%T)" >> "$LOG"
  else
    echo "--- $name FAILED rc=$rc $(date -u +%T)" >> "$LOG"
  fi
  return "$rc"
}

run_retry() {  # run_retry <name> <timeout-s> <cmd...>; one retry after
  local name=$1; shift
  if ! run "$name" "$@"; then
    echo "--- $name: waiting for TPU, then retrying once" >> "$LOG"
    wait_tpu
    run "${name}_retry" "$@"
  fi
}
