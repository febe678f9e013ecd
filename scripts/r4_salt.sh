#!/bin/bash
# Round-4 batch 3: make the salt FWI demo actually recover the salt
# (VERDICT r3, next-round #3; round-3 artifact: model_err_reduction
# 0.924 at degree 1 with LINE acquisition for a 3D target).
#
# What changed vs round 3, and why each should move the needle:
#  - areal 3x3 shot grid + 6x6 areal receiver patch (--areal): line
#    acquisition at y=0.5 has no y-resolution for a 3D ellipsoid;
#  - 4x8 VSP corner strings (--vsp 8): transmission THROUGH the body
#    constrains interior velocity; surface reflections only image the
#    top interface;
#  - degree 2 (P2 is a production degree, better dispersion per DOF);
#  - Adam movement budget lr*iters = 0.03*48 = 1.44 vs the 0.6 salt
#    contrast (round 3: 0.01*36 = 0.36 — could not span the contrast
#    even with perfect sensitivity);
#  - illumination precond (new pseudo-Hessian hook, exercised on
#    hardware; note Adam is per-coordinate scale-invariant, so the
#    decisive levers are the two above).
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_salt.pid
. scripts/r4_lib.sh

# serialize after batch 2 (one chip, one consumer)
if [ -f /tmp/r4_fwigrad.pid ]; then
  P=$(cat /tmp/r4_fwigrad.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 salt batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (salt)" >> "$LOG"; exit 1; }

# rehearsal: same acquisition design at n=12, one band — proves the
# config inverts before committing the 1-2 h full run
[ -f results/r4_salt_small.npz ] || { wait_tpu; \
  run_retry salt_small 5400 python scripts/fwi.py --dim 3 --n 12 \
      --degree 2 --salt --areal --shots 4 --receivers 16 --vsp 6 \
      --T 1.5 --bands 5 --iters 12 --lr 0.03 --grad-path merged \
      --segment 24 --precond illum --out results/r4_salt_small.npz; }

# the production artifact (watchdog-gated): E=24576 P2, 9 areal shots,
# 36+32 receivers, (3,6,full) x 16 Adam iters, checkpointed/resumed
# across transient TPU faults
[ -f results/r4_fwi_salt3d.npz ] || { wait_tpu; \
  run_retry salt_full 14400 python scripts/fwi.py --dim 3 --n 16 \
      --degree 2 --salt --areal --shots 9 --receivers 36 --vsp 8 \
      --T 1.8 --bands 3,6 --iters 16 --lr 0.03 --grad-path merged \
      --segment 32 --precond illum \
      --inv-checkpoint results/r4_salt_ck --inv-resume \
      --out results/r4_fwi_salt3d.npz; }

echo "=== r4 salt batch done $(date -u +%FT%TZ) ===" >> "$LOG"
