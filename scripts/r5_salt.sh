#!/bin/bash
# Round-5 batch 3: FLAGSHIP-SCALE salt inversion (VERDICT r4 next-round
# #5).  Same acquisition design as the r4 production artifact (areal 3x3
# shots + 6x6 receiver patch + 4x8 VSP corner strings, illumination
# precond, frequency continuation, checkpointed) but on the flagship
# mesh: E=82944 P2 (n=24) — 3.4x the r4 inversion.  Bar:
# model_err_reduction <= 0.5 at this scale, wall-clock reported.
# Movement budget lr*total_iters = 0.035*36 = 1.26 vs the 0.6 contrast.
set -u
cd /root/repo
LOG=results/r5_batch.log
echo $$ > /tmp/r5_salt.pid
. scripts/r4_lib.sh

for dep in r5_perf r5_pk; do
  if [ -f /tmp/$dep.pid ]; then
    P=$(cat /tmp/$dep.pid)
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
  fi
done
echo "=== r5 salt batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (r5_salt)" >> "$LOG"; exit 1; }

# producer-side panel emission A/B first (short; priced by the gT4
# attribution this round — implement-vs-negative rides this number).
# Lives here so it runs after perf/pk but BEFORE the multi-hour salt
# inversion without racing it for the chip.
[ -s results/r5_ab_upwind_u_emit.json ] || { wait_tpu; \
  run_retry ab_upwind_u_emit 3600 python -m seigen_tpu.bench.ab \
    --n 24 --degree 3 --steps 50 --impl upwind_u \
    --out results/r5_ab_upwind_u_emit.json; }

[ -s results/r5_fwi_salt3d_full.npz ] || { wait_tpu; \
  run_retry salt_flagship 21600 python scripts/fwi.py --dim 3 --n 24 \
      --degree 2 --salt --areal --shots 9 --receivers 36 --vsp 8 \
      --T 1.8 --bands 3,6 --iters 12 --lr 0.035 --grad-path merged \
      --segment 48 --precond illum \
      --inv-checkpoint results/r5_salt_ck --inv-resume \
      --out results/r5_fwi_salt3d_full.npz; }

touch results/r5_salt_done
echo "=== r5 salt batch done $(date -u +%FT%TZ) ===" >> "$LOG"
