#!/bin/bash
# Round-4 batch 4: re-run the 3D RTM hardware artifact with the fixed
# acquisition + illumination compensation (VERDICT r3, next-round #4;
# round-3 artifact: z_imaged 0.582 vs true 0.35 — z_error 0.232, focus
# 0.34, results/rtm3d_merged.json).
#
# Diagnosis (CPU/TPU calibration ladder, /tmp/rtm3d_ci*.json, recorded
# in BENCH_NOTES round 4): three stacked causes, each measured —
#  1. record too short (116 -> 340 steps: z_error 0.398 -> 0.205);
#  2. no illumination compensation: in 3D forward-field ENERGY decays
#     r^-2 (vs r^-1 in 2D), shallow-weighting the raw image
#     (+illum: 0.205 -> 0.188);
#  3. LINE acquisition cannot image a 3D volume (9 areal shots + areal
#     receiver patch: 0.188 -> 0.116, focus 0.82 ~= the 2D bar 0.88).
# Acceptance bar (VERDICT): z_error <= half a wavelength = vmax/f0/2
# = 0.167 at f0=6; calibration passes at 0.116.
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_rtm.pid
. scripts/r4_lib.sh

# serialize after batch 3 (one chip, one consumer)
if [ -f /tmp/r4_salt.pid ]; then
  P=$(cat /tmp/r4_salt.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 rtm batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (rtm)" >> "$LOG"; exit 1; }

# 3D production artifact on the merged gradient engine: the calibration
# config scaled to E=10368 (n=12 P2), 510 steps, 9 areal shots + 36
# areal receivers, source-illumination compensation (default).
[ -f results/r4_rtm3d.json ] || { wait_tpu; \
  run_retry rtm3d 7200 python scripts/rtm.py --dim 3 --n 12 \
      --degree 2 --areal --shots 9 --receivers 36 --f0 6 --T 1.7 \
      --grad-path merged --segment 30 \
      --json results/r4_rtm3d.json --out results/r4_rtm3d.npz; }

# 2D refresh under the new illumination-compensation default (the r3
# artifact rtm2d_lane.json predates --illum-comp)
[ -f results/r4_rtm2d.json ] || { wait_tpu; \
  run_retry rtm2d 3600 python scripts/rtm.py --n 24 --degree 2 \
      --shots 4 --receivers 24 --grad-path lane \
      --json results/r4_rtm2d.json --out results/r4_rtm2d.npz; }

echo "=== r4 rtm batch done $(date -u +%FT%TZ) ===" >> "$LOG"
