#!/bin/bash
# Round-5 batch 4: C-PML on the merged engine — hardware rows (VERDICT
# r4 next-round #6).  The r4 split showed PML physics costs +5% but the
# einsum carrier is 9x the merged engine; solver/lane_cpml.py puts the
# split operators on the stock merged kernels (direction-masked geo).
#   pml_ab_2d   same config as r4_pml_ab (2D n=64 P3, 3 sides) with the
#               new lane row -> direct before/after
#   pml_ab_3d   the verdict's asked-for row: 3D bounded domain, PML on
#               5 faces + free surface, scan-level lane vs einsum vs
#               sponge-merged baseline
set -u
cd /root/repo
LOG=results/r5_batch.log
echo $$ > /tmp/r5_cpml.pid
. scripts/r4_lib.sh

for dep in r5_perf r5_pk; do
  if [ -f /tmp/$dep.pid ]; then
    P=$(cat /tmp/$dep.pid)
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
  fi
done
echo "=== r5 cpml batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (r5_cpml)" >> "$LOG"; exit 1; }

[ -s results/r5_pml_ab_2d.json ] || { wait_tpu; \
  run_retry pml_ab_2d 2400 python scripts/pml_ab.py --n 64 --degree 3 \
    --steps 50 --out results/r5_pml_ab_2d.json; }
[ -s results/r5_pml_ab_3d.json ] || { wait_tpu; \
  run_retry pml_ab_3d 3600 python scripts/pml_ab.py --dim 3 --n 16 \
    --degree 3 --steps 50 --out results/r5_pml_ab_3d.json; }

touch results/r5_cpml_done
echo "=== r5 cpml batch done $(date -u +%FT%TZ) ===" >> "$LOG"
