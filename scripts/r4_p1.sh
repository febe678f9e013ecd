#!/bin/bash
# Round-4 batch 4: P1 packed-layout production integration (VERDICT r3,
# next-round #5).  The two-elements-per-lane merged engine (impl
# merged_pk) vs the unpacked merged engine at the r3 per-degree P1 config
# (E=196608, n=32, 100 steps) — the op-level probe paid 1.62x
# (bench/p1_pack_probe.py); done-bar is P1 >= 2.8e9 or a measured
# negative result.  Also a 2D P1 packed row (E=131072, n=256) since 2D
# production runs are P1-heavy.
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_p1.pid
. scripts/r4_lib.sh

echo "=== r4 p1-packed batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (p1)" >> "$LOG"; exit 1; }

S="python -m seigen_tpu.bench.sweep --degrees 1 --sizes 32 --steps 100"
[ -f results/r4_per_degree_p1.json ] || { wait_tpu; \
  run_retry p1_packed 3600 $S --impl merged_pk \
      --out results/r4_per_degree_p1.json; }
[ -f results/r4_p1_unpacked.json ] || { wait_tpu; \
  run_retry p1_unpacked 3600 $S --impl merged \
      --out results/r4_p1_unpacked.json; }
S2="python -m seigen_tpu.bench.sweep --dim 2 --degrees 1 --sizes 256 --steps 100"
[ -f results/r4_p1_2d_packed.json ] || { wait_tpu; \
  run_retry p1_2d_packed 3600 $S2 --impl merged_pk \
      --out results/r4_p1_2d_packed.json; }
[ -f results/r4_p1_2d_unpacked.json ] || { wait_tpu; \
  run_retry p1_2d_unpacked 3600 $S2 --impl merged \
      --out results/r4_p1_2d_unpacked.json; }

echo "=== r4 p1-packed batch done $(date -u +%FT%TZ) ===" >> "$LOG"
