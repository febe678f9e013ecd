#!/bin/bash
# Round-4 batch 7: hardware rows for the session's new surfaces.
#   p1_sharded_packed  packed P1 through the SHARDED runner at 1 shard
#                      (fill off) — the packed layout on the DD engine
#   pml_ab             scan-level C-PML cost split (the r4_pml wall rows
#                      are compile-confounded; see scripts/pml_ab.py)
#   einsum2d_base      plain einsum LF4 base at the pml_ab config
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_round4.pid
. scripts/r4_lib.sh

echo "=== r4 round4 batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (round4)" >> "$LOG"; exit 1; }

[ -f results/r4_p1_sharded_packed.json ] || { wait_tpu; \
  run_retry p1_sharded_packed 2400 python -m seigen_tpu.bench.sweep \
    --degrees 1 --sizes 32 --steps 100 --impl fused_sharded_pk \
    --out results/r4_p1_sharded_packed.json; }
[ -f results/r4_pml_ab.json ] || { wait_tpu; \
  run_retry pml_ab 2400 python scripts/pml_ab.py --n 64 --degree 3 \
    --steps 50 --out results/r4_pml_ab.json; }
[ -f results/r4_einsum2d_base.json ] || { wait_tpu; \
  run_retry einsum2d_base 2400 python -m seigen_tpu.bench.sweep \
    --dim 2 --degrees 3 --sizes 64 --steps 20 --impl einsum \
    --out results/r4_einsum2d_base.json; }

echo "=== r4 round4 batch done $(date -u +%FT%TZ) ===" >> "$LOG"
