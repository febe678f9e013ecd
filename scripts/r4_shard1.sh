#!/bin/bash
# Round-4 batch 1: the 1-shard handicap split (VERDICT r3, next-round #1).
# E=83k P3 src+damp (the flagship config) through the fused_sharded
# runner with each halo-fill ingredient toggled, plus a fresh single-chip
# merged reference in the same session family:
#   prod      fill_mode=off   (h0=0 layout, no fill)  <- new production P==1
#   skip      halo layout kept, fill elided            -> prices h0 padding
#   local     fill without the collective              -> + slice/set cost
#   ppermute  the multi-chip code path (self-to-self)  -> + collective cost
#   merged    single-chip reference                    -> shard_map overhead
# Gap attribution: merged-prod = shard_map wrapper; prod-skip = h0 layout;
# skip-local = fill data movement; local-ppermute = the ppermute itself.
# One process per program (fresh-compile isolation through the tunnel).
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_shard1.pid
. scripts/r4_lib.sh

echo "=== r4 shard1 batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (shard1)" >> "$LOG"; exit 1; }

S="python -m seigen_tpu.bench.sweep --degrees 3 --sizes 24 --steps 50"
[ -f results/r4_shard1_prod.json ] || { wait_tpu; \
  run_retry shard1_prod 3600 $S --impl fused_sharded \
      --out results/r4_shard1_prod.json; }
[ -f results/r4_shard1_skip.json ] || { wait_tpu; \
  run_retry shard1_skip 3600 $S --impl fused_sharded --fill-mode skip \
      --out results/r4_shard1_skip.json; }
[ -f results/r4_shard1_local.json ] || { wait_tpu; \
  run_retry shard1_local 3600 $S --impl fused_sharded --fill-mode local \
      --out results/r4_shard1_local.json; }
[ -f results/r4_shard1_ppermute.json ] || { wait_tpu; \
  run_retry shard1_ppermute 3600 $S --impl fused_sharded \
      --fill-mode ppermute --out results/r4_shard1_ppermute.json; }
[ -f results/r4_merged_ref.json ] || { wait_tpu; \
  run_retry merged_ref 3600 $S --impl merged \
      --out results/r4_merged_ref.json; }

echo "=== r4 shard1 batch done $(date -u +%FT%TZ) ===" >> "$LOG"
