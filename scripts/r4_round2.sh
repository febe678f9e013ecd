#!/bin/bash
# Round-4 batch 5: measurement round-off (VERDICT r3 next-round #6/#7/#9).
#   ab_merged     re-pin the v3 step/k6/vel3 scan rows after the packed
#                 refactor (feeds the roofline redo's measured side)
#   ab_upwind_u   the unstructured-upwind split: panel gathers (g4) vs
#                 coupled kernel (k4) vs full chain (rhs4) — the 6.47e8
#                 vs ~0.9-1.0e9 cost-model reconciliation
#   prec_default  single-pass bf16 A/B on the flagship config (the
#                 roofline says ~47% of the step is compute; x3->x1 MXU
#                 passes attacks exactly that share).  NOT a production
#                 default — documented error-budget caveat.
#   topo          curvilinear/topography hardware row (P3, hill profile)
#   pml           C-PML mixed-cost row: einsum+pml vs plain einsum
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_round2.pid
. scripts/r4_lib.sh

echo "=== r4 round2 batch start $(date -u +%FT%TZ) ===" >> "$LOG"
wait_tpu || { echo "TPU never came up (round2)" >> "$LOG"; exit 1; }

# P1 packed rows under the retuned auto block (1024 at these lane counts;
# measured 2.945e9 vs 2.753e9 at 768) — refreshes r4_per_degree_p1.json
[ -f results/r4_per_degree_p1_b1024.json ] || { wait_tpu; \
  run_retry p1_packed_auto 2400 python -m seigen_tpu.bench.sweep \
    --degrees 1 --sizes 32 --steps 100 --impl merged_pk \
    --out results/r4_per_degree_p1_b1024.json; }
[ -f results/r4_p1_2d_packed_b1024.json ] || { wait_tpu; \
  run_retry p1_2d_packed_auto 2400 python -m seigen_tpu.bench.sweep \
    --dim 2 --degrees 1 --sizes 256 --steps 100 --impl merged_pk \
    --out results/r4_p1_2d_packed_b1024.json; }
[ -f results/r4_ab_merged.json ] || { wait_tpu; \
  run_retry ab_merged 2400 bash -c \
    "python -m seigen_tpu.bench.ab --n 24 --degree 3 --steps 50 --impl merged > results/r4_ab_merged.json"; }
[ -f results/r4_ab_upwind_u.json ] || { wait_tpu; \
  run_retry ab_upwind_u 2400 bash -c \
    "python -m seigen_tpu.bench.ab --n 24 --degree 3 --steps 50 --impl upwind_u > results/r4_ab_upwind_u.json"; }
[ -f results/r4_prec_default.json ] || { wait_tpu; \
  run_retry prec_default 2400 bash -c \
    "SEIGEN_TPU_KERNEL_PRECISION=default python -m seigen_tpu.bench.sweep \
     --degrees 3 --sizes 24 --steps 100 --impl merged \
     --out results/r4_prec_default.json"; }
[ -f results/r4_topo.json ] || { wait_tpu; \
  run_retry topo 2400 python scripts/topography.py --nx 96 --nz 48 \
    --degree 3 --T 0.4 --json results/r4_topo.json; }
[ -f results/r4_pml.json ] || { wait_tpu; \
  run_retry pml 2400 python scripts/explosive_source.py --dim 2 --n 64 \
    --degree 3 --T 0.3 --impl einsum --pml 0.15 \
    --json results/r4_pml.json; }
[ -f results/r4_pml_base.json ] || { wait_tpu; \
  run_retry pml_base 2400 python scripts/explosive_source.py --dim 2 \
    --n 64 --degree 3 --T 0.3 --impl einsum \
    --json results/r4_pml_base.json; }

echo "=== r4 round2 batch done $(date -u +%FT%TZ) ===" >> "$LOG"
