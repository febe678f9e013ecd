#!/usr/bin/env bash
# Benchmark sweep launcher (reference parity: launchers/*.pbs driving
# *_bench.py sweeps).  Produces one JSON per configuration under results/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p results

for degree in 1 2 3 4; do
  python -m seigen_tpu.bench.sweep \
    --dim 3 --degrees "$degree" --sizes "${SIZES:-8,16}" \
    --steps "${STEPS:-20}" --out "results/sweep_p${degree}.json"
done
python - <<'PYEOF'
import glob, json
rows = [r for f in glob.glob("results/sweep_p*.json") for r in json.load(open(f))]
rows.sort(key=lambda r: (r["degree"], r["n"]))
print(f"{'deg':>3} {'n':>4} {'elements':>9} {'DOF/s':>12}")
for r in rows:
    print(f"{r['degree']:>3} {r['n']:>4} {r['elements']:>9} "
          f"{r['dof_updates_per_sec']:>12.3e}")
PYEOF
