#!/usr/bin/env python
"""Kernel matmul-precision accuracy study on TPU (results/precision_study.json).

Runs a long 2D P3 eigenmode through the fused lane pipeline under each
in-kernel precision scheme and records the final L2 error vs the analytic
solution.  Gate for making 'x3' (manual bf16_3x) the default: its error must
match 'highest' (full f32) at the spatial-error floor.

Each scheme runs in a subprocess because SEIGEN_TPU_KERNEL_PRECISION is
read at import time.
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from seigen_tpu.mesh import rect_mesh, build_discrete
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.structured_exchange import detect_structured
from seigen_tpu.solver import PlaneWave, State, cfl_dt, interpolate, l2_error
from seigen_tpu.solver.lane_fused import FusedLaneRunner

N, degree = int(sys.argv[1]), int(sys.argv[2])
mat = Material(rho=1.0, vp=2.0, vs=1.0)
dm = build_discrete(rect_mesh(N, N, periodic=(0, 1)), degree)
p = build_params(dm, mat, dtype=jnp.float32)
ex = detect_structured(dm)
pw = PlaneWave(mat=mat, k=2 * np.pi * np.array([1.0, 1.0]), mode="S")
T = 2.0 * pw.period
dt = cfl_dt(dm.h.min(), 2.0, degree, 0.4)
n_steps = int(np.ceil(T / dt))
dt = T / n_steps
st = State(
    u=jnp.asarray(interpolate(dm, pw.u, 0.0), jnp.float32),
    s=jnp.asarray(interpolate(dm, pw.sigma, 0.5 * dt), jnp.float32),
)
r = FusedLaneRunner(p, ex, dt, order=4)
out, _ = r.run(st, n_steps)
err = l2_error(dm, np.asarray(out.u), pw.u, n_steps * dt)
print(json.dumps({"err": float(err), "steps": n_steps}))
"""


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out = {"N": N, "degree": degree, "schemes": {}}
    for scheme in ("highest", "x3", "default"):
        env = dict(os.environ)
        env["SEIGEN_TPU_KERNEL_PRECISION"] = scheme
        res = subprocess.run(
            [sys.executable, "-c", CHILD, str(N), str(degree)],
            capture_output=True, text=True, env=env, timeout=1200,
        )
        line = res.stdout.strip().splitlines()[-1] if res.stdout else ""
        try:
            out["schemes"][scheme] = json.loads(line)
        except Exception:
            out["schemes"][scheme] = {"error": res.stderr[-500:]}
        print(scheme, out["schemes"][scheme])
    os.makedirs("results", exist_ok=True)
    with open("results/precision_study.json", "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
