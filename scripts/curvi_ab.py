#!/usr/bin/env python
"""Scan-level curvilinear cost A/B (VERDICT r4 next-round #9).

Times the isoparametric (per-element operator matrix) LF4 step against
the affine einsum twin and the merged lane engine on the SAME mesh, and
derives the batched-GEMM traffic/FLOP bound of the curvilinear
formulation so its achieved fraction is a measured number, not a guess.

Design context (the 'lane-engine curvilinear variant' disposition): the
lane-kernel model multiplies SHARED reference tables against per-lane
state — its speed comes from one (npp, npp) operand feeding 128 lanes.
Curvilinear operators are PER-ELEMENT matrices (De, Lf vary per lane),
so there is no shared operand to put on the MXU: a Pallas port would
execute 128 heterogeneous (n_p, n_p) matmuls per tile, which is exactly
what XLA's batched GEMM already does with E as the batch axis.  The
exact formulation is therefore already in its natural TPU shape; the
known faster shapes (collocated geometric factors / weight-adjusted
M_e^-1) CHANGE the numerics (variational crime), breaking the
einsum-twin exactness rule.  This probe prices the honest formulation.

Output: ONE JSON line.
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _timed_scan(fn, carry, n, reps=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    @functools.partial(jax.jit, static_argnames=("n",))
    def go(carry, n):
        def body(c, k):
            return fn(c, k), None

        out, _ = jax.lax.scan(body, carry, jnp.arange(n))
        return out

    out = go(carry, n)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = go(carry, n)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--nz", type=int, default=48)
    ap.add_argument("--degree", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--amp", type=float, default=0.06)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from seigen_tpu.mesh import build_discrete, rect_mesh
    from seigen_tpu.ops import Material, build_params
    from seigen_tpu.ops.curvilinear import (
        build_curvi, curved_coords, make_curvi_ops)
    from seigen_tpu.ops.structured_exchange import detect_structured
    from seigen_tpu.solver import State, absorbing_bc_fn, cfl_dt
    from seigen_tpu.solver.lane_merged import MergedLaneRunner
    from seigen_tpu.solver.timestep import make_step

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from topography import topo_map

    n, degree = args.nx, args.degree
    mat = Material(rho=1.8, vp=2.5, vs=1.3)
    lx = lz = 1.0
    dm = build_discrete(
        rect_mesh(args.nx, args.nz, lx=lx, ly=lz), degree,
        bc_fn=absorbing_bc_fn(((0.0, lx), (0.0, lz)),
                              free_sides=[(1, "hi")]))
    prof = lambda x: args.amp * lz * np.sin(2 * np.pi * x / lx)
    phi = topo_map(prof, 0.55 * lz, lz)
    X = curved_coords(dm, phi)
    cp = build_curvi(dm, X, dtype=jnp.float32)
    vop, sop = make_curvi_ops(cp)
    p = build_params(dm, mat, dtype=jnp.float32)
    dt = cfl_dt(float(dm.h.min()), 2.5, degree, 0.3)
    E, n_p = dm.num_elements, dm.re.n_p
    rng = np.random.default_rng(3)
    st0 = State(
        u=jnp.asarray(rng.standard_normal((E, n_p, 2)) * 1e-3, jnp.float32),
        s=jnp.asarray(rng.standard_normal((E, n_p, 3)) * 1e-3, jnp.float32))
    itp = jax.devices()[0].platform == "cpu"
    rows = {}

    step_c = make_step(p, dt, order=4, vel_op=vop, stress_op=sop)
    rows["curvi_ms"] = 1e3 * _timed_scan(
        lambda c, k: step_c(c, k.astype(jnp.float32) * dt), st0,
        args.steps)

    step_a = make_step(p, dt, order=4)
    rows["einsum_ms"] = 1e3 * _timed_scan(
        lambda c, k: step_a(c, k.astype(jnp.float32) * dt), st0,
        args.steps)

    ex = detect_structured(dm)
    if ex is not None:
        r = MergedLaneRunner(p, ex, dt, order=4, interpret=itp)
        ulm, slm = r.to_lm_state(st0)
        trs = r.traction_traces(slm)
        dt_ = jnp.asarray(dt, jnp.float32)
        rows["merged_ms"] = 1e3 * _timed_scan(
            lambda c, k: r.step_with(
                r.d, r._aux(), c, k.astype(jnp.float32) * dt_),
            (ulm, slm, trs), args.steps)

    # batched-GEMM bound of the curvilinear LF4 step: 6 operator
    # applications, each dominated by De (E, dim, n_p, n_p) and Lf
    # (E, nf, n_p, nfq) contractions — FLOPs and the table-read traffic
    # (per-element matrices re-read every application; they dwarf state)
    dim, nf = 2, 3
    n_sig, nfq = 3, cp.Lf.shape[-1]
    de_flops = 2 * E * dim * n_p * n_p * (n_sig + dim) / 2  # vel+stress avg
    lf_flops = 2 * E * nf * n_p * nfq * (n_sig + dim) / 2
    flops_step = 6 * (de_flops + lf_flops)
    table_bytes = 4 * E * (dim * n_p * n_p + nf * n_p * nfq
                           + nf * nfq * dim)
    bytes_step = 6 * table_bytes
    rows["bound_mxu_ms"] = flops_step / 2 / 198e12 * 1e3  # fp32 MXU
    rows["bound_hbm_ms"] = bytes_step / 819e9 * 1e3

    out = {"E": E, "nx": args.nx, "nz": args.nz, "degree": degree,
           "steps": args.steps, **rows}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
