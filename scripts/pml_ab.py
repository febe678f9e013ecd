#!/usr/bin/env python
"""Scan-level C-PML cost A/B (VERDICT r3 item 9, perf-row half).

The r4 hardware rows (results/r4_pml{,_base}.json) prove the C-PML branch
runs end-to-end on TPU but their wall clocks are compile-confounded, so
this probe times the jitted RK4+C-PML scan body directly (best-of-N with
a single-element readback, per the measurement rules in BENCH_NOTES) at
the same config: 2D n=64 P3, 3 PML sides.  Rows: the C-PML RK4 step, the
same step with zero profiles (isolates the profile cost; the psi
machinery still runs), and the production merged-lane LF4 step on the
same mesh for context.  The no-psi einsum LF4 base comes from the
standard sweep harness, queued alongside.

Output: ONE JSON line {pml_ms, base_ms, merged_ms, E, n, degree}.
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
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--dim", type=int, default=2, choices=[2, 3])
    ap.add_argument("--degree", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--width", type=float, default=0.15)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
    from seigen_tpu.ops import Material, build_params
    from seigen_tpu.ops.structured_exchange import detect_structured
    from seigen_tpu.solver import (
        State,
        absorbing_bc_fn,
        cfl_dt,
        cpml_init,
        cpml_profiles,
        make_cpml_rhs,
    )
    from seigen_tpu.solver.lane_merged import MergedLaneRunner

    n, degree, dim = args.n, args.degree, args.dim
    mat = Material(rho=1.0, vp=2.0, vs=1.0)
    ext = ((0.0, 1.0),) * dim
    if dim == 2:
        mesh = rect_mesh(n, n)
        absorb = [(0, "lo"), (0, "hi"), (1, "lo")]
    else:
        mesh = box_mesh(n, n, n)
        absorb = [(0, "lo"), (0, "hi"), (1, "lo"), (1, "hi"), (2, "lo")]
    n_sig = 3 if dim == 2 else 6
    dm = build_discrete(
        mesh,
        degree,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(dim - 1, "hi")]),
    )
    p = build_params(dm, mat, dtype=jnp.float32)
    dt = cfl_dt(float(dm.h.min()), 2.0, degree, 0.4)
    E, n_p = dm.num_elements, dm.re.n_p
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(rng.standard_normal((E, n_p, dim)) * 1e-3, jnp.float32)
    s0 = jnp.asarray(
        rng.standard_normal((E, n_p, n_sig)) * 1e-3, jnp.float32)
    dt_ = jnp.asarray(dt, jnp.float32)

    def rk4_fn(rhs):
        def step(st, k):
            t = k.astype(jnp.float32) * dt_
            k1 = rhs(t, st)
            ax = lambda c, kk: jax.tree_util.tree_map(
                lambda a, b: a + c * dt_ * b, st, kk)
            k2 = rhs(t + 0.5 * dt_, ax(0.5, k1))
            k3 = rhs(t + 0.5 * dt_, ax(0.5, k2))
            k4 = rhs(t + dt_, ax(1.0, k3))
            upd = jax.tree_util.tree_map(
                lambda a, b, c_, d_: (a + 2 * b + 2 * c_ + d_) / 6.0,
                k1, k2, k3, k4)
            return jax.tree_util.tree_map(
                lambda a, b: a + dt_ * b, st, upd)

        return step

    itp = jax.devices()[0].platform == "cpu"  # Pallas interpret off-TPU
    rows = {}
    # C-PML RK4 (the production --pml branch's numerics)
    dprof, aprof = cpml_profiles(dm, absorb, args.width, 2.0, f0=9.05)
    rhs_pml = make_cpml_rhs(p, dprof, aprof)
    cst = cpml_init(p, u0, s0)
    rows["pml_ms"] = 1e3 * _timed_scan(rk4_fn(rhs_pml), cst, args.steps)

    # same RK4 chain with zero profiles: the psi recursion/split-operator
    # machinery still runs, so pml_ms - pml_zero_ms isolates the cost of
    # nonzero profiles (expected ~0 — profiles are elementwise).  The
    # no-psi einsum LF4 base comes from the standard sweep harness
    # (bench.sweep --dim 2 --impl einsum), queued alongside this probe.
    rhs_base = make_cpml_rhs(p, np.zeros_like(dprof), np.zeros_like(aprof))
    rows["pml_zero_ms"] = 1e3 * _timed_scan(
        rk4_fn(rhs_base), cst, args.steps)

    # production merged-lane LF4 row at the same mesh, for context
    ex = detect_structured(dm)
    if ex is not None:
        r = MergedLaneRunner(p, ex, dt, order=4, packed="auto",
                             interpret=itp)
        ulm, slm = r.to_lm_state(State(u=u0, s=s0))
        trs = r.traction_traces(slm)
        rows["merged_ms"] = 1e3 * _timed_scan(
            lambda c, k: r.step_with(
                r.d, r._aux(), c, k.astype(jnp.float32) * dt_),
            (ulm, slm, trs), args.steps)

        # sponge baseline: merged LF4 with a Cerjan mask on the same
        # absorbing sides (the production parity absorbing treatment)
        from seigen_tpu.solver.damping import sponge_mask

        damp = jnp.asarray(sponge_mask(dm, absorb, width=args.width),
                           jnp.float32)
        rs = MergedLaneRunner(p, ex, dt, order=4, damp=damp,
                              packed="auto", interpret=itp)
        ulm2, slm2 = rs.to_lm_state(State(u=u0, s=s0))
        trs2 = rs.traction_traces(slm2)
        rows["merged_sponge_ms"] = 1e3 * _timed_scan(
            lambda c, k: rs.step_with(
                rs.d, rs._aux(), c, k.astype(jnp.float32) * dt_),
            (ulm2, slm2, trs2), args.steps)

        # the NEW lane C-PML engine (solver/lane_cpml.py): dim split
        # vel + dim split stress merged ops per RHS, RK4
        from seigen_tpu.solver.lane_cpml import CpmlLaneRunner

        lr = CpmlLaneRunner(p, dm, ex, dt, absorb, args.width, 2.0,
                            f0=9.05, interpret=itp)
        rows["lane_pml_ms"] = 1e3 * _timed_scan(
            lambda c, k: lr.step(c, k.astype(jnp.float32) * dt_),
            lr.init_carry(State(u=u0, s=s0)), args.steps)

    out = {"E": E, "n": n, "degree": degree, "steps": args.steps, **rows}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
