"""Scan-level A/B harnesses: isolate exchange vs kernel cost per pipeline.

Per-call dispatch through the axon tunnel costs ~1 s (BENCH_NOTES.md), so
every component is timed as a jitted lax.scan of n iterations with a final
host readback.  Bodies are self-composable (output shape == carry shape) so
the scan stays shape-stable; E-sized arrays are threaded as arguments.

Usage:
  python -m seigen_tpu.bench.ab --n 24 --steps 50 [--impl fused|lane]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def _timed_scan(fn, carry, args, n, reps=2):
    """Best-of-reps wall time of a jitted n-iteration scan of fn."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @functools.partial(jax.jit, static_argnames=("n",))
    def go(carry, args, n):
        def body(c, _):
            return fn(c, args), None

        out, _ = jax.lax.scan(body, carry, jnp.arange(n))
        return out

    def readback(out):
        # single-element readback: full-array pulls through the axon
        # tunnel cost ~1 s and would swamp the measurement (BENCH_NOTES)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    out = go(carry, args, n)  # compile + warm
    readback(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = go(carry, args, n)
        readback(out)
        best = min(best, time.perf_counter() - t0)
    return best / n


def run_ab(n=24, degree=3, steps=50, impl="fused", out_path=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.structured_exchange import detect_structured
    from .throughput import setup_case

    dm, p, src, damp, dt, state0 = setup_case(n=n, degree=degree)
    ex = detect_structured(dm)
    E = dm.num_elements
    rows = {}

    if impl == "fused":
        from ..solver.lane_fused import FusedLaneRunner

        r = FusedLaneRunner(p, ex, dt, order=4, src=src, damp=damp)
        d = r.d
        ulm, slm = r.to_lm_state(state0)
        trs = r.traction_traces(slm)
        tru = jnp.zeros((d.dim * d.ftpp, r.E_pad), r.dtype)

        # full step
        rows["step"] = _timed_scan(
            lambda c, a: r.step_with(a[0], r._aux(), c, 0.0),
            (ulm, slm, trs), (d,), steps)

        # exchanges only (3 traction + 3 value per LF4 step)
        rows["x_t3"] = _timed_scan(
            lambda c, a: r.ex_t(r.ex_t(r.ex_t(c))), trs, (), steps)
        rows["x_u3"] = _timed_scan(
            lambda c, a: r.ex_u(r.ex_u(r.ex_u(c))), tru, (), steps)

        # kernels only: vel2+stress2 chain (3 of each per step), traces
        # passed as fixed args (no exchange)
        from ..ops.fused_kernels import stress2_op, vel2_op

        def k6(c, a):
            d_, trs_, tru_ = a
            s = c
            for _ in range(3):
                uh, _tu = vel2_op(d_, s, trs_, r.block, False)
                s, _tt = stress2_op(d_, uh, tru_, r.block, False)
            return s

        rows["k6"] = _timed_scan(k6, slm, (d, trs, tru), steps)
    elif impl == "merged":
        from ..ops.merged_kernels import stress_merged, vel_merged
        from ..solver.lane_merged import MergedLaneRunner

        r = MergedLaneRunner(p, ex, dt, order=4, src=src, damp=damp)
        d = r.d
        plan = r.plan
        ulm, slm = r.to_lm_state(state0)
        trs = r.traction_traces(slm)

        rows["step"] = _timed_scan(
            lambda c, a: r.step_with(a[0], r._aux(), c, 0.0),
            (ulm, slm, trs), (d,), steps)

        # 6-op chain without injection/damp (the merged ops ARE the
        # exchange; no separate exchange row exists in this pipeline)
        def k6(c, a):
            d_, trs_ = a
            s = c
            for _ in range(3):
                uh, tru_ = vel_merged(plan, d_, s, trs_, r.mask)
                s, _tt = stress_merged(plan, d_, uh, tru_, r.mask)
            return s

        rows["k6"] = _timed_scan(k6, slm, (d, trs), steps)

        # one vel op in isolation (self-composable via shape: feed sigma,
        # discard shape change by re-adding)
        def vel1(c, a):
            d_, trs_ = a
            uh, _ = vel_merged(plan, d_, c, trs_, r.mask)
            return c + 1e-30 * jnp.concatenate(
                [uh, uh[: c.shape[0] - uh.shape[0]]], axis=0)[: c.shape[0]]

        rows["vel3"] = _timed_scan(
            lambda c, a: vel1(vel1(vel1(c, a), a), a), slm, (d, trs), steps)
    elif impl == "upwind_u":
        # unstructured upwind split (VERDICT r3 next-round #7): the RHS is
        # two panel gathers (_pg_u/_pg_t: one-hot restriction + takes) +
        # the coupled Godunov kernel; RK4 runs 4 RHS per step.  Rows: rhs4
        # (the production chain), g4 (panels only, x4), k4 (kernel only,
        # fixed panels, x4) — rhs4 - g4 - k4 = glue/overlap.
        from ..ops.pallas_kernels import upwind_rhs_lm_sel
        from ..ops.upwind import build_upwind_data
        from ..solver.lane_upwind_u import UnstructuredUpwindRunner
        from .throughput import BENCH_MAT

        dm, p, src, damp, dt, state0 = setup_case(
            n=n, degree=degree, scramble=True)
        w = build_upwind_data(dm, BENCH_MAT, dtype=p.Ginv.dtype)
        r = UnstructuredUpwindRunner(
            p, w, dt, src=src, damp=damp,
            centroids=np.asarray(dm.coords.mean(axis=1)))
        d = r.d
        aux = r._aux()
        ulm, slm = r.to_lm_state(state0)
        zz = (aux["zpn"], aux["zsn"], aux["zown"])
        PU, PT = r._pg_u[0](ulm), r._pg_t[0](slm)

        def fold(x, g):
            f = g.reshape(-1)[: x.size]
            f = jnp.concatenate(
                [f, jnp.zeros(x.size - f.size, x.dtype)]).reshape(x.shape)
            return x + 1e-30 * f

        def rhs1(c, a):
            u, s = c
            out = upwind_rhs_lm_sel(
                d, zz, u, s, r._pg_u[0](u), r._pg_t[0](s),
                aux["uw_combo"], aux["sign_u"], aux["sign_t"],
                r._pg_u[3], r.block, False)
            return (u + 1e-30 * out[: d.dim * d.npp],
                    s + 1e-30 * out[d.dim * d.npp :])

        def g1(c, a):
            u, s = c
            return fold(u, r._pg_u[0](u)), fold(s, r._pg_t[0](s))

        def k1(c, a):
            u, s = c
            out = upwind_rhs_lm_sel(
                d, zz, u, s, PU, PT, aux["uw_combo"], aux["sign_u"],
                aux["sign_t"], r._pg_u[3], r.block, False)
            return (u + 1e-30 * out[: d.dim * d.npp],
                    s + 1e-30 * out[d.dim * d.npp :])

        def x4(f):
            return lambda c, a: f(f(f(f(c, a), a), a), a)

        rows["rhs4"] = _timed_scan(x4(rhs1), (ulm, slm), (), steps)
        rows["g4"] = _timed_scan(x4(g1), (ulm, slm), (), steps)
        rows["k4"] = _timed_scan(x4(k1), (ulm, slm), (), steps)

        # panel-gather ATTRIBUTION (VERDICT r4 #2b): gT4 times ONLY the
        # own-rows build (restriction + traction contraction) — the part
        # a producer-side kernel epilogue could emit for free.  g4 - gT4
        # is the neighbour takes + panel materialization, the
        # irreducible gather; gT4 is the emission lever's ceiling.
        def gT1(c, a):
            u, s = c
            return (fold(u, r._pg_u[0].own_rows_fn(u)),
                    fold(s, r._pg_t[0].own_rows_fn(s)))

        rows["gT4"] = _timed_scan(x4(gT1), (ulm, slm), (), steps)

        # full production step, fused RK4 epilogue (default) vs the
        # XLA-glue stepper (fused_axpy=False) — the r4 reconciliation's
        # "5.24 ms glue" recovery lever, measured at step level
        def stepf(r_):
            # each runner is timed with ITS OWN d/aux (ADVICE r4: closing
            # over the fused runner's aux silently couples the A/B to its
            # aux layout if the runners ever diverge)
            d_, aux_ = r_.d, r_._aux()

            def f(c, a):
                u, s, _ = r_.step_with(d_, aux_, (c[0], c[1], None), 0.0)
                return (u, s)
            return f

        rows["step"] = _timed_scan(stepf(r), (ulm, slm), (), steps)
        r_glue = UnstructuredUpwindRunner(
            p, w, dt, src=src, damp=damp, fused_axpy=False,
            centroids=np.asarray(dm.coords.mean(axis=1)))
        rows["step_glue"] = _timed_scan(
            stepf(r_glue), (ulm, slm), (), steps)

        # producer-side panel emission (r5 lever priced by gT4): the
        # stage kernels append their output's own-face panels; the XLA
        # restriction pass (gT4 = 3.94 ms of g4 = 6.47 ms) never runs
        r_emit = UnstructuredUpwindRunner(
            p, w, dt, src=src, damp=damp, panel_emit=True,
            centroids=np.asarray(dm.coords.mean(axis=1)))

        def step_emit(c, a):
            u, s, TU, TT = c
            u, s, T = r_emit._step_emit(
                r_emit.d, r_emit._aux(), (u, s, (TU, TT)), 0.0)
            return (u, s, T[0], T[1])

        TU0, TT0 = r_emit._own_rows_e(ulm, slm)
        rows["step_emit"] = _timed_scan(
            step_emit, (ulm, slm, TU0, TT0), (), steps)
    else:
        from ..ops.pallas_kernels import stress_op_lm, vel_op_lm
        from ..solver.lane_major import LaneMajorRunner

        r = LaneMajorRunner(p, ex, dt, order=4, src=src, damp=damp)
        d = r.d
        ulm, slm = r.to_lm_state(state0)
        trs = jnp.zeros((d.n_sig * d.ftpp, r.E_pad), r.dtype)
        tru = jnp.zeros((d.dim * d.ftpp, r.E_pad), r.dtype)

        rows["step"] = _timed_scan(
            lambda c, a: r.step_with(a[0], r._aux(), c, 0.0),
            (ulm, slm), (d,), steps)

        def xs3(c, a):
            out = c
            for _ in range(3):
                out = out.at[:, : r.E].set(0.99 * r.ex_s(out)[:, : r.E][
                    : c.shape[0]])
            return out

        # exchange produces (C*ftpp, E_pad) from (C*npp, E_pad): time the
        # sigma exchange by feeding the field and discarding shape change
        rows["x_s3"] = _timed_scan(
            lambda c, a: c + 1e-30 * jnp.pad(
                r.ex_s(c),
                ((0, c.shape[0] - d.n_sig * d.ftpp), (0, 0)))[
                : c.shape[0]]
            if c.shape[0] >= d.n_sig * d.ftpp
            else c,
            slm, (), steps)

        def k6(c, a):
            d_, trs_, tru_ = a
            s = c
            for _ in range(3):
                uh = vel_op_lm(d_, s, trs_, r.block, False)
                s = stress_op_lm(d_, uh, tru_, r.block, False)
            return s

        rows["k6"] = _timed_scan(k6, slm, (d, trs, tru), steps)

    out = {
        "impl": impl,
        "n": n,
        "E": E,
        "steps": steps,
        "ms": {k: v * 1e3 for k, v in rows.items()},
    }
    print(json.dumps(out))
    if out_path:
        # atomic: write temp + rename so a killed run never satisfies an
        # artifact gate with a truncated file (ADVICE r4)
        import os

        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, out_path)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--degree", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--impl", type=str, default="fused")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    run_ab(args.n, args.degree, args.steps, args.impl, out_path=args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
