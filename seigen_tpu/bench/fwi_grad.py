"""A/B the FWI gradient formulations: AD through the roll-exchange einsum
step vs the energy-conjugation lane path (solver/lane_diff.py).

Builds the salt-demo acquisition (3D layered model, surface shots/receivers,
sponge + free surface) at a configurable size, then times value_and_grad
evaluations of both formulations and cross-checks the f32 gradients
(cosine similarity + relative error on the vp gradient — the TPU-hardware
validation of the custom VJPs, complementing the f64 CPU equivalence tests
in tests/test_lane_diff.py).

Protocol per BENCH_NOTES: everything timed is jitted scans with one host
readback per shot; first call discarded (compile); best-of-N wall times.

Usage:
  python -m seigen_tpu.bench.fwi_grad [n] [degree] [steps] [repeats]
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run(n=24, degree=1, n_steps=200, repeats=2, shots=2, segment=20,
        seed=0, paths=("roll", "lane", "merged"), out_path=None):
    from ..mesh import box_mesh, build_discrete
    from ..ops import Material, build_params  # noqa: F401 (CLI symmetry)
    from ..ops.structured_exchange import (detect_structured,
                                           make_structured_ops)
    from ..solver import (PointSource, State, absorbing_bc_fn,
                          build_receivers, build_sources, cfl_dt, line,
                          sponge_mask)
    from ..solver.adjoint import run_segmented, with_material
    from ..solver.lane_diff import LaneDiffFwi
    from ..solver.models import Layer, layered_model
    from ..solver.shots import stack_shots

    dtype = jnp.float32
    extents = ((0.0, 1.0),) * 3
    dm = build_discrete(
        box_mesh(n, n, n), degree,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(2, "hi")]))
    mat0 = layered_model(dm, [
        Layer(bottom=-0.01, top=0.5, rho=1.2, vp=2.4, vs=1.2),
        Layer(bottom=0.5, top=1.01, rho=1.0, vp=2.0, vs=1.0)])
    p0 = build_params(dm, mat0, dtype=dtype)
    ex = detect_structured(dm)
    E = dm.num_elements
    h = float(dm.h.min())
    dt = cfl_dt(h, 2.4, degree, 0.4)
    if segment:
        if n_steps < segment:
            raise ValueError(f"n_steps {n_steps} < segment {segment}")
        n_steps -= n_steps % segment
    f0 = 0.15 * 2.4 / h / (degree + 1)
    src_list = [
        build_sources(dm, [PointSource(position=(float(x), 0.5, 0.85),
                                       f0=f0, radius=2 * h)], dtype=dtype)
        for x in np.linspace(0.25, 0.75, shots)]
    rcv = build_receivers(
        dm, line((0.1, 0.5, 0.9), (0.9, 0.5, 0.9), 16), dtype=dtype)
    damp = jnp.asarray(sponge_mask(
        dm, [(0, "lo"), (0, "hi"), (1, "lo"), (1, "hi"), (2, "lo")],
        width=0.15), dtype)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    theta = {"vp": jnp.asarray(vp0, dtype)}
    rng = np.random.default_rng(seed)
    obs = jnp.asarray(
        0.01 * rng.standard_normal((shots, n_steps, 16, 3)), dtype)

    st0 = State(u=jnp.zeros((E, dm.re.n_p, 3), dtype),
                s=jnp.zeros((E, dm.re.n_p, 6), dtype))

    out = {"E": E, "degree": degree, "n_steps": n_steps, "shots": shots,
           "segment": segment, "backend": jax.devices()[0].platform}
    grads = {}
    for path in paths:
        if path == "roll":
            from ..solver.fwi import guard_roll_ad

            try:
                guard_roll_ad(E)
            except RuntimeError as exc:
                out["roll"] = {"skipped": str(exc)}
                print(json.dumps({"roll": out["roll"]}), flush=True)
                continue
            @jax.jit
            def vg_one(th, src_k, obs_k):
                def loss(th):
                    p = with_material(p0, **th)
                    vo, so = make_structured_ops(p, ex)
                    _, seis = run_segmented(
                        p, st0, dt, n_steps, segment=segment, order=4,
                        src=src_k, damp=damp, receivers=rcv, vel_op=vo,
                        stress_op=so)
                    r = seis - obs_k
                    return 0.5 * jnp.sum(r * r)
                return jax.value_and_grad(loss)(th)

            def vg(th):
                tot_v, tot_g = 0.0, None
                for k in range(shots):
                    v, g = vg_one(th, src_list[k], obs[k])
                    tot_v += float(v)
                    tot_g = g if tot_g is None else jax.tree.map(
                        jnp.add, tot_g, g)
                return tot_v, tot_g
        else:
            # "merged_pk" = the packed (two-elements-per-lane) P1 variant
            # of the merged gradient engine
            eng = "merged" if path == "merged_pk" else path
            ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots(src_list),
                              rcv, obs, damp=damp, segment=segment,
                              engine=eng, packed=(path == "merged_pk"))
            vg = ldf.vg_factory(None)

        v, g = vg(theta)  # compile + correctness sample
        jax.block_until_ready(g["vp"])
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            v, g = vg(theta)
            jax.block_until_ready(g["vp"])
            best = min(best, time.perf_counter() - t0)
        grads[path] = np.asarray(g["vp"], np.float64)
        out[path] = {
            "vg_seconds": best,
            "value": float(v),
            # fwd sweep + adjoint sweep + checkpoint recompute ~ 3 sweeps
            "grad_dof_per_s": E * dm.re.n_p * 9 * n_steps * shots
            * 3.0 / best,
        }
        print(json.dumps({path: out[path]}), flush=True)
    if "roll" in grads and "lane" in grads:
        a, b = grads["roll"], grads["lane"]
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)
                                    + 1e-30))
        rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-30))
        out["grad_cosine"] = cos
        out["grad_rel_maxdiff"] = rel
        out["speedup"] = (out["roll"]["vg_seconds"]
                          / out["lane"]["vg_seconds"])
    for other in ("merged", "merged_pk"):
        if "lane" in grads and other in grads:
            a, b = grads["lane"], grads[other]
            out[f"grad_rel_maxdiff_{other}"] = float(
                np.abs(a - b).max() / (np.abs(a).max() + 1e-30))
            out[f"speedup_{other}_vs_lane"] = (
                out["lane"]["vg_seconds"] / out[other]["vg_seconds"])
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=24)
    ap.add_argument("degree", type=int, nargs="?", default=1)
    ap.add_argument("steps", type=int, nargs="?", default=200)
    ap.add_argument("repeats", type=int, nargs="?", default=2)
    ap.add_argument("--shots", type=int, default=2)
    ap.add_argument("--segment", type=int, default=20)
    ap.add_argument("--paths", type=str, default="roll,lane,merged")
    ap.add_argument("--out", type=str, default=None,
                    help="write the result JSON here (artifact gating)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    run(n=args.n, degree=args.degree, n_steps=args.steps,
        repeats=args.repeats, shots=args.shots, segment=args.segment,
        paths=tuple(args.paths.split(",")), out_path=args.out)
