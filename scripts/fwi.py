#!/usr/bin/env python
"""Full-waveform inversion demo: recover a velocity anomaly from surface
seismograms by gradient descent through the TPU-differentiable solver.

Beyond-reference capability (the reference is forward-only): multi-shot
L2 misfit, reverse-mode vp gradients with checkpointed segments
(seigen_tpu/solver/adjoint.py), max-normalized gradient-descent updates.

Example:
  python scripts/fwi.py --n 24 --degree 2 --iters 30 --shots 4 --cpu
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--degree", type=int, default=2)
    ap.add_argument("--shots", type=int, default=4)
    ap.add_argument("--receivers", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.01,
                    help="max-normalized step in vp units per iteration")
    ap.add_argument("--T", type=float, default=1.2)
    ap.add_argument("--segment", type=int, default=None,
                    help="jax.checkpoint segment length (adjoint memory)")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None,
                    help="npz output (true/init/final vp, misfits)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from seigen_tpu.mesh import build_discrete, rect_mesh
    from seigen_tpu.ops import Material, build_params
    from seigen_tpu.solver import (
        PointSource, State, absorbing_bc_fn, build_receivers, build_sources,
        cfl_dt, line, sponge_mask,
    )
    from seigen_tpu.solver.adjoint import (
        run_segmented, seismogram_misfit, with_material,
    )

    dtype = jnp.float64 if args.f64 else jnp.float32
    extents = ((0.0, 2.0), (0.0, 1.0))
    dm = build_discrete(
        rect_mesh(2 * args.n, args.n, lx=2.0, ly=1.0), args.degree,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(1, "hi")]))
    mat0 = Material(rho=1.0, vp=2.0, vs=1.0)
    p0 = build_params(dm, mat0, dtype=dtype)
    E, n_p = dm.num_elements, dm.re.n_p
    h = float(dm.h.min())
    cent = np.asarray(dm.coords.mean(axis=1))

    # true model: Gaussian low-velocity anomaly in the background
    anom = -0.3 * np.exp(
        -(((cent[:, 0] - 1.0) ** 2 + (cent[:, 1] - 0.5) ** 2) / (2 * 0.15**2)))
    vp_true = jnp.asarray(2.0 + anom, dtype)
    vp_init = jnp.full((E,), 2.0, dtype)

    f0 = 0.15 * 2.0 / h / (args.degree + 1)
    shot_x = np.linspace(0.3, 1.7, args.shots)
    shots = [build_sources(
        dm, [PointSource(position=(float(x), 0.9), f0=f0, radius=2 * h)],
        dtype=dtype) for x in shot_x]
    rcv = build_receivers(
        dm, line((0.15, 0.95), (1.85, 0.95), args.receivers), dtype=dtype)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")], width=0.15), dtype)
    dt = cfl_dt(h, 2.0, args.degree, 0.4)
    n_steps = int(np.ceil(args.T / dt))
    if args.segment:
        n_steps -= n_steps % args.segment
    st0 = State(u=jnp.zeros((E, n_p, 2), dtype),
                s=jnp.zeros((E, n_p, 3), dtype))
    print(f"E={E} steps={n_steps} shots={args.shots} f0={f0:.1f}")

    # observed data from the true model
    p_true = with_material(p0, vp=vp_true)
    observed = []
    for s in shots:
        _, seis = jax.jit(lambda p, s=s: run_segmented(
            p, st0, dt, n_steps, src=s, damp=damp, receivers=rcv))(p_true)
        observed.append(seis)

    @jax.jit
    def value_and_grad(vp):
        def loss(vp):
            p = with_material(p0, vp=vp)
            return sum(
                seismogram_misfit(p, st0, dt, n_steps, s, rcv, obs,
                                  damp=damp, segment=args.segment)
                for s, obs in zip(shots, observed))
        return jax.value_and_grad(loss)(vp)

    # max-normalized gradient descent: the step is args.lr in vp units at
    # the most sensitive element (Adam's per-element normalization amplifies
    # zero-sensitivity regions and overshoots at these problem scales)
    vp = vp_init
    misfits = []
    for it in range(args.iters):
        val, g = value_and_grad(vp)
        misfits.append(float(val))
        gmax = float(jnp.abs(g).max())
        vp = vp - (args.lr / max(gmax, 1e-30)) * g
        vp = jnp.clip(vp, 1.2, 3.0)
        if it % 5 == 0 or it == args.iters - 1:
            err = float(jnp.abs(vp - vp_true).mean())
            print(f"iter {it:3d} misfit {misfits[-1]:.3e} "
                  f"mean|vp-true| {err:.4f}", flush=True)

    model_err0 = float(jnp.abs(vp_init - vp_true).mean())
    model_err = float(jnp.abs(vp - vp_true).mean())
    summary = {
        "misfit_first": misfits[0], "misfit_last": misfits[-1],
        "misfit_reduction": misfits[-1] / misfits[0],
        "model_err_init": model_err0, "model_err_final": model_err,
    }
    print(json.dumps(summary))
    if args.out:
        np.savez_compressed(
            args.out, vp_true=np.asarray(vp_true),
            vp_init=np.asarray(vp_init), vp_final=np.asarray(vp),
            misfits=np.asarray(misfits), centroids=cent)
        print(f"model -> {args.out}")
    assert misfits[-1] < misfits[0]
    return 0


if __name__ == "__main__":
    sys.exit(main())
