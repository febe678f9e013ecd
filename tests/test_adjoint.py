"""Adjoint/FWI slice: checkpointed forward parity + gradient correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from seigen_tpu.mesh import build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.solver import (
    PointSource,
    State,
    build_receivers,
    build_sources,
    cfl_dt,
    line,
    run,
    sponge_mask,
)
from seigen_tpu.solver.adjoint import (
    make_fwi_gradient,
    run_segmented,
    seismogram_misfit,
    with_material,
)

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


def _setup(n_steps=12, degree=1, N=5):
    dm = build_discrete(rect_mesh(N, N), degree)
    p = build_params(dm, MAT, dtype=jnp.float64)
    h = float(dm.h.min())
    dt = cfl_dt(h, 2.0, degree, 0.4)
    src = build_sources(
        dm, [PointSource(position=(0.45, 0.7), f0=1.5, radius=2 * h)],
        dtype=jnp.float64, mat=MAT)
    rcv = build_receivers(dm, line((0.2, 0.85), (0.8, 0.85), 4),
                          dtype=jnp.float64)
    damp = jnp.asarray(sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")],
                                   width=0.25), jnp.float64)
    E, n_p = dm.num_elements, dm.re.n_p
    st = State(u=jnp.zeros((E, n_p, 2)), s=jnp.zeros((E, n_p, 3)))
    return dm, p, dt, src, rcv, damp, st, n_steps


def test_run_segmented_matches_run():
    dm, p, dt, src, rcv, damp, st, n = _setup(n_steps=12)
    ref_fin, ref_seis = jax.jit(
        lambda p, st: run(p, st, dt, n, order=4, src=src, damp=damp,
                          receivers=rcv))(p, st)
    fin, seis = jax.jit(
        lambda p, st: run_segmented(p, st, dt, n, segment=4, order=4,
                                    src=src, damp=damp, receivers=rcv)
    )(p, st)
    np.testing.assert_allclose(np.asarray(fin.u), np.asarray(ref_fin.u),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(seis), np.asarray(ref_seis),
                               rtol=1e-12, atol=1e-15)


def test_with_material_roundtrip():
    dm, p, *_ = _setup()
    E = dm.num_elements
    vp = jnp.full((E,), 2.3, jnp.float64)
    vs = jnp.full((E,), 1.1, jnp.float64)
    rho = jnp.full((E,), 1.7, jnp.float64)
    p2 = with_material(p, vp=vp, vs=vs, rho=rho)
    np.testing.assert_allclose(np.asarray(p2.mu), 1.7 * 1.1**2)
    np.testing.assert_allclose(np.asarray(p2.lam),
                               1.7 * (2.3**2 - 2 * 1.1**2))
    np.testing.assert_allclose(np.asarray(1.0 / p2.inv_rho), 1.7)
    # partial update keeps the other fields
    p3 = with_material(p2, vs=vs * 1.1)
    np.testing.assert_allclose(np.asarray(1.0 / p3.inv_rho), 1.7)


def test_fwi_gradient_matches_finite_differences():
    """Reverse-mode material gradient vs central finite differences (f64)."""
    dm, p, dt, src, rcv, damp, st, n = _setup(n_steps=10)
    E = dm.num_elements

    # observed data from a perturbed "true" model
    rng = np.random.default_rng(5)
    vp_true = jnp.asarray(2.0 + 0.1 * rng.standard_normal(E))
    p_true = with_material(p, vp=vp_true)
    _, observed = jax.jit(
        lambda p, st: run(p, st, dt, n, order=4, src=src, damp=damp,
                          receivers=rcv))(p_true, st)

    vg, init_theta = make_fwi_gradient(
        p, st, dt, n, src, rcv, observed, fields=("vp",), damp=damp,
        segment=5)
    theta = init_theta()
    loss0, grads = vg(theta)
    assert float(loss0) > 0
    g = np.asarray(grads["vp"])
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0

    def loss_np(vp):
        return float(seismogram_misfit(
            with_material(p, vp=jnp.asarray(vp)), st, dt, n, src, rcv,
            observed, damp=damp))

    vp0 = np.asarray(theta["vp"]).copy()
    # check the largest-|g| elements (informative directions) + one random
    idxs = list(np.argsort(-np.abs(g))[:3]) + [int(rng.integers(0, E))]
    eps = 1e-5
    for i in idxs:
        vpp, vpm = vp0.copy(), vp0.copy()
        vpp[i] += eps
        vpm[i] -= eps
        fd = (loss_np(vpp) - loss_np(vpm)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-5, atol=1e-12)


def test_fwi_descent_reduces_misfit():
    """A few gradient-descent steps on vp reduce the misfit (the FWI loop
    closes end-to-end)."""
    dm, p, dt, src, rcv, damp, st, n = _setup(n_steps=10)
    E = dm.num_elements
    vp_true = jnp.full((E,), 2.1, jnp.float64)
    _, observed = jax.jit(
        lambda p, st: run(p, st, dt, n, order=4, src=src, damp=damp,
                          receivers=rcv))(with_material(p, vp=vp_true), st)
    vg, init_theta = make_fwi_gradient(
        p, st, dt, n, src, rcv, observed, fields=("vp",), damp=damp)
    theta = init_theta()
    losses = []
    for _ in range(4):
        loss, grads = vg(theta)
        losses.append(float(loss))
        gmax = float(jnp.abs(grads["vp"]).max())
        theta = {"vp": theta["vp"] - (0.02 / max(gmax, 1e-30)) * grads["vp"]}
    assert losses[-1] < 0.7 * losses[0], losses
