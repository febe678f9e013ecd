"""Lane-major solver path vs the general-layout oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.structured_exchange import detect_structured
from seigen_tpu.solver import (
    PlaneWave,
    PointSource,
    State,
    build_receivers,
    build_sources,
    cfl_dt,
    interpolate,
    line,
    run,
    sponge_mask,
)
from seigen_tpu.solver.lane_major import LaneMajorRunner

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


@pytest.mark.parametrize("dim", [2, 3])
def test_lane_major_matches_reference(dim):
    if dim == 2:
        dm = build_discrete(rect_mesh(6, 6, periodic=(0, 1)), 2)
        k = 2 * np.pi * np.array([1.0, 1.0])
        pw = PlaneWave(mat=MAT, k=k, mode="S")
    else:
        dm = build_discrete(box_mesh(2, 2, 2, periodic=(0, 1, 2)), 2)
        pw = PlaneWave(
            mat=MAT, k=2 * np.pi * np.array([1.0, 0.0, 0.0]), mode="S",
            polarization=np.array([0.0, 1.0, 0.0]))
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    assert ex is not None
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.4)
    n_steps = 5
    st = State(
        u=jnp.asarray(interpolate(dm, pw.u, 0.0), jnp.float32),
        s=jnp.asarray(interpolate(dm, pw.sigma, 0.5 * dt), jnp.float32),
    )
    fin_ref, _ = jax.jit(
        lambda p, st: run(p, st, dt, n_steps, order=4))(p, st)

    runner = LaneMajorRunner(p, ex, dt, order=4, block=8, interpret=True)
    fin_lm, _ = runner.run(st, n_steps)
    np.testing.assert_allclose(
        np.asarray(fin_lm.u), np.asarray(fin_ref.u), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fin_lm.s), np.asarray(fin_ref.s), rtol=2e-4, atol=2e-5)


def test_lane_major_sources_receivers_damp():
    from seigen_tpu.solver import absorbing_bc_fn

    extents = ((0.0, 1.0), (0.0, 1.0))
    topo = rect_mesh(8, 8)
    dm = build_discrete(
        topo, 2, bc_fn=absorbing_bc_fn(extents, free_sides=[(1, "hi")]))
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.7), f0=8.0, radius=0.1)],
        dtype=jnp.float32)
    rcv = build_receivers(dm, line((0.2, 0.9), (0.8, 0.9), 4),
                          dtype=jnp.float32)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")], width=0.2),
        jnp.float32)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.4)
    n_steps = 6
    E, n_p = dm.num_elements, dm.re.n_p
    st = State(u=jnp.zeros((E, n_p, 2), jnp.float32),
               s=jnp.zeros((E, n_p, 3), jnp.float32))
    fin_ref, seis_ref = jax.jit(
        lambda p, st: run(p, st, dt, n_steps, order=4, src=src, damp=damp,
                          receivers=rcv))(p, st)
    runner = LaneMajorRunner(p, ex, dt, order=4, src=src, damp=damp,
                             receivers=rcv, block=8, interpret=True)
    fin_lm, seis_lm = runner.run(st, n_steps)
    np.testing.assert_allclose(
        np.asarray(fin_lm.u), np.asarray(fin_ref.u), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        seis_lm, np.asarray(seis_ref), rtol=2e-4, atol=1e-6)
