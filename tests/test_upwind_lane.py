"""Lane-major upwind/RK4 runner vs the einsum RK4 oracle.

The oracle (solver/rk4.py + ops/upwind.py) is itself order-verified
against analytic eigenmodes (tests/test_upwind.py), closing the chain.
Covers: bare physics, blob source (kernel-fused dense injection),
sponge damping (fields + traces + xi), receivers, viscoelastic memory
variables, 2D and 3D, and lane padding (block does not divide NC).
"""

import jax.numpy as jnp
import numpy as np

from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.structured_exchange import detect_structured
from seigen_tpu.ops.upwind import build_upwind_data
from seigen_tpu.ops.viscoelastic import build_visco
from seigen_tpu.solver import (
    PointSource,
    State,
    absorbing_bc_fn,
    build_receivers,
    build_sources,
    cfl_dt,
    line,
    sponge_mask,
)
from seigen_tpu.solver.lane_upwind import UpwindLaneRunner
from seigen_tpu.solver.rk4 import run_rk4, run_rk4_visco

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


def _case_3d():
    ext = ((0.0, 1.0),) * 3
    dm = build_discrete(
        box_mesh(3, 3, 3), 2,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(2, "hi")]))
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.5, 0.7), f0=4.0, radius=0.25)],
        dtype=jnp.float32)
    rcv = build_receivers(
        dm, line((0.2, 0.5, 0.9), (0.8, 0.5, 0.9), 3), dtype=jnp.float32)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi")], width=0.3), jnp.float32)
    return dm, src, rcv, damp


def _state(dm, dim):
    n_sig = 3 if dim == 2 else 6
    E, n_p = dm.num_elements, dm.re.n_p
    rng = np.random.default_rng(3)
    return State(
        u=jnp.asarray(rng.standard_normal((E, n_p, dim)), jnp.float32),
        s=jnp.asarray(rng.standard_normal((E, n_p, n_sig)), jnp.float32),
    )


def _compare(dm, block, src=None, damp=None, rcv=None, visco=None,
             n_steps=3, atol=5e-5):
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    assert ex is not None
    w = build_upwind_data(dm, MAT, dtype=jnp.float32)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.25)
    st = _state(dm, dm.dim)
    if visco is not None:
        ref, _, seis_ref = run_rk4_visco(
            p, w, visco, st, dt, n_steps, src=src, damp=damp,
            receivers=rcv)
    else:
        ref, seis_ref = run_rk4(
            p, w, st, dt, n_steps, src=src, damp=damp, receivers=rcv)
    run = UpwindLaneRunner(p, ex, w, dt, src=src, damp=damp,
                           receivers=rcv, block=block, interpret=True,
                           visco=visco)
    out, seis = run.run(st, n_steps)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=2e-4, atol=atol)
    np.testing.assert_allclose(
        np.asarray(out.s), np.asarray(ref.s), rtol=2e-4, atol=atol)
    if rcv is not None:
        np.testing.assert_allclose(
            np.asarray(seis), np.asarray(seis_ref), rtol=2e-4, atol=atol)
    return run


def test_upwind_lane_3d_full():
    dm, src, rcv, damp = _case_3d()
    run = _compare(dm, block=9, src=src, damp=damp, rcv=rcv)
    assert run.src_dense is not None  # blob rides the dense path


def test_upwind_lane_3d_lane_padding():
    dm, src, rcv, damp = _case_3d()
    _compare(dm, block=8, src=src, damp=damp, rcv=rcv)


def test_upwind_lane_3d_visco():
    dm, src, _, damp = _case_3d()
    p = build_params(dm, MAT, dtype=jnp.float32)
    v = build_visco(p, 30.0, 20.0, 1.0, 8.0, L=2)
    _compare(dm, block=9, src=src, damp=damp, visco=v)


def test_upwind_lane_2d():
    ext = ((0.0, 1.0),) * 2
    dm = build_discrete(
        rect_mesh(4, 4), 2,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(1, "hi")]))
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.6), f0=4.0, radius=0.2)],
        dtype=jnp.float32)
    _compare(dm, block=8, src=src)
