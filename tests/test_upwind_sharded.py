"""ShardedUpwindRunner partition invariance — the upwind-RK4 (+visco)
cells of the physics x parallelism matrix (VERDICT r4 next-round #8).

Oracle: the single-chip UpwindLaneRunner at every shard count, full
feature set active (source injection incl. the payload-trace patch,
RK4 trace-carry damping, receivers via psum, visco xi carry)."""

import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import box_mesh, build_discrete
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.structured_exchange import detect_structured
from seigen_tpu.ops.upwind import build_upwind_data
from seigen_tpu.ops.viscoelastic import build_visco
from seigen_tpu.parallel.upwind_sharded import ShardedUpwindRunner
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

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


def _case(n0=4):
    ext = ((0.0, 1.0),) * 3
    dm = build_discrete(
        box_mesh(n0, 3, 3), 2,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(2, "hi")]))
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.5, 0.7), f0=4.0, radius=0.25)],
        dtype=jnp.float32)
    rcv = build_receivers(
        dm, line((0.2, 0.5, 0.9), (0.8, 0.5, 0.9), 3), dtype=jnp.float32)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")], width=0.3),
        jnp.float32)
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    assert ex is not None
    w = build_upwind_data(dm, MAT, dtype=jnp.float32)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.25)
    E, n_p = dm.num_elements, dm.re.n_p
    rng = np.random.default_rng(7)
    st = State(
        u=jnp.asarray(rng.standard_normal((E, n_p, 3)), jnp.float32),
        s=jnp.asarray(rng.standard_normal((E, n_p, 6)), jnp.float32),
    )
    return dm, p, ex, w, dt, st, src, rcv, damp


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_upwind_invariance(n_shards):
    dm, p, ex, w, dt, st, src, rcv, damp = _case()
    ref = UpwindLaneRunner(p, ex, w, dt, src=src, damp=damp,
                           receivers=rcv, block=9, interpret=True)
    refo, seis_ref = ref.run(st, 3)
    r = ShardedUpwindRunner(p, ex, w, dt, n_shards, src=src, damp=damp,
                            receivers=rcv, block=8, interpret=True)
    out, seis = r.run(st, 3)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(refo.u), rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out.s), np.asarray(refo.s), rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(seis, seis_ref, rtol=2e-4, atol=5e-5)


def test_sharded_upwind_visco_invariance():
    """Viscoelastic Q: xi rides the lane-sharded carry; the trace rows
    get the -traces(xi_sum) correction per stage on every shard."""
    dm, p, ex, w, dt, st, src, rcv, damp = _case()
    v = build_visco(p, 30.0, 20.0, 1.0, 8.0, L=2)
    ref = UpwindLaneRunner(p, ex, w, dt, src=src, damp=damp,
                           receivers=rcv, block=9, interpret=True,
                           visco=v)
    refo, seis_ref = ref.run(st, 3)
    r = ShardedUpwindRunner(p, ex, w, dt, 2, src=src, damp=damp,
                            receivers=rcv, block=8, interpret=True,
                            visco=v)
    out, seis = r.run(st, 3)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(refo.u), rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out.s), np.asarray(refo.s), rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(seis, seis_ref, rtol=2e-4, atol=5e-5)
