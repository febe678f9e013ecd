"""Slab-sharded lane-major runner vs single-chip oracle (8 fake devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.structured_exchange import detect_structured
from seigen_tpu.parallel.lane_sharded import ShardedLaneRunner
from seigen_tpu.solver import (
    PlaneWave,
    PointSource,
    State,
    absorbing_bc_fn,
    build_receivers,
    build_sources,
    cfl_dt,
    interpolate,
    line,
    sponge_mask,
)
from seigen_tpu.solver.lane_major import LaneMajorRunner

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_lane_matches_single_2d(n_shards):
    dm = build_discrete(rect_mesh(8, 4, periodic=(0, 1)), 2)
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    assert ex is not None and ex.grid[0] % n_shards == 0
    pw = PlaneWave(mat=MAT, k=2 * np.pi * np.array([1.0, 1.0]), mode="S")
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.4)
    n_steps = 5
    st = State(
        u=jnp.asarray(interpolate(dm, pw.u, 0.0), jnp.float32),
        s=jnp.asarray(interpolate(dm, pw.sigma, 0.5 * dt), jnp.float32),
    )
    single = LaneMajorRunner(p, ex, dt, order=4, block=8, interpret=True)
    ref, _ = single.run(st, n_steps)
    sharded = ShardedLaneRunner(
        p, ex, dt, n_shards, order=4, block=8, interpret=True,
        devices=jax.devices()[:n_shards])
    out, _ = sharded.run(st, n_steps)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.s), np.asarray(ref.s), rtol=1e-5, atol=1e-6)


def test_sharded_lane_full_pipeline_3d():
    """3D bounded domain with sources/receivers/damping on 4 shards."""
    extents = ((0.0, 1.0),) * 3
    topo = box_mesh(4, 3, 3)
    dm = build_discrete(
        topo, 1, bc_fn=absorbing_bc_fn(extents, free_sides=[(2, "hi")]))
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    assert ex is not None
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.5, 0.7), f0=4.0, radius=0.25)],
        dtype=jnp.float32)
    rcv = build_receivers(
        dm, line((0.2, 0.5, 0.9), (0.8, 0.5, 0.9), 3), dtype=jnp.float32)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo"), (1, "hi"),
                         (2, "lo")], width=0.3), jnp.float32)
    dt = cfl_dt(dm.h.min(), 2.0, 1, 0.4)
    n_steps = 6
    E, n_p = dm.num_elements, dm.re.n_p
    st = State(u=jnp.zeros((E, n_p, 3), jnp.float32),
               s=jnp.zeros((E, n_p, 6), jnp.float32))
    single = LaneMajorRunner(p, ex, dt, order=4, src=src, damp=damp,
                             receivers=rcv, block=8, interpret=True)
    ref, seis_ref = single.run(st, n_steps)
    sharded = ShardedLaneRunner(
        p, ex, dt, 4, order=4, src=src, damp=damp, receivers=rcv,
        block=8, interpret=True, devices=jax.devices()[:4])
    out, seis = sharded.run(st, n_steps)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(seis, seis_ref, rtol=1e-4, atol=1e-7)
