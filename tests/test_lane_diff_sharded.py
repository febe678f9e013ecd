"""Domain-decomposed FWI gradient (parallel/lane_diff_sharded.py) vs the
single-chip lane path: value and gradient must agree to roundoff across
shard counts (the gradient analog of the partition-invariance tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.structured_exchange import detect_structured
from seigen_tpu.parallel.lane_diff_sharded import ShardedLaneDiffFwi
from seigen_tpu.solver import (
    PointSource,
    absorbing_bc_fn,
    build_receivers,
    build_sources,
    cfl_dt,
    line,
    sponge_mask,
)
from seigen_tpu.solver.lane_diff import LaneDiffFwi
from seigen_tpu.solver.shots import stack_shots


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_gradient_matches_single_chip(n_shards):
    if len(jax.devices()) < n_shards:
        pytest.skip("needs virtual devices")
    rng = np.random.default_rng(13)
    extents = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(
        rect_mesh(8, 4), 2,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(1, "hi")]))
    E = dm.num_elements
    rho = 1.0 + rng.random(E)
    vp = 2.0 + rng.random(E)
    vs = 0.8 + 0.3 * rng.random(E)
    p0 = build_params(dm, Material(rho=rho, vp=vp, vs=vs),
                      dtype=jnp.float64)
    ex = detect_structured(dm)
    assert ex is not None
    dt = cfl_dt(float(dm.h.min()), 3.0, 2, 0.3)
    n_steps = 10
    src = build_sources(
        dm, [PointSource(position=(0.45, 0.6), f0=10.0, t0=0.04,
                         amplitude=100.0, radius=0.2)],
        dtype=jnp.float64)
    rcv = build_receivers(dm, line((0.2, 0.85), (0.8, 0.85), 3),
                          dtype=jnp.float64)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")], width=0.25),
        jnp.float64)

    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                      None, damp=damp, block=8, interpret=True)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.06)})
    theta = {"vp": jnp.asarray(vp0)}
    v_ref, g_ref = ldf.vg_factory(None)(theta)

    sh = ShardedLaneDiffFwi(
        p0, dm, ex, dt, n_steps, stack_shots([src]), rcv, ldf.observed,
        n_shards, damp=damp, block=8, interpret=True,
        devices=jax.devices()[:n_shards])
    # forward equivalence first (synth), then the gradient
    seis_sh = sh.synth(theta)
    seis_ref = ldf.synth(theta)
    np.testing.assert_allclose(seis_sh, seis_ref, rtol=1e-9, atol=1e-12)

    v_sh, g_sh = sh.vg_factory(None)(theta)
    np.testing.assert_allclose(v_sh, v_ref, rtol=1e-9)
    scale = np.abs(np.asarray(g_ref["vp"])).max()
    assert scale > 0
    np.testing.assert_allclose(
        np.asarray(g_sh["vp"]), np.asarray(g_ref["vp"]),
        rtol=1e-7, atol=1e-10 * scale)


def test_sharded_illumination_matches_single_chip():
    """DD illumination on the v1 lane engine (DomainDecomposedFwi's
    generic implementation) == the single-chip engine's."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    rng = np.random.default_rng(17)
    extents = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(
        rect_mesh(8, 4), 2,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(1, "hi")]))
    E = dm.num_elements
    p0 = build_params(
        dm, Material(rho=1.0 + rng.random(E), vp=2.0 + rng.random(E),
                     vs=0.8 + 0.3 * rng.random(E)), dtype=jnp.float64)
    ex = detect_structured(dm)
    dt = cfl_dt(float(dm.h.min()), 3.0, 2, 0.3)
    src = build_sources(
        dm, [PointSource(position=(0.45, 0.6), f0=10.0, t0=0.0,
                         amplitude=100.0, radius=0.2)],
        dtype=jnp.float64)
    rcv = build_receivers(dm, line((0.2, 0.85), (0.8, 0.85), 3),
                          dtype=jnp.float64)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi")], width=0.25), jnp.float64)
    ldf = LaneDiffFwi(p0, dm, ex, dt, 8, stack_shots([src]), rcv, None,
                      damp=damp, block=8, interpret=True)
    sh = ShardedLaneDiffFwi(
        p0, dm, ex, dt, 8, stack_shots([src]), rcv, None, 2, damp=damp,
        block=8, interpret=True, devices=jax.devices()[:2])
    i_ref = ldf.illumination()
    i_sh = sh.illumination()
    assert i_ref.max() > 0
    np.testing.assert_allclose(i_sh, i_ref, rtol=1e-9,
                               atol=1e-12 * i_ref.max())
