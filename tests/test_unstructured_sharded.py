"""ShardedUnstructuredRunner (Morton-block multi-chip) invariance.

The reference's flagship benchmark was unstructured AND distributed
(SURVEY.md §3/§9.3: Gmsh meshes over MPI ranks); the oracle here is the
general einsum path (solver.run) on SCRAMBLED meshes — structure-free,
so nothing can fall back to the roll exchange — with the full production
feature set (sources, sponge damping, receivers via psum).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.parallel.unstructured_sharded import (
    ShardedUnstructuredRunner,
)
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

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


def scrambled(topo, seed=0):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(topo.num_cells)
    return dataclasses.replace(topo, cells=topo.cells[perm],
                               structure=None)


def _case(dim, degree, seed=11):
    topo = rect_mesh(8, 6) if dim == 2 else box_mesh(3, 3, 2)
    dm = build_discrete(scrambled(topo, seed=seed), degree)
    p = build_params(dm, MAT, dtype=jnp.float32)
    h = float(dm.h.min())
    dt = cfl_dt(h, 2.0, degree, 0.4)
    E, n_p = dm.num_elements, dm.re.n_p
    n_sig = 3 if dim == 2 else 6
    src = build_sources(
        dm, [PointSource(position=(0.4,) * dim, f0=2.0, radius=2 * h)],
        dtype=jnp.float32, mat=MAT)
    damp = jnp.asarray(sponge_mask(dm, [(0, "lo")], width=0.3),
                       jnp.float32)
    rcv = build_receivers(dm, line((0.2,) * dim, (0.8,) * dim, 3),
                          dtype=jnp.float32)
    rng = np.random.default_rng(3)
    st = State(
        u=jnp.asarray(rng.standard_normal((E, n_p, dim)), jnp.float32),
        s=jnp.asarray(rng.standard_normal((E, n_p, n_sig)), jnp.float32))
    cent = np.asarray(dm.coords.mean(axis=1))
    return dm, p, dt, st, src, rcv, damp, cent


@pytest.mark.parametrize("dim,degree,n_shards",
                         [(2, 2, 2), (2, 2, 4), (3, 1, 2), (3, 2, 8)])
def test_sharded_unstructured_matches_general(dim, degree, n_shards):
    dm, p, dt, st, src, rcv, damp, cent = _case(dim, degree)
    n_steps = 8
    ref, seis_ref = jax.jit(
        lambda p, st: run(p, st, dt, n_steps, order=4, src=src,
                          damp=damp, receivers=rcv)
    )(p, st)

    runner = ShardedUnstructuredRunner(
        p, dt, n_shards, centroids=cent, order=4, src=src, damp=damp,
        receivers=rcv, block=8, interpret=True,
        devices=jax.devices()[:n_shards])
    out, seis = runner.run(st, n_steps)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(seis), np.asarray(seis_ref),
                               rtol=2e-4, atol=1e-6)


def test_sharded_unstructured_shard_count_invariance():
    """Bit-level agreement question aside, 2 vs 4 shards must agree to
    float tolerance on the same mesh (partition invariance)."""
    dm, p, dt, st, src, rcv, damp, cent = _case(3, 1, seed=5)
    outs = []
    for n_shards in (2, 4):
        runner = ShardedUnstructuredRunner(
            p, dt, n_shards, centroids=cent, src=src, damp=damp,
            receivers=rcv, block=8, interpret=True,
            devices=jax.devices()[:n_shards])
        out, seis = runner.run(st, 6)
        outs.append((np.asarray(out.u), np.asarray(out.s),
                     np.asarray(seis)))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_sharded_unstructured_resume():
    """run(12) == run(6) -> run(6, step0=6) staying in lane-major layout
    (checkpoint/resume through the sharded fast path)."""
    dm, p, dt, st, src, rcv, damp, cent = _case(2, 2, seed=9)
    runner = ShardedUnstructuredRunner(
        p, dt, 2, centroids=cent, src=src, damp=damp, block=8,
        interpret=True, devices=jax.devices()[:2])
    full, _ = runner.run(st, 12)
    ulm, slm = runner.to_lm_state(st)
    ulm, slm, _ = runner.run_lm(ulm, slm, 6)
    ulm, slm, _ = runner.run_lm(ulm, slm, 6, step0=6)
    split = runner.from_lm_state(ulm, slm)
    np.testing.assert_array_equal(np.asarray(split.u),
                                  np.asarray(full.u))
    np.testing.assert_array_equal(np.asarray(split.s),
                                  np.asarray(full.s))
