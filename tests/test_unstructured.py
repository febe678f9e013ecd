"""Unstructured lane-major fast path: pairing, exchange, runner equivalence.

Oracle: the general einsum path (ops/elastic.py) — the unstructured lane
pipeline must reproduce it on scrambled (structure-free) meshes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.pallas_kernels import build_pallas_data, _gather_traces
from seigen_tpu.ops.unstructured_exchange import (
    derive_face_pairing,
    make_unstructured_exchange_lm,
    orientation_groups,
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
from seigen_tpu.solver.lane_major import to_lm
from seigen_tpu.solver.lane_unstructured import UnstructuredLaneRunner

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


def scrambled(topo, seed=0):
    """Randomly permute cell order and drop structure metadata — an
    honest stand-in for a Gmsh import of the same geometry."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(topo.num_cells)
    return dataclasses.replace(topo, cells=topo.cells[perm], structure=None)


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 3), (3, 2)])
def test_face_pairing_roundtrip(dim, degree):
    topo = (rect_mesh(5, 4) if dim == 2 else box_mesh(3, 3, 3))
    dm = build_discrete(scrambled(topo), degree)
    p = build_params(dm, MAT, dtype=jnp.float64)
    pr = derive_face_pairing(np.asarray(p.nbr), p.n_p, p.fnodes)
    # the pairing is an involution on faces: consumer of my producer is me
    E, nf = pr.e2.shape
    for e in range(0, E, max(1, E // 17)):
        for f in range(nf):
            e2, f2 = pr.e2[e, f], pr.f2[e, f]
            assert pr.e2[e2, f2] == e and pr.f2[e2, f2] == f
    # orientation group count is bounded by facet symmetries (+identity)
    gid, perms = orientation_groups(pr)
    assert perms.shape[0] <= (3 if dim == 2 else 7)


@pytest.mark.parametrize("dim,degree,C", [(2, 2, 2), (2, 2, 3), (3, 3, 3),
                                          (3, 1, 6)])
def test_unstructured_exchange_matches_einsum_gather(dim, degree, C):
    topo = (rect_mesh(6, 5) if dim == 2 else box_mesh(2, 3, 2))
    dm = build_discrete(scrambled(topo, seed=3), degree)
    p = build_params(dm, MAT, dtype=jnp.float64)
    d = build_pallas_data(p)
    E = dm.num_elements
    E_pad = E + (-E) % 8
    rng = np.random.default_rng(7)
    field = jnp.asarray(rng.standard_normal((E, p.n_p, C)))

    ref = _gather_traces(p, field)  # (E, ftp, C) consumer traces
    ref_lm = to_lm(ref, d.ftpp, E_pad)

    pr = derive_face_pairing(np.asarray(p.nbr), p.n_p, p.fnodes)
    ex = make_unstructured_exchange_lm(pr, d.npp, d.ftpp, C, E, E_pad,
                                       p.fnodes)
    out = ex(to_lm(field, d.npp, E_pad))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_lm),
                               rtol=0, atol=0)


def test_structure_recovery():
    """Scrambled lattice meshes are recognized and reordered so the fast
    structured pipelines engage; irregular meshes are left untouched."""
    import dataclasses as dc

    from seigen_tpu.mesh.recover import recover_structure
    from seigen_tpu.ops.structured_exchange import detect_structured

    rng = np.random.default_rng(1)
    for topo in (rect_mesh(8, 6), box_mesh(4, 4, 4),
                 rect_mesh(10, 4, lx=2.0)):
        rec = recover_structure(scrambled(topo, seed=2))
        assert rec.structure is not None
        dm = build_discrete(rec, 2)
        assert detect_structured(dm) is not None
        # pure element reordering: same cells as sets
        a = np.sort(np.sort(rec.cells, axis=1), axis=0)
        b = np.sort(np.sort(topo.cells, axis=1), axis=0)
        np.testing.assert_array_equal(a, b)

    # negative control: perturbed interior vertices -> no recovery
    pert = rect_mesh(6, 6)
    v = pert.vertices.copy()
    inner = ((v[:, 0] > 0.01) & (v[:, 0] < 0.99)
             & (v[:, 1] > 0.01) & (v[:, 1] < 0.99))
    v[inner] += 0.02 * rng.standard_normal(v[inner].shape)
    pert = dataclasses.replace(pert, vertices=v, structure=None)
    assert recover_structure(pert).structure is None


def test_structure_recovery_same_physics():
    """A recovered (reordered) mesh produces the same seismograms as the
    original through the simulation facade."""
    from seigen_tpu.solver.simulation import ElasticSimulation, SimConfig

    topo = rect_mesh(6, 6)
    cfg = SimConfig(degree=2, impl="einsum", dtype="float64",
                    absorbing_sides=((0, "lo"), (0, "hi"), (1, "lo")),
                    free_sides=((1, "hi"),), sponge_width=0.2)
    pts = line((0.25, 0.9), (0.75, 0.9), 3)
    srcs = [PointSource(position=(0.5, 0.6), f0=2.0, radius=0.3)]
    sim_a = ElasticSimulation(topo, MAT, cfg, sources=srcs,
                              receiver_points=pts)
    sim_b = ElasticSimulation(scrambled(topo, seed=4), MAT, cfg,
                              sources=srcs, receiver_points=pts)
    assert sim_b.topology.structure is not None  # recovery kicked in
    _, seis_a = sim_a.run(0.2)
    _, seis_b = sim_b.run(0.2)
    np.testing.assert_allclose(seis_b, seis_a, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("dim,degree,fused_select",
                         [(2, 2, True), (3, 1, True), (2, 2, False)])
def test_unstructured_runner_matches_general(dim, degree, fused_select):
    topo = (rect_mesh(8, 6) if dim == 2 else box_mesh(3, 2, 2))
    dm = build_discrete(scrambled(topo, seed=11), degree)
    p = build_params(dm, MAT, dtype=jnp.float32)
    h = float(dm.h.min())
    dt = cfl_dt(h, 2.0, degree, 0.4)
    n_steps = 12
    E, n_p = dm.num_elements, dm.re.n_p
    n_sig = 3 if dim == 2 else 6
    src = build_sources(
        dm, [PointSource(position=(0.4,) * dim, f0=2.0, radius=2 * h)],
        dtype=jnp.float32, mat=MAT)
    damp = jnp.asarray(sponge_mask(dm, [(0, "lo")], width=0.3),
                       jnp.float32)
    rcv = build_receivers(dm, line((0.2,) * dim, (0.8,) * dim, 3),
                          dtype=jnp.float32)
    st = State(u=jnp.zeros((E, n_p, dim), jnp.float32),
               s=jnp.zeros((E, n_p, n_sig), jnp.float32))

    ref, seis_ref = jax.jit(
        lambda p, st: run(p, st, dt, n_steps, order=4, src=src, damp=damp,
                          receivers=rcv)
    )(p, st)

    runner = UnstructuredLaneRunner(
        p, dt, order=4, src=src, damp=damp, receivers=rcv,
        centroids=np.asarray(dm.coords.mean(axis=1)), block=8,
        interpret=True, fused_select=fused_select)
    out, seis = runner.run(st, n_steps)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(seis), np.asarray(seis_ref),
                               rtol=2e-4, atol=1e-6)
