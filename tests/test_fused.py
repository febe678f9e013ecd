"""v2 exchange-fused pipeline vs the v1 lane runner / einsum oracle.

Covers: periodic 2D/3D (wrap rolls), bounded 3D with free+absorbing BCs,
sources (field + trace patch), damping (kernel-folded), receivers, and the
standalone traction-trace seed.
"""

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
    absorbing_bc_fn,
    build_receivers,
    build_sources,
    cfl_dt,
    interpolate,
    line,
    sponge_mask,
)
from seigen_tpu.solver.lane_fused import FusedLaneRunner
from seigen_tpu.solver.lane_major import LaneMajorRunner

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


def _compare(dm, n_steps=4, src=None, damp=None, rcv=None, degree=2,
             atol=2e-5):
    """v1-vs-v2 architecture equivalence.

    Tolerances allow the v2 kernels' bf16_3x matmul scheme (~1e-4 relative
    per product vs v1's full-f32 'highest'); structural bugs (signs,
    permutations, BCs) would show up at O(1).  The physics accuracy gate is
    the TPU eigenmode study (results/precision_study.json).
    """
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    assert ex is not None
    dt = cfl_dt(dm.h.min(), 2.0, degree, 0.4)
    E, n_p = dm.num_elements, dm.re.n_p
    dim = dm.dim
    n_sig = 3 if dim == 2 else 6
    rng = np.random.default_rng(7)
    st = State(
        u=jnp.asarray(rng.standard_normal((E, n_p, dim)), jnp.float32),
        s=jnp.asarray(rng.standard_normal((E, n_p, n_sig)), jnp.float32),
    )
    ref_runner = LaneMajorRunner(p, ex, dt, order=4, src=src, damp=damp,
                                 receivers=rcv, block=8, interpret=True)
    ref, seis_ref = ref_runner.run(st, n_steps)
    v2 = FusedLaneRunner(p, ex, dt, order=4, src=src, damp=damp,
                         receivers=rcv, block=8, interpret=True)
    out, seis = v2.run(st, n_steps)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=2e-4, atol=atol)
    np.testing.assert_allclose(
        np.asarray(out.s), np.asarray(ref.s), rtol=2e-4, atol=atol)
    if rcv is not None:
        np.testing.assert_allclose(seis, seis_ref, rtol=2e-4, atol=atol)
    return out


def test_fused_periodic_2d():
    dm = build_discrete(rect_mesh(4, 4, periodic=(0, 1)), 2)
    _compare(dm)


def test_fused_periodic_3d():
    dm = build_discrete(box_mesh(2, 2, 2, periodic=(0, 1, 2)), 2)
    _compare(dm)


def test_fused_bounded_3d_full_pipeline():
    """Bounded 3D with free top + absorbing sides, source, damp, receivers."""
    extents = ((0.0, 1.0),) * 3
    dm = build_discrete(
        box_mesh(3, 3, 3), 1,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(2, "hi")]))
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.5, 0.7), f0=4.0, radius=0.25)],
        dtype=jnp.float32)
    rcv = build_receivers(
        dm, line((0.2, 0.5, 0.9), (0.8, 0.5, 0.9), 3), dtype=jnp.float32)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo"), (1, "hi"),
                         (2, "lo")], width=0.3), jnp.float32)
    _compare(dm, n_steps=5, src=src, damp=damp, rcv=rcv, degree=1)


def test_fused_bounded_2d_degree3():
    extents = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(
        rect_mesh(4, 4), 3,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(1, "hi")]))
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.7), f0=4.0, radius=0.3)],
        dtype=jnp.float32)
    _compare(dm, n_steps=4, src=src, degree=3)


def test_fused_eigenmode_accuracy():
    """The v2 path propagates a plane eigenmode with the v1 path's error."""
    from seigen_tpu.solver import l2_error

    dm = build_discrete(rect_mesh(6, 6, periodic=(0, 1)), 2)
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    pw = PlaneWave(mat=MAT, k=2 * np.pi * np.array([1.0, 1.0]), mode="S")
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.4)
    n_steps = 20
    st = State(
        u=jnp.asarray(interpolate(dm, pw.u, 0.0), jnp.float32),
        s=jnp.asarray(interpolate(dm, pw.sigma, 0.5 * dt), jnp.float32),
    )
    v2 = FusedLaneRunner(p, ex, dt, order=4, block=8, interpret=True)
    out, _ = v2.run(st, n_steps)
    err = l2_error(dm, np.asarray(out.u), pw.u, n_steps * dt)
    v1 = LaneMajorRunner(p, ex, dt, order=4, block=8, interpret=True)
    ref, _ = v1.run(st, n_steps)
    err_ref = l2_error(dm, np.asarray(ref.u), pw.u, n_steps * dt)
    assert err < err_ref * 1.05 + 1e-7, (err, err_ref)


@pytest.mark.parametrize("dims,force_bx",
                         [((8, 8, 8), None), ((2, 16, 16), None),
                          ((2, 16, 16), 256), ((8, 8, 8), 128)])
def test_pallas_exchange_matches_loop(dims, force_bx):
    """Pallas exchange kernel vs XLA loop exchange, bounded 3D mesh sized
    to satisfy the class-block constraints (NC divisible by the lane
    block).

    dims (2, 16, 16) has period-2 supercell axes where ex.shift's mod-grid
    representative can point the WRONG way (the loop path rolls per axis so
    either representative works; the flat-window kernel must canonicalize
    against the boundary mask — regression for the _canonical_shift fix).
    force_bx < the flat shift magnitude covers multi-block window offsets
    (production n=40 hits bx < smax)."""
    import seigen_tpu.solver.lane_fused as lf
    from seigen_tpu.ops.fused_kernels import build_fused_data
    from seigen_tpu.solver.lane_fused import (
        make_pallas_exchange,
        make_trace_exchange,
    )

    if force_bx is not None:
        orig = lf._exchange_block_size
        lf._exchange_block_size = lambda ex: force_bx

    extents = ((0.0, 1.0),) * 3
    dm = build_discrete(
        box_mesh(*dims), 1,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(2, "hi")]))
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    d = build_fused_data(p)
    E = dm.num_elements
    rng = np.random.default_rng(3)
    try:
        for negate in (True, False):
            xp = make_pallas_exchange(ex, d, d.dim, E, E, negate=negate,
                                      interpret=True)
            assert xp is not None, "mesh should satisfy pallas-X constraints"
            xl = make_trace_exchange(ex, d, d.dim, E, E, negate=negate)
            tr = jnp.asarray(
                rng.standard_normal((d.dim * d.ftpp, E)), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(xp(tr)), np.asarray(xl(tr)), rtol=2e-4, atol=2e-5)
    finally:
        if force_bx is not None:
            lf._exchange_block_size = orig


def test_pallas_exchange_full_run():
    """End-to-end fused run with the pallas exchange vs the loop exchange."""
    extents = ((0.0, 1.0),) * 3
    dm = build_discrete(
        box_mesh(8, 8, 8), 1,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(2, "hi")]))
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.5, 0.7), f0=4.0, radius=0.25)],
        dtype=jnp.float32)
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    dt = cfl_dt(dm.h.min(), 2.0, 1, 0.4)
    E, n_p = dm.num_elements, dm.re.n_p
    st = State(u=jnp.zeros((E, n_p, 3), jnp.float32),
               s=jnp.zeros((E, n_p, 6), jnp.float32))
    rp = FusedLaneRunner(p, ex, dt, order=4, src=src, block=128,
                         interpret=True, exchange_impl="pallas")
    rl = FusedLaneRunner(p, ex, dt, order=4, src=src, block=128,
                         interpret=True, exchange_impl="loop")
    assert rp.exchange_impl == "pallas" and rl.exchange_impl == "loop"
    outp, _ = rp.run(st, 4)
    outl, _ = rl.run(st, 4)
    np.testing.assert_allclose(
        np.asarray(outp.u), np.asarray(outl.u), rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("step0", [0, 5])
def test_fused_step0_offset(step0):
    """step0 shifts the source wavelet phase exactly like the v1 path."""
    extents = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(
        rect_mesh(4, 4), 2,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(1, "hi")]))
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.7), f0=4.0, radius=0.3)],
        dtype=jnp.float32)
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.4)
    E, n_p = dm.num_elements, dm.re.n_p
    st = State(u=jnp.zeros((E, n_p, 2), jnp.float32),
               s=jnp.zeros((E, n_p, 3), jnp.float32))
    v1 = LaneMajorRunner(p, ex, dt, order=4, src=src, block=8,
                         interpret=True)
    v2 = FusedLaneRunner(p, ex, dt, order=4, src=src, block=8,
                         interpret=True)
    ref, _ = v1.run(st, 4, step0=step0)
    out, _ = v2.run(st, 4, step0=step0)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=2e-4, atol=2e-5)
