"""Unstructured upwind/RK4 runner (solver/lane_upwind_u.py) vs the einsum
RK4 oracle on SCRAMBLED (structure-free) meshes.

The oracle (solver/rk4.py + ops/upwind.py) is itself order-verified
against analytic eigenmodes (tests/test_upwind.py), closing the chain.
Covers: bare physics, point source, sponge damping, receivers,
viscoelastic memory variables, mixed BCs, 2D and 3D, lane padding."""

import dataclasses as _dc

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
from seigen_tpu.solver.lane_upwind_u import UnstructuredUpwindRunner
from seigen_tpu.solver.rk4 import run_rk4, run_rk4_visco

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


def _scramble(topo, seed):
    rng = np.random.default_rng(seed)
    return _dc.replace(topo, cells=topo.cells[rng.permutation(
        topo.num_cells)], structure=None)


def _case_3d():
    ext = ((0.0, 1.0),) * 3
    dm = build_discrete(
        _scramble(box_mesh(3, 3, 3), 11), 2,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(2, "hi")]))
    assert detect_structured(dm) is None
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
    run = UnstructuredUpwindRunner(
        p, w, dt, src=src, damp=damp, receivers=rcv, block=block,
        interpret=True, visco=visco,
        centroids=np.asarray(dm.coords.mean(axis=1)))
    out, seis = run.run(st, n_steps)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=2e-4, atol=atol)
    np.testing.assert_allclose(
        np.asarray(out.s), np.asarray(ref.s), rtol=2e-4, atol=atol)
    if rcv is not None:
        np.testing.assert_allclose(
            np.asarray(seis), np.asarray(seis_ref), rtol=2e-4, atol=atol)
    return run


def test_upwind_lane_u_3d_full():
    dm, src, rcv, damp = _case_3d()
    _compare(dm, block=8, src=src, damp=damp, rcv=rcv)


def test_upwind_lane_u_3d_visco():
    dm, src, rcv, damp = _case_3d()
    p = build_params(dm, MAT, dtype=jnp.float32)
    visco = build_visco(p, 30.0, 20.0, 1.0, 10.0)
    _compare(dm, block=8, src=src, damp=damp, rcv=rcv, visco=visco)


def test_upwind_lane_u_2d_mixed_bcs():
    ext = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(
        _scramble(rect_mesh(5, 4), 7), 2,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(1, "hi")]))
    assert detect_structured(dm) is None
    _compare(dm, block=8)


def test_upwind_lane_u_resume_chunks():
    """run_xi chunked driver: two 2-step chunks == one 4-step run
    (bitwise viscoelastic resume support)."""
    dm, src, rcv, damp = _case_3d()
    p = build_params(dm, MAT, dtype=jnp.float32)
    w = build_upwind_data(dm, MAT, dtype=jnp.float32)
    visco = build_visco(p, 30.0, 20.0, 1.0, 10.0)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.25)
    st = _state(dm, dm.dim)
    run = UnstructuredUpwindRunner(
        p, w, dt, src=src, damp=damp, block=8, interpret=True,
        visco=visco, centroids=np.asarray(dm.coords.mean(axis=1)))
    full, xi_f, _ = run.run_xi(st, None, 4)
    half, xi_h, _ = run.run_xi(st, None, 2)
    resumed, xi_r, _ = run.run_xi(half, xi_h, 2, step0=2)
    np.testing.assert_array_equal(np.asarray(resumed.u),
                                  np.asarray(full.u))
    np.testing.assert_array_equal(np.asarray(resumed.s),
                                  np.asarray(full.s))
    np.testing.assert_array_equal(np.asarray(xi_r), np.asarray(xi_f))


def test_upwind_lane_u_visco_source_driven():
    """Zero initial state, all signal source-driven: catches anelastic-
    target contamination by the source (sources bypass the target,
    solver/rk4.py:78-93) that O(1) random-state comparisons mask."""
    from seigen_tpu.solver.rk4 import run_rk4_visco

    dm, src, rcv, damp = _case_3d()
    p = build_params(dm, MAT, dtype=jnp.float32)
    w = build_upwind_data(dm, MAT, dtype=jnp.float32)
    visco = build_visco(p, 30.0, 20.0, 1.0, 10.0)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.25)
    E, n_p = dm.num_elements, dm.re.n_p
    st = State(u=jnp.zeros((E, n_p, 3), jnp.float32),
               s=jnp.zeros((E, n_p, 6), jnp.float32))
    n = 12
    ref, _, seis_ref = run_rk4_visco(
        p, w, visco, st, dt, n, src=src, damp=damp, receivers=rcv)
    run = UnstructuredUpwindRunner(
        p, w, dt, src=src, damp=damp, receivers=rcv, block=8,
        interpret=True, visco=visco,
        centroids=np.asarray(dm.coords.mean(axis=1)))
    out, seis = run.run(st, n)
    scale = float(np.abs(np.asarray(ref.u)).max())
    assert scale > 0
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=2e-4,
        atol=1e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(seis), np.asarray(seis_ref), rtol=2e-4,
        atol=1e-5 * float(np.abs(seis_ref).max()))


def test_upwind_lane_u_fused_axpy_matches_glue():
    """Fused RK4 epilogue (stage/acc axpys inside the kernel,
    upwind_rhs_lm_sel_axpy) vs the XLA-glue stepper on the same runner
    config — also keeps the elastic glue path covered now that
    fused_axpy is the elastic default."""
    ext = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(
        _scramble(rect_mesh(5, 4), 7), 2,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(1, "hi")]))
    p = build_params(dm, MAT, dtype=jnp.float32)
    w = build_upwind_data(dm, MAT, dtype=jnp.float32)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.25)
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.5), f0=4.0, radius=0.25)],
        dtype=jnp.float32)
    damp = jnp.asarray(sponge_mask(dm, [(0, "lo")], width=0.3),
                       jnp.float32)
    st = _state(dm, dm.dim)
    kw = dict(src=src, damp=damp, block=8, interpret=True,
              centroids=np.asarray(dm.coords.mean(axis=1)))
    run_f = UnstructuredUpwindRunner(p, w, dt, **kw)
    run_g = UnstructuredUpwindRunner(p, w, dt, fused_axpy=False, **kw)
    assert run_f.fused_axpy and not run_g.fused_axpy
    out_f, _ = run_f.run(st, 4)
    out_g, _ = run_g.run(st, 4)
    np.testing.assert_allclose(np.asarray(out_f.u), np.asarray(out_g.u),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_f.s), np.asarray(out_g.s),
                               rtol=2e-5, atol=2e-6)


def test_upwind_lane_u_fused_scatter_fallback_matches_glue():
    """ADVICE r4: the fused stepper's SCATTER fallback (>2 distinct
    (f0, t0) wavelet groups force src_dense=None) and the stage-4
    damp-after-scatter ordering were uncovered.  Three sources with
    distinct wavelets + sponge damp: fused == glue."""
    ext = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(
        _scramble(rect_mesh(5, 4), 11), 2,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(1, "hi")]))
    p = build_params(dm, MAT, dtype=jnp.float32)
    w = build_upwind_data(dm, MAT, dtype=jnp.float32)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.25)
    src = build_sources(
        dm, [PointSource(position=(0.35, 0.5), f0=4.0, t0=0.3,
                         radius=0.2),
             PointSource(position=(0.65, 0.5), f0=5.0, t0=0.25,
                         radius=0.2),
             PointSource(position=(0.5, 0.3), f0=6.0, t0=0.2,
                         radius=0.2)],
        dtype=jnp.float32)
    damp = jnp.asarray(sponge_mask(dm, [(0, "lo")], width=0.3),
                       jnp.float32)
    st = _state(dm, dm.dim)
    kw = dict(src=src, damp=damp, block=8, interpret=True,
              centroids=np.asarray(dm.coords.mean(axis=1)))
    run_f = UnstructuredUpwindRunner(p, w, dt, **kw)
    run_g = UnstructuredUpwindRunner(p, w, dt, fused_axpy=False, **kw)
    assert run_f.src_dense is None, "3 wavelet groups must force scatter"
    assert run_f.fused_axpy and not run_g.fused_axpy
    out_f, _ = run_f.run(st, 4)
    out_g, _ = run_g.run(st, 4)
    assert float(np.abs(np.asarray(out_f.u)).max()) > 0
    np.testing.assert_allclose(np.asarray(out_f.u), np.asarray(out_g.u),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_f.s), np.asarray(out_g.s),
                               rtol=2e-5, atol=2e-6)


def test_upwind_lane_u_panel_emit_matches_glue():
    """Producer-side panel emission (r5 gather lever): each stage kernel
    appends the own-face (u, traction) panels of its emitted state and
    the next stage gathers ONLY the nf lane takes.  Same config as the
    fused-vs-glue test (dense source group + sponge damp, scrambled
    mesh): emit == glue == fused to roundoff."""
    ext = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(
        _scramble(rect_mesh(5, 4), 7), 2,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(1, "hi")]))
    p = build_params(dm, MAT, dtype=jnp.float32)
    w = build_upwind_data(dm, MAT, dtype=jnp.float32)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.25)
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.5), f0=4.0, radius=0.25)],
        dtype=jnp.float32)
    damp = jnp.asarray(sponge_mask(dm, [(0, "lo")], width=0.3),
                       jnp.float32)
    st = _state(dm, dm.dim)
    rcv = build_receivers(dm, line((0.2, 0.8), (0.8, 0.8), 3),
                          dtype=jnp.float32)
    kw = dict(src=src, damp=damp, receivers=rcv, block=8, interpret=True,
              centroids=np.asarray(dm.coords.mean(axis=1)))
    run_e = UnstructuredUpwindRunner(p, w, dt, panel_emit=True, **kw)
    run_g = UnstructuredUpwindRunner(p, w, dt, fused_axpy=False, **kw)
    assert run_e.panel_emit and run_e.src_dense is not None
    out_e, seis_e = run_e.run(st, 4)
    out_g, seis_g = run_g.run(st, 4)
    np.testing.assert_allclose(np.asarray(out_e.u), np.asarray(out_g.u),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_e.s), np.asarray(out_g.s),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(seis_e), np.asarray(seis_g),
                               rtol=2e-5, atol=2e-6)


def test_upwind_lane_u_panel_emit_3d_resume():
    """3D emission path, no sources (the other gate branch), with the
    chunked-resume seam: panels re-seed from state at chunk entry, so
    run(2)+run(2) == run(4)."""
    ext = ((0.0, 1.0),) * 3
    dm = build_discrete(
        _scramble(box_mesh(3, 3, 3), 11), 2,
        bc_fn=absorbing_bc_fn(ext, free_sides=[(2, "hi")]))
    p = build_params(dm, MAT, dtype=jnp.float32)
    w = build_upwind_data(dm, MAT, dtype=jnp.float32)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.25)
    st = _state(dm, dm.dim)
    kw = dict(block=8, interpret=True,
              centroids=np.asarray(dm.coords.mean(axis=1)))
    run_e = UnstructuredUpwindRunner(p, w, dt, panel_emit=True, **kw)
    run_f = UnstructuredUpwindRunner(p, w, dt, **kw)
    out_e, _ = run_e.run(st, 4)
    out_f, _ = run_f.run(st, 4)
    np.testing.assert_allclose(np.asarray(out_e.u), np.asarray(out_f.u),
                               rtol=2e-5, atol=2e-6)
    mid, _ = run_e.run(st, 2)
    out_r, _ = run_e.run(mid, 2, step0=2)
    np.testing.assert_allclose(np.asarray(out_r.u), np.asarray(out_e.u),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_r.s), np.asarray(out_e.s),
                               rtol=2e-5, atol=2e-6)
