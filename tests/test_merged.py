"""v3 exchange-in-kernel pipeline vs the v2 fused runner.

Covers: bounded 2D/3D with free+absorbing BCs, sources (field + trace
patch), damping (kernel-folded), receivers, per-class lane padding (block
sizes that do NOT divide NC — the constraint v3 lifts), and the padded
trace-layout seed.  The v2 runner is itself equivalence-tested against the
v1 lane runner and the einsum oracle (tests/test_fused.py), closing the
chain to the reference numerics (SURVEY.md §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.structured_exchange import detect_structured
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
from seigen_tpu.solver.lane_fused import FusedLaneRunner
from seigen_tpu.solver.lane_merged import MergedLaneRunner

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


def _compare(dm, block, n_steps=3, src=None, damp=None, rcv=None, degree=2,
             atol=2e-5):
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
    ref_runner = FusedLaneRunner(p, ex, dt, order=4, src=src, damp=damp,
                                 receivers=rcv, block=8, interpret=True)
    ref, seis_ref = ref_runner.run(st, n_steps)
    v3 = MergedLaneRunner(p, ex, dt, order=4, src=src, damp=damp,
                          receivers=rcv, block=block, interpret=True)
    out, seis = v3.run(st, n_steps)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=2e-4, atol=atol)
    np.testing.assert_allclose(
        np.asarray(out.s), np.asarray(ref.s), rtol=2e-4, atol=atol)
    if rcv is not None:
        np.testing.assert_allclose(seis, seis_ref, rtol=2e-4, atol=atol)
    return out


def _full_3d_case():
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
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo"), (1, "hi"),
                         (2, "lo")], width=0.3), jnp.float32)
    return dm, src, rcv, damp


def test_merged_bounded_3d_full_pipeline():
    dm, src, rcv, damp = _full_3d_case()
    _compare(dm, block=9, src=src, damp=damp, rcv=rcv)


def test_merged_lane_padding_3d():
    """block does NOT divide NC=27: per-class dead lanes exercised."""
    dm, src, rcv, damp = _full_3d_case()
    _compare(dm, block=8, src=src, damp=damp, rcv=rcv)


def test_merged_bounded_2d():
    ext = ((0.0, 1.0),) * 2
    dm = build_discrete(rect_mesh(4, 4),
                        2, bc_fn=absorbing_bc_fn(ext, free_sides=[(1, "hi")]))
    _compare(dm, block=8)


def test_merged_dense_injection_2d():
    """A blob source (one wavelet, many elements) must ride the
    kernel-fused dense-pattern injection path — vs the scatter-injecting
    fused reference."""
    ext = ((0.0, 1.0),) * 2
    dm = build_discrete(rect_mesh(8, 8),
                        2, bc_fn=absorbing_bc_fn(ext, free_sides=[(1, "hi")]))
    src = build_sources(
        dm, [PointSource(position=(0.5, 0.6), f0=4.0, radius=0.2)],
        dtype=jnp.float32)
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    dt = cfl_dt(dm.h.min(), 2.0, 2, 0.4)
    probe = MergedLaneRunner(p, ex, dt, order=4, src=src, block=8,
                             interpret=True)
    assert probe.src_dense is not None, "blob source must go dense"
    assert len(probe.src_dense) == 1  # one wavelet group
    _compare(dm, block=8, src=src, n_steps=2)


def test_merged_lane_padding_2d():
    ext = ((0.0, 1.0),) * 2
    dm = build_discrete(rect_mesh(4, 4),
                        2, bc_fn=absorbing_bc_fn(ext, free_sides=[(1, "hi")]))
    _compare(dm, block=5)


def test_merged_periodic_falls_back():
    """Periodic meshes don't satisfy the windowed-read constraints."""
    from seigen_tpu.ops.fused_kernels import build_fused_data
    from seigen_tpu.ops.merged_kernels import build_merged_plan

    dm = build_discrete(rect_mesh(4, 4, periodic=(0, 1)), 2)
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    d = build_fused_data(p)
    assert build_merged_plan(ex, d, 8) is None


def test_choose_block_padding():
    from seigen_tpu.ops.merged_kernels import choose_block

    assert choose_block(13824) == 768  # exact divisor
    # NC=64000 (E=384k): v2's chooser fell back to 512 (768 does not
    # divide); v3 pads 64000 -> 64512 (0.8% dead lanes) and keeps 768
    assert choose_block(64000) == 768
