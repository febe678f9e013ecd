"""P1 packed (two-elements-per-lane) layout vs the unpacked fused kernels.

The packed layout (FusedOpData n_par=2, ops/fused_kernels.py) reclaims the
half-dead npp=8 padding of P1 tiles: parity par = which element of the pair
occupies sublane rows par*4+i.  Physics is the SAME _vel2_body/_stress2_body
code — only the per-lane geometry/material broadcasts become per-row
operands via the one-hot gexp expansion — so equivalence against the
unpacked kernels (themselves einsum-twin-verified, tests/test_fused.py)
closes the chain to the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.fused_kernels import (
    build_fused_data,
    build_packed_fused_data,
    stress2_op,
    vel2_op,
)

MAT = Material(rho=1.0, vp=2.0, vs=1.0)


class PackLayout:
    """Host pack/unpack helpers for a given (p, pairing)."""

    def __init__(self, dm, p, du, dp, pair0, pair1):
        self.n_p, self.nf, self.nfp = dm.re.n_p, p.n_faces, p.n_fp
        self.E = dm.num_elements
        self.du, self.dp = du, dp
        self.pairs = (np.asarray(pair0), np.asarray(pair1))

    def to_lm_u(self, x, C):
        out = np.zeros((C * self.du.npp, self.E), np.float32)
        for c in range(C):
            out[c * self.du.npp : c * self.du.npp + self.n_p] = x[:, :, c].T
        return jnp.asarray(out)

    def tr_lm_u(self, t):
        C, ftq = t.shape[1], self.nf * self.nfp
        out = np.zeros((C * self.du.ftpp, self.E), np.float32)
        for c in range(C):
            out[c * self.du.ftpp : c * self.du.ftpp + ftq] = t[:, c, :].T
        return jnp.asarray(out)

    def to_lm_p(self, x, C):
        B = self.E // 2
        out = np.zeros((C * 8, B), np.float32)
        for c in range(C):
            for par, pe in enumerate(self.pairs):
                out[c * 8 + par * 4 : c * 8 + par * 4 + self.n_p] = (
                    x[pe][:, :, c].T)
        return jnp.asarray(out)

    def tr_lm_p(self, t):
        C, ftq, B = t.shape[1], self.nf * self.nfp, self.E // 2
        out = np.zeros((C * self.dp.ftpp, B), np.float32)
        for c in range(C):
            for par, pe in enumerate(self.pairs):
                out[c * self.dp.ftpp + par * ftq
                    : c * self.dp.ftpp + (par + 1) * ftq] = t[pe][:, c, :].T
        return jnp.asarray(out)

    def un_p(self, y, C):
        out = np.zeros((self.E, self.n_p, C), np.float32)
        y = np.asarray(y)
        for c in range(C):
            for par, pe in enumerate(self.pairs):
                out[pe, :, c] = (
                    y[c * 8 + par * 4 : c * 8 + par * 4 + self.n_p].T)
        return out

    def un_trp(self, y, C):
        ftq = self.nf * self.nfp
        out = np.zeros((self.E, C, ftq), np.float32)
        y = np.asarray(y)
        for c in range(C):
            for par, pe in enumerate(self.pairs):
                out[pe, c, :] = (
                    y[c * self.dp.ftpp + par * ftq
                      : c * self.dp.ftpp + (par + 1) * ftq].T)
        return out

    def un_u(self, y, C):
        y = np.asarray(y)
        return np.stack(
            [y[c * self.du.npp : c * self.du.npp + self.n_p].T
             for c in range(C)], -1)

    def un_tru(self, y, C):
        y, ftq = np.asarray(y), self.nf * self.nfp
        return np.stack(
            [y[c * self.du.ftpp : c * self.du.ftpp + ftq].T
             for c in range(C)], 1)


@pytest.mark.parametrize("dim", [2, 3])
def test_packed_ops_match_unpacked(dim):
    dm = build_discrete(box_mesh(2, 2, 2) if dim == 3 else rect_mesh(4, 4),
                        1)
    p = build_params(dm, MAT, dtype=jnp.float32)
    E, n_p = dm.num_elements, dm.re.n_p
    n_sig = 6 if dim == 3 else 3
    du = build_fused_data(p)
    pair0, pair1 = np.arange(0, E, 2), np.arange(1, E, 2)
    dp = build_packed_fused_data(p, pair0, pair1)
    L = PackLayout(dm, p, du, dp, pair0, pair1)
    B = E // 2
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((E, n_p, n_sig)).astype(np.float32)
    u = rng.standard_normal((E, n_p, dim)).astype(np.float32)
    trt = rng.standard_normal((E, dim, p.n_faces * p.n_fp)).astype(
        np.float32)

    ou, tu = vel2_op(du, L.to_lm_u(sig, n_sig), L.tr_lm_u(trt), block=E,
                     interpret=True)
    op_, tp = vel2_op(dp, L.to_lm_p(sig, n_sig), L.tr_lm_p(trt), block=B,
                      interpret=True)
    np.testing.assert_allclose(L.un_p(op_, dim), L.un_u(ou, dim),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(L.un_trp(tp, dim), L.un_tru(tu, dim),
                               rtol=2e-5, atol=2e-5)

    tru = rng.standard_normal((E, dim, p.n_faces * p.n_fp)).astype(
        np.float32)
    os_, ts = stress2_op(du, L.to_lm_u(u, dim), L.tr_lm_u(tru), block=E,
                         interpret=True)
    osp, tsp = stress2_op(dp, L.to_lm_p(u, dim), L.tr_lm_p(tru), block=B,
                          interpret=True)
    np.testing.assert_allclose(L.un_p(osp, n_sig), L.un_u(os_, n_sig),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(L.un_trp(tsp, dim), L.un_tru(ts, dim),
                               rtol=2e-5, atol=2e-5)


def test_packed_rejects_high_degree():
    dm = build_discrete(rect_mesh(2, 2), 2)
    p = build_params(dm, MAT, dtype=jnp.float32)
    with pytest.raises(ValueError):
        build_packed_fused_data(p, np.array([0]), np.array([1]))


# --- packed merged runner (exchange-in-kernel) vs the unpacked engine ---

from seigen_tpu.ops.structured_exchange import detect_structured  # noqa: E402
from seigen_tpu.solver import (  # noqa: E402
    PointSource,
    State,
    absorbing_bc_fn,
    build_receivers,
    build_sources,
    cfl_dt,
    line,
    sponge_mask,
)
from seigen_tpu.solver.lane_merged import MergedLaneRunner  # noqa: E402


def _case(dim, full):
    if dim == 3:
        ext = ((0.0, 1.0),) * 3
        dm = build_discrete(
            box_mesh(2, 2, 2), 1,
            bc_fn=absorbing_bc_fn(ext, free_sides=[(2, "hi")])
            if full else None)
        src = build_sources(
            dm, [PointSource(position=(0.5, 0.5, 0.7), f0=4.0,
                             radius=0.25)], dtype=jnp.float32)
        rcv = build_receivers(
            dm, line((0.2, 0.5, 0.9), (0.8, 0.5, 0.9), 3),
            dtype=jnp.float32)
    else:
        ext = ((0.0, 1.0),) * 2
        dm = build_discrete(
            rect_mesh(4, 4), 1,
            bc_fn=absorbing_bc_fn(ext, free_sides=[(1, "hi")])
            if full else None)
        src = build_sources(
            dm, [PointSource(position=(0.5, 0.6), f0=4.0, radius=0.2)],
            dtype=jnp.float32)
        rcv = build_receivers(dm, line((0.2, 0.9), (0.8, 0.9), 3),
                              dtype=jnp.float32)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi")], width=0.3), jnp.float32)
    return dm, src, rcv, damp


@pytest.mark.parametrize("dim,full", [(2, False), (3, False), (2, True),
                                      (3, True)])
def test_packed_merged_runner(dim, full):
    """Packed (two-elements-per-lane) merged runner == unpacked merged
    runner, bare and with the full production feature set (mixed BCs,
    kernel-fused dense source injection, sponge damping, receivers)."""
    dm, src, rcv, damp = _case(dim, full)
    p = build_params(dm, MAT, dtype=jnp.float32)
    ex = detect_structured(dm)
    assert ex is not None and ex.m % 2 == 0
    dt = cfl_dt(dm.h.min(), 2.0, 1, 0.4)
    E, n_p = dm.num_elements, dm.re.n_p
    n_sig = 3 if dim == 2 else 6
    rng = np.random.default_rng(7)
    st = State(
        u=jnp.asarray(rng.standard_normal((E, n_p, dim)) * 0.01,
                      jnp.float32),
        s=jnp.asarray(rng.standard_normal((E, n_p, n_sig)) * 0.01,
                      jnp.float32),
    )
    kw = (dict(src=src, damp=damp, receivers=rcv) if full else {})
    ref = MergedLaneRunner(p, ex, dt, order=4, block=8, interpret=True,
                           **kw)
    out_r, seis_r = ref.run(st, 4)
    pk = MergedLaneRunner(p, ex, dt, order=4, block=8, interpret=True,
                          packed=True, **kw)
    assert pk.plan.n_par == 2 and pk.plan.m == ex.m // 2
    out_p, seis_p = pk.run(st, 4)
    np.testing.assert_allclose(np.asarray(out_p.u), np.asarray(out_r.u),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p.s), np.asarray(out_r.s),
                               rtol=2e-4, atol=2e-5)
    if full:
        assert pk.src_dense is not None  # kernel-fused injection active
        np.testing.assert_allclose(seis_p, seis_r, rtol=2e-4, atol=2e-5)
