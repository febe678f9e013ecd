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
