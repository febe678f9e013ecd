"""Packed P1 velocity kernel (bench/p1_pack_probe) vs the production v2
kernel: exact same physics on the 2-elements-per-tile layout."""

import jax.numpy as jnp
import numpy as np

from seigen_tpu.bench.p1_pack_probe import (
    build_packed_vel_data, pack_state, pack_traces, packed_vel_op,
    unpack_state)
from seigen_tpu.mesh import box_mesh, build_discrete
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.fused_kernels import build_fused_data, vel2_op


def test_packed_vel_matches_v2():
    dm = build_discrete(box_mesh(2, 2, 2), 1)
    p = build_params(dm, Material(rho=1.1, vp=2.0, vs=1.0),
                     dtype=jnp.float32)
    E = dm.num_elements
    d = build_fused_data(p)
    tables = build_packed_vel_data(p)
    rng = np.random.default_rng(3)
    sig = rng.standard_normal((E, 4, 6)).astype(np.float32)
    trc = rng.standard_normal((E, 3, 12)).astype(np.float32)

    sig_lm = np.zeros((6 * 8, E), np.float32)
    for c in range(6):
        sig_lm[c * 8 : c * 8 + 4] = sig[:, :, c].T
    tr_lm = np.zeros((3 * 16, E), np.float32)
    for c in range(3):
        tr_lm[c * 16 : c * 16 + 12] = trc[:, c, :].T

    uA, toA = vel2_op(d, jnp.asarray(sig_lm), jnp.asarray(tr_lm),
                      block=8, interpret=True)
    uB, toB = packed_vel_op(tables, jnp.asarray(pack_state(sig, 4)),
                            jnp.asarray(pack_traces(trc)),
                            block=8, interpret=True)

    u_a = np.stack([np.asarray(uA)[c * 8 : c * 8 + 4].T for c in range(3)],
                   axis=2)
    u_b = unpack_state(np.asarray(uB), 4, 3, E)
    np.testing.assert_allclose(u_b, u_a, rtol=2e-5, atol=2e-5)

    to_a = np.stack(
        [np.asarray(toA)[c * 16 : c * 16 + 12].T for c in range(3)], axis=1)
    to_b = np.zeros((E, 3, 12), np.float32)
    tob = np.asarray(toB)
    for c in range(3):
        for par in range(2):
            to_b[par::2, c, :] = (
                tob[c * 24 + par * 12 : c * 24 + (par + 1) * 12].T)
    np.testing.assert_allclose(to_b, to_a, rtol=2e-5, atol=2e-5)
