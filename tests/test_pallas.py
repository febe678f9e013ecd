"""Pallas kernels vs einsum twins (SURVEY.md §6 rebuild test plan #4).

Interpret mode on CPU; the TPU bench harness re-validates on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
from seigen_tpu.ops import (
    Material,
    apply_stress_op,
    apply_vel_op,
    build_params,
    n_sig_for,
)
from seigen_tpu.ops.pallas_kernels import stress_op_pallas, vel_op_pallas

MAT = Material(rho=1.2, vp=2.0, vs=1.1)


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 3), (3, 2)])
def test_vel_op_matches_einsum(dim, degree):
    if dim == 2:
        dm = build_discrete(rect_mesh(5, 4, periodic=(0,)), degree)
    else:
        dm = build_discrete(box_mesh(2, 2, 2, periodic=(0, 1)), degree)
    p = build_params(dm, MAT, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(
        rng.normal(size=(dm.num_elements, dm.re.n_p, n_sig_for(dim))),
        dtype=jnp.float32,
    )
    ref = apply_vel_op(p, sig)
    out = vel_op_pallas(p, sig, block=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-4
    )


@pytest.mark.parametrize("dim,degree", [(2, 2), (3, 1), (3, 3)])
def test_stress_op_matches_einsum(dim, degree):
    if dim == 2:
        dm = build_discrete(rect_mesh(5, 4), degree)
    else:
        dm = build_discrete(box_mesh(2, 2, 2), degree)
    p = build_params(dm, MAT, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    u = jnp.asarray(
        rng.normal(size=(dm.num_elements, dm.re.n_p, dim)),
        dtype=jnp.float32,
    )
    ref = apply_stress_op(p, u)
    out = stress_op_pallas(p, u, block=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-4
    )
