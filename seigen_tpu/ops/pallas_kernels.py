"""Pallas TPU kernels for the hot elastic operators (SURVEY.md §9.2 step 7).

Rebuild of the reference's generated-C element kernels (TSFC/COFFEE output,
~95% of runtime there).  Each operator application fuses, inside one VMEM
pass per element block:

    reference-derivative matmuls -> inverse-Jacobian contraction ->
    div/Hooke recombination -> numerical flux at face nodes -> LIFT matmul
    -> material scaling

eliminating the HBM round-trips of the (E, dim, n_p, C) intermediates that
the XLA einsum path materializes.  The neighbour-trace gather stays in XLA
(it is pure data movement); the kernel consumes pre-gathered traces.

Every kernel has its einsum twin (ops/elastic.py) as correctness oracle:
tests/test_pallas.py checks elementwise agreement in interpret mode on CPU
and the TPU benchmark harness re-checks on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .elastic import ElasticParams, voigt_map

DEFAULT_BLOCK = 128


def _pad_to(x, multiple, axis=0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _restriction_matrix(p: ElasticParams, dtype) -> jax.Array:
    """(nf*nfp, n_p) 0/1 matrix selecting face-node traces (own side)."""
    fn = np.array(p.fnodes).reshape(-1)
    R = np.zeros((len(fn), p.n_p), dtype=np.float32)
    R[np.arange(len(fn)), fn] = 1.0
    return jnp.asarray(R, dtype=dtype)


def _gather_traces(p: ElasticParams, field: jax.Array) -> jax.Array:
    """(E, nf*nfp, C) neighbour traces via the precomputed index array."""
    flat = field.reshape((-1,) + field.shape[2:])
    return flat[p.nbr].reshape(field.shape[0], p.n_faces * p.n_fp, -1)


def _vel_kernel(dim, n_p, n_faces, n_fp, n_sig,
                sig_ref, tr_ref, ginv_ref, fsc_ref, nrm_ref, irho_ref,
                beta_ref, dr_ref, lift_ref, rmat_ref, out_ref):
    V = voigt_map(dim)
    sig = sig_ref[:]  # (B, n_p, ns)
    # derivatives in reference coords: der[b, r, i, c]
    der = jnp.einsum("rij,bjc->bric", dr_ref[:], sig,
                     preferred_element_type=jnp.float32)
    # physical: dphys[b, d, i, c] = sum_r ginv[b, r, d] der[b, r, i, c]
    dphys = jnp.einsum("brd,bric->bdic", ginv_ref[:], der,
                       preferred_element_type=jnp.float32)
    div = jnp.stack(
        [sum(dphys[:, d, :, V[c, d]] for d in range(dim))
         for c in range(dim)],
        axis=-1,
    )  # (B, n_p, dim)

    # own traces via the 0/1 restriction matrix (static gathers are not
    # expressible in-kernel; a (nf*nfp, n_p) matmul is)
    own = jnp.einsum("mi,bic->bmc", rmat_ref[:], sig,
                     preferred_element_type=jnp.float32).reshape(
        sig.shape[0], n_faces, n_fp, n_sig)
    nbr = tr_ref[:].reshape(sig.shape[0], n_faces, n_fp, n_sig)
    nrm = nrm_ref[:][:, :, None, :]  # (B, nf, 1, dim)
    t_own = jnp.stack(
        [sum(nrm[..., d] * own[..., V[c, d]] for d in range(dim))
         for c in range(dim)], axis=-1)
    t_nbr = jnp.stack(
        [sum(nrm[..., d] * nbr[..., V[c, d]] for d in range(dim))
         for c in range(dim)], axis=-1)
    jump = 0.5 * t_nbr + beta_ref[:][:, :, None, None] * t_own
    flux = jump * fsc_ref[:][:, :, None, None]  # (B, nf, nfp, dim)
    surf = jnp.einsum(
        "im,bmc->bic", lift_ref[:],
        flux.reshape(sig.shape[0], n_faces * n_fp, dim),
        preferred_element_type=jnp.float32)
    out_ref[:] = irho_ref[:][:, :, None] * (div + surf)


def _stress_kernel(dim, n_p, n_faces, n_fp, n_sig,
                   u_ref, tr_ref, ginv_ref, fsc_ref, nrm_ref, lam_ref,
                   mu_ref, delta_ref, dr_ref, lift_ref, rmat_ref, out_ref):
    u = u_ref[:]  # (B, n_p, dim)
    der = jnp.einsum("rij,bjc->bric", dr_ref[:], u,
                     preferred_element_type=jnp.float32)
    grad = jnp.einsum("brd,bric->bdic", ginv_ref[:], der,
                      preferred_element_type=jnp.float32)
    lam = lam_ref[:][:, :]  # (B, 1)
    mu = mu_ref[:][:, :]
    divu = sum(grad[:, d, :, d] for d in range(dim))  # (B, n_p)
    comps = []
    for c in range(dim):
        comps.append(lam * divu + 2.0 * mu * grad[:, c, :, c])
    if dim == 2:
        comps.append(mu * (grad[:, 1, :, 0] + grad[:, 0, :, 1]))
    else:
        comps.append(mu * (grad[:, 2, :, 1] + grad[:, 1, :, 2]))
        comps.append(mu * (grad[:, 2, :, 0] + grad[:, 0, :, 2]))
        comps.append(mu * (grad[:, 1, :, 0] + grad[:, 0, :, 1]))
    vol = jnp.stack(comps, axis=-1)  # (B, n_p, n_sig)

    own = jnp.einsum("mi,bic->bmc", rmat_ref[:], u,
                     preferred_element_type=jnp.float32).reshape(
        u.shape[0], n_faces, n_fp, dim)
    nbr = tr_ref[:].reshape(u.shape[0], n_faces, n_fp, dim)
    du = 0.5 * nbr + delta_ref[:][:, :, None, None] * own
    nrm = nrm_ref[:][:, :, None, :]
    lamf = lam[:, :, None]
    muf = mu[:, :, None]
    ndu = sum(nrm[..., d] * du[..., d] for d in range(dim))
    fcomps = []
    for c in range(dim):
        fcomps.append(lamf * ndu + 2.0 * muf * nrm[..., c] * du[..., c])
    if dim == 2:
        fcomps.append(muf * (nrm[..., 0] * du[..., 1]
                             + nrm[..., 1] * du[..., 0]))
    else:
        fcomps.append(muf * (nrm[..., 1] * du[..., 2]
                             + nrm[..., 2] * du[..., 1]))
        fcomps.append(muf * (nrm[..., 0] * du[..., 2]
                             + nrm[..., 2] * du[..., 0]))
        fcomps.append(muf * (nrm[..., 0] * du[..., 1]
                             + nrm[..., 1] * du[..., 0]))
    face = jnp.stack(fcomps, axis=-1) * fsc_ref[:][:, :, None, None]
    surf = jnp.einsum(
        "im,bmc->bic", lift_ref[:],
        face.reshape(u.shape[0], n_faces * n_fp, n_sig),
        preferred_element_type=jnp.float32)
    out_ref[:] = vol + surf


def _block_specs(block, shapes):
    """Element-blocked in_specs: each array blocked on axis 0."""
    specs = []
    for s in shapes:
        bs = (block,) + s[1:]
        specs.append(
            pl.BlockSpec(bs, lambda i, _n=len(s): (i,) + (0,) * (_n - 1),
                         memory_space=pltpu.VMEM)
        )
    return specs


def _rep_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def vel_op_pallas(p: ElasticParams, sigma: jax.Array,
                  block: int = DEFAULT_BLOCK,
                  interpret: bool = False) -> jax.Array:
    """Pallas twin of ops.elastic.apply_vel_op (single-chip gather)."""
    E = sigma.shape[0]
    traces = _gather_traces(p, sigma)
    rmat = _restriction_matrix(p, sigma.dtype)

    args = (
        _pad_to(sigma, block),
        _pad_to(traces, block),
        _pad_to(p.Ginv, block),
        _pad_to(p.Fscale, block),
        _pad_to(p.normals, block),
        _pad_to(p.inv_rho[:, None], block),
        _pad_to(p.beta_t, block),
    )
    E_pad = args[0].shape[0]
    grid = (E_pad // block,)
    kernel = functools.partial(
        _vel_kernel, p.dim, p.n_p, p.n_faces, p.n_fp, p.n_sig)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E_pad, p.n_p, p.dim), sigma.dtype),
        grid=grid,
        in_specs=_block_specs(block, [a.shape for a in args])
        + [_rep_spec(p.Dr.shape), _rep_spec(p.LIFT.shape),
           _rep_spec(rmat.shape)],
        out_specs=pl.BlockSpec((block, p.n_p, p.dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args, p.Dr, p.LIFT, rmat)
    return out[:E]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def stress_op_pallas(p: ElasticParams, u: jax.Array,
                     block: int = DEFAULT_BLOCK,
                     interpret: bool = False) -> jax.Array:
    """Pallas twin of ops.elastic.apply_stress_op (single-chip gather)."""
    E = u.shape[0]
    traces = _gather_traces(p, u)
    rmat = _restriction_matrix(p, u.dtype)

    args = (
        _pad_to(u, block),
        _pad_to(traces, block),
        _pad_to(p.Ginv, block),
        _pad_to(p.Fscale, block),
        _pad_to(p.normals, block),
        _pad_to(p.lam[:, None], block),
        _pad_to(p.mu[:, None], block),
        _pad_to(p.delta_u, block),
    )
    E_pad = args[0].shape[0]
    grid = (E_pad // block,)
    kernel = functools.partial(
        _stress_kernel, p.dim, p.n_p, p.n_faces, p.n_fp, p.n_sig)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E_pad, p.n_p, p.n_sig), u.dtype),
        grid=grid,
        in_specs=_block_specs(block, [a.shape for a in args])
        + [_rep_spec(p.Dr.shape), _rep_spec(p.LIFT.shape),
           _rep_spec(rmat.shape)],
        out_specs=pl.BlockSpec((block, p.n_p, p.n_sig), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args, p.Dr, p.LIFT, rmat)
    return out[:E]
