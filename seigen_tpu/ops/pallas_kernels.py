"""Pallas TPU kernels for the hot elastic operators (SURVEY.md §9.2 step 7).

Rebuild of the reference's generated-C element kernels (TSFC/COFFEE output —
the hot ~95% of the reference's runtime).  Each operator application fuses,
inside one VMEM pass per element block:

    reference-derivative matmuls -> inverse-Jacobian contraction ->
    div/Hooke recombination -> numerical flux at face nodes -> LIFT matmul
    -> material scaling

eliminating the HBM round-trips of the (E, dim, n_p, C) intermediates that
the XLA einsum path materializes.

Layout: everything inside the kernel is strictly 2-D with the ELEMENT axis on
the 128-wide lane dimension — ``(rows, B)`` tiles where rows are
sublane-aligned blocks of nodal/face values per field component.  This is the
classic spectral-element "fields-first, elements-last" TPU layout: every
contraction is a plain (rows_out, rows_in) @ (rows_in, B) matmul and every
pointwise op is lane-parallel, so Mosaic never sees a >2-D reshape (which it
cannot lower).  Static per-component row offsets are padded to multiples of 8
sublanes.

The neighbour-trace gather stays in XLA (pure data movement); transposes
between the solver's (E, n_p, C) layout and the kernel layout are handled in
the wrappers.  Geometry rows are pre-expanded to face-node resolution once in
``PallasOpData`` so the kernel does no broadcasting across faces.

Correctness oracle: the einsum twins in ops/elastic.py
(tests/test_pallas.py, interpret mode; the TPU perf probe re-checks on
hardware).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .elastic import ElasticParams, voigt_map

DEFAULT_BLOCK = 256


def _rup(x, m=8):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["dr", "lift", "rmat", "drr", "ginv", "nrm", "fsc", "beta",
                 "delta", "irho", "lam", "mu"],
    meta_fields=["dim", "n_p", "npp", "ftp", "ftpp", "n_sig", "E"],
)
@dataclass(frozen=True)
class PallasOpData:
    """Transposed + padded operator data for the lane-major kernels."""

    dr: jax.Array  # (dim*npp, npp) stacked derivative matrices
    lift: jax.Array  # (npp, ftpp)
    rmat: jax.Array  # (ftpp, npp) own-trace restriction
    drr: jax.Array  # (dim*npp + ftpp, npp): [dr; rmat] — one matmul per
    # component covers all derivatives AND the own-face trace (wider M dim
    # for better MXU utilization)
    ginv: jax.Array  # (dim*dim, E) rows r*dim+d
    nrm: jax.Array  # (dim*ftpp, E) face-node-expanded normals
    fsc: jax.Array  # (ftpp, E) face-node-expanded Fscale
    beta: jax.Array  # (ftpp, E) expanded traction-jump coefficient
    delta: jax.Array  # (ftpp, E) expanded velocity-jump coefficient
    irho: jax.Array  # (8, E) row 0 = 1/rho
    lam: jax.Array  # (8, E) row 0 = lambda
    mu: jax.Array  # (8, E) row 0 = mu
    dim: int
    n_p: int
    npp: int  # n_p padded to 8
    ftp: int  # n_faces * n_fp
    ftpp: int  # padded
    n_sig: int
    E: int


# Keyed by id(p) BUT validated by a weakref to the exact params object:
# a plain id-keyed dict can silently serve stale tables when a params
# object is garbage-collected and a new one reuses its address (common in
# sweep loops).  The weakref callback evicts dead entries; the identity
# check rejects id-reuse.
_OPDATA_CACHE: dict[int, tuple] = {}


def build_pallas_data(p: ElasticParams) -> PallasOpData:
    import weakref

    key = id(p)
    hit = _OPDATA_CACHE.get(key)
    if hit is not None and hit[0]() is p:
        return hit[1]
    dim, n_p = p.dim, p.n_p
    npp = _rup(n_p)
    ftp = p.n_faces * p.n_fp
    ftpp = _rup(ftp)
    E = p.Ginv.shape[0]
    dt = p.Ginv.dtype

    # Host tables assembled in f64 and cast to the params dtype at the
    # end: with f64 params (the test suite, adjoint exactness checks)
    # an f32 intermediate would truncate the tables.
    Dr = np.zeros((dim * npp, npp), dtype=np.float64)
    for r in range(dim):
        Dr[r * npp : r * npp + n_p, :n_p] = np.asarray(p.Dr[r])
    LIFT = np.zeros((npp, ftpp), dtype=np.float64)
    LIFT[:n_p, :ftp] = np.asarray(p.LIFT)
    fn = np.array(p.fnodes).reshape(-1)
    R = np.zeros((ftpp, npp), dtype=np.float64)
    R[np.arange(ftp), fn] = 1.0

    # expand per-face geometry to face-node rows (f*n_fp + k ordering)
    rep = np.repeat(np.arange(p.n_faces), p.n_fp)

    def expand(a):  # (E, n_faces) -> (ftpp, E)
        out = np.zeros((ftpp, E), dtype=np.float64)
        out[:ftp] = np.asarray(a)[:, rep].T
        return out

    nrm = np.zeros((dim * ftpp, E), dtype=np.float64)
    for d in range(dim):
        nrm[d * ftpp : d * ftpp + ftp] = np.asarray(
            p.normals[:, :, d])[:, rep].T

    def scalar_rows(a):  # (E,) -> (8, E)
        out = np.zeros((8, E), dtype=np.float64)
        out[0] = np.asarray(a)
        return out

    data = PallasOpData(
        dr=jnp.asarray(Dr, dt),
        lift=jnp.asarray(LIFT, dt),
        rmat=jnp.asarray(R, dt),
        drr=jnp.asarray(np.concatenate([Dr, R], axis=0), dt),
        ginv=jnp.asarray(
            np.asarray(p.Ginv).transpose(1, 2, 0).reshape(dim * dim, E), dt),
        nrm=jnp.asarray(nrm, dt),
        fsc=jnp.asarray(expand(p.Fscale), dt),
        beta=jnp.asarray(expand(p.beta_t), dt),
        delta=jnp.asarray(expand(p.delta_u), dt),
        irho=jnp.asarray(scalar_rows(p.inv_rho), dt),
        lam=jnp.asarray(scalar_rows(p.lam), dt),
        mu=jnp.asarray(scalar_rows(p.mu), dt),
        dim=dim,
        n_p=n_p,
        npp=npp,
        ftp=ftp,
        ftpp=ftpp,
        n_sig=p.n_sig,
        E=E,
    )
    _OPDATA_CACHE[key] = (
        weakref.ref(p, lambda _, k=key: _OPDATA_CACHE.pop(k, None)),
        data,
    )
    return data


def _to_lane_major(x: jax.Array, rows_pad: int, block: int) -> jax.Array:
    """(E, m, C) -> (C*rows_pad, E_pad): component-major padded rows."""
    E, m, C = x.shape
    E_pad = _rup(E, block)
    out = jnp.zeros((C * rows_pad, E_pad), dtype=x.dtype)
    xt = x.transpose(2, 1, 0)  # (C, m, E)
    for c in range(C):
        out = out.at[c * rows_pad : c * rows_pad + m, :E].set(xt[c])
    return out


def _from_lane_major(y: jax.Array, m: int, rows_pad: int, C: int,
                     E: int) -> jax.Array:
    """(C*rows_pad, E_pad) -> (E, m, C)."""
    parts = [y[c * rows_pad : c * rows_pad + m, :E] for c in range(C)]
    return jnp.stack(parts, axis=0).transpose(2, 1, 0)


def _pad_lanes(x, block):
    E = x.shape[1]
    E_pad = _rup(E, block)
    if E_pad == E:
        return x
    return jnp.pad(x, ((0, 0), (0, E_pad - E)))


def _dot(a, b):
    # f32 accumulation for f32/bf16 inputs (the TPU MXU path); f64 inputs
    # (interpret-mode exactness tests, adjoint transpose checks) keep f64.
    pet = a.dtype if a.dtype == jnp.float64 else jnp.float32
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=pet)


def _vel_kernel(dim, n_sig, npp, ftpp,
                sig_ref, tr_ref, ginv_ref, nrm_ref, fsc_ref, beta_ref,
                irho_ref, drr_ref, lift_ref, out_ref):
    V = voigt_map(dim)
    # one combined [derivatives; own-trace] matmul per Voigt component
    # (drr_ref = [Dr-stack; RMAT]: wider M dim, better MXU utilization)
    der = [[None] * n_sig for _ in range(dim)]
    own = [None] * n_sig
    for c in range(n_sig):
        Xc = sig_ref[c * npp : (c + 1) * npp, :]  # (npp, B)
        combo = _dot(drr_ref[:], Xc)
        for r in range(dim):
            der[r][c] = combo[r * npp : (r + 1) * npp, :]
        own[c] = combo[dim * npp :, :]  # (ftpp, B)

    # physical divergence rows per velocity component
    irho = irho_ref[0:1, :]  # (1, B)
    for cout in range(dim):
        div = None
        for d in range(dim):
            for r in range(dim):
                g = ginv_ref[r * dim + d : r * dim + d + 1, :]  # (1, B)
                term = g * der[r][V[cout, d]]
                div = term if div is None else div + term
        # traction jump flux
        t_own = None
        t_nbr = None
        for d in range(dim):
            nd = nrm_ref[d * ftpp : (d + 1) * ftpp, :]  # (ftpp, B)
            c_sig = V[cout, d]
            o = nd * own[c_sig]
            nb = nd * tr_ref[c_sig * ftpp : (c_sig + 1) * ftpp, :]
            t_own = o if t_own is None else t_own + o
            t_nbr = nb if t_nbr is None else t_nbr + nb
        jump = 0.5 * t_nbr + beta_ref[:] * t_own
        surf = _dot(lift_ref[:], jump * fsc_ref[:])  # (npp, B)
        out_ref[cout * npp : (cout + 1) * npp, :] = irho * (div + surf)


def _vel_kernel_trac(dim, n_sig, npp, ftpp,
                     sig_ref, tr_ref, ginv_ref, nrm_ref, fsc_ref, beta_ref,
                     irho_ref, drr_ref, lift_ref, out_ref):
    """Velocity kernel consuming PRE-CONTRACTED neighbour tractions.

    tr_ref holds t_nbr = n_consumer . sigma_nbr directly (dim*ftpp rows
    instead of n_sig*ftpp): the unstructured exchange contracts on the
    producer side and sign-flips (consumer normal = -producer normal),
    halving the sigma-exchange volume — same trick as the fused v2
    pipeline (ops/fused_kernels.py item 1).
    """
    V = voigt_map(dim)
    der = [[None] * n_sig for _ in range(dim)]
    own = [None] * n_sig
    for c in range(n_sig):
        Xc = sig_ref[c * npp : (c + 1) * npp, :]
        combo = _dot(drr_ref[:], Xc)
        for r in range(dim):
            der[r][c] = combo[r * npp : (r + 1) * npp, :]
        own[c] = combo[dim * npp :, :]

    irho = irho_ref[0:1, :]
    for cout in range(dim):
        div = None
        for d in range(dim):
            for r in range(dim):
                g = ginv_ref[r * dim + d : r * dim + d + 1, :]
                term = g * der[r][V[cout, d]]
                div = term if div is None else div + term
        t_own = None
        for d in range(dim):
            nd = nrm_ref[d * ftpp : (d + 1) * ftpp, :]
            o = nd * own[V[cout, d]]
            t_own = o if t_own is None else t_own + o
        t_nbr = tr_ref[cout * ftpp : (cout + 1) * ftpp, :]
        jump = 0.5 * t_nbr + beta_ref[:] * t_own
        surf = _dot(lift_ref[:], jump * fsc_ref[:])
        out_ref[cout * npp : (cout + 1) * npp, :] = irho * (div + surf)


def _select_tiles(panels_ref, combo_ref, sign_ref, selcfg):
    """Assemble consumer traces (C*ftpp, B) from RAW gathered panels.

    The unstructured exchange's (f2, pi)-select runs HERE, in VMEM, on the
    per-face lane-take panels — instead of as separate XLA passes with an
    HBM round-trip of the assembled trace array (measured ~0.8-1.3 ms per
    exchange at E=83k).  selcfg = (C, nf, nfp, ftp, ftpp, rows_pad,
    face_combos, perms) — all static.
    """
    import jax.numpy as jnp

    C, nf, nfp, ftp, ftpp, rows_pad, face_combos, perms = selcfg
    G = len(perms)
    tiles = []
    for f in range(nf):
        base = f * rows_pad
        code_lane = combo_ref[f : f + 1, :]
        acc = None
        for code in face_combos[f]:
            g, pp = divmod(int(code), G)
            rows = []
            for c in range(C):
                r0 = base + c * ftp + g * nfp
                perm = perms[pp]
                if tuple(perm) == tuple(range(nfp)):
                    rows.append(panels_ref[r0 : r0 + nfp, :])
                else:
                    rows.extend(
                        panels_ref[r0 + int(perm[k]) : r0 + int(perm[k])
                                   + 1, :]
                        for k in range(nfp))
            view = (rows[0] if len(rows) == 1
                    else jnp.concatenate(rows, axis=0))  # (C*nfp, B)
            acc = (view if acc is None
                   else jnp.where(code_lane == int(code), view, acc))
        if sign_ref is not None:
            acc = acc * sign_ref[f : f + 1, :]
        tiles.append(acc)
    B = tiles[0].shape[1]
    comps = []
    pad = (jnp.zeros((ftpp - nf * nfp, B), tiles[0].dtype)
           if ftpp != nf * nfp else None)
    for c in range(C):
        parts = [tiles[f][c * nfp : (c + 1) * nfp, :] for f in range(nf)]
        if pad is not None:
            parts.append(pad)
        comps.append(jnp.concatenate(parts, axis=0))
    return jnp.concatenate(comps, axis=0)


def _vel_kernel_trac_sel(dim, n_sig, npp, ftpp, selcfg,
                         sig_ref, panels_ref, combo_ref, sign_ref,
                         ginv_ref, nrm_ref, fsc_ref, beta_ref, irho_ref,
                         drr_ref, lift_ref, out_ref):
    tr = _select_tiles(panels_ref, combo_ref, sign_ref, selcfg)
    _vel_kernel_trac(dim, n_sig, npp, ftpp, sig_ref, tr, ginv_ref,
                     nrm_ref, fsc_ref, beta_ref, irho_ref, drr_ref,
                     lift_ref, out_ref)


def _stress_kernel_sel(dim, n_sig, npp, ftpp, selcfg,
                       u_ref, panels_ref, combo_ref,
                       ginv_ref, nrm_ref, fsc_ref, delta_ref,
                       lam_ref, mu_ref, drr_ref, lift_ref, out_ref):
    tr = _select_tiles(panels_ref, combo_ref, None, selcfg)
    _stress_kernel(dim, n_sig, npp, ftpp, u_ref, tr, ginv_ref, nrm_ref,
                   fsc_ref, delta_ref, lam_ref, mu_ref, drr_ref, lift_ref,
                   out_ref)


def _sel_op(kernel_fn, d, field_lm, panels, combo, sign, geo_arrays,
            out_rows, selcfg, block, interpret):
    geo = [_pad_lanes(x, block) for x in geo_arrays]
    E_pad = field_lm.shape[1]
    grid = (E_pad // block,)
    row_counts = [field_lm.shape[0], panels.shape[0], combo.shape[0]]
    args = [field_lm, panels, combo]
    if sign is not None:
        row_counts.append(sign.shape[0])
        args.append(sign)
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((out_rows, E_pad), field_lm.dtype),
        grid=grid,
        in_specs=_lane_specs(block, row_counts + [g.shape[0] for g in geo])
        + [_table_spec(d.drr.shape), _table_spec(d.lift.shape)],
        out_specs=pl.BlockSpec((out_rows, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args, *geo, d.drr, d.lift)


def vel_op_lm_trac_sel(d: PallasOpData, sig_lm, panels, combo, sign,
                       selcfg, block: int = DEFAULT_BLOCK,
                       interpret: bool = False) -> jax.Array:
    """vel_op_lm_trac with the (f2, pi)-select fused into the kernel:
    ``panels`` (nf*rows_pad, E_pad) raw traction lane-takes, ``combo``
    (8, E_pad) int32 per-face combo codes, ``sign`` (8, E_pad)."""
    kernel = functools.partial(_vel_kernel_trac_sel, d.dim, d.n_sig,
                               d.npp, d.ftpp, selcfg)
    return _sel_op(kernel, d, sig_lm, panels, combo, sign,
                   (d.ginv, d.nrm, d.fsc, d.beta, d.irho),
                   d.dim * d.npp, selcfg, block, interpret)


def stress_op_lm_sel(d: PallasOpData, u_lm, panels, combo,
                     selcfg, block: int = DEFAULT_BLOCK,
                     interpret: bool = False, cmat=None) -> jax.Array:
    """stress_op_lm with the u-trace (f2, pi)-select fused in-kernel.

    ``cmat`` (n_sig*8, E) lane rows (row c*8+k = Voigt C[c, k]) switches
    the in-kernel Hooke law to the general anisotropic contraction."""
    if cmat is not None:
        kernel = functools.partial(_stress_kernel_sel_c, d.dim, d.n_sig,
                                   d.npp, d.ftpp, selcfg)
        return _sel_op(kernel, d, u_lm, panels, combo, None,
                       (d.ginv, d.nrm, d.fsc, d.delta, cmat),
                       d.n_sig * d.npp, selcfg, block, interpret)
    kernel = functools.partial(_stress_kernel_sel, d.dim, d.n_sig,
                               d.npp, d.ftpp, selcfg)
    return _sel_op(kernel, d, u_lm, panels, combo, None,
                   (d.ginv, d.nrm, d.fsc, d.delta, d.lam, d.mu),
                   d.n_sig * d.npp, selcfg, block, interpret)


def vel_op_lm_trac(d: PallasOpData, sig_lm: jax.Array, tr_lm: jax.Array,
                   block: int = DEFAULT_BLOCK,
                   interpret: bool = False) -> jax.Array:
    """vel_op_lm variant taking (dim*ftpp, E_pad) traction traces."""
    geo = [_pad_lanes(x, block)
           for x in (d.ginv, d.nrm, d.fsc, d.beta, d.irho)]
    E_pad = sig_lm.shape[1]
    grid = (E_pad // block,)
    kernel = functools.partial(_vel_kernel_trac, d.dim, d.n_sig, d.npp,
                               d.ftpp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d.dim * d.npp, E_pad), sig_lm.dtype),
        grid=grid,
        in_specs=_lane_specs(
            block,
            [sig_lm.shape[0], tr_lm.shape[0]] + [g.shape[0] for g in geo],
        )
        + [_table_spec(d.drr.shape), _table_spec(d.lift.shape)],
        out_specs=pl.BlockSpec((d.dim * d.npp, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sig_lm, tr_lm, *geo, d.drr, d.lift)


def _stress_prelude(dim, npp, ftpp, u_ref, tr_ref, ginv_ref, nrm_ref,
                    delta_ref, drr_ref):
    """Shared front of the stress kernels: combined [derivatives;
    own-trace] matmul per velocity component, physical-gradient cache,
    velocity jump at face nodes, face normals."""
    der = [[None] * dim for _ in range(dim)]
    own = [None] * dim
    nbr = [None] * dim
    for c in range(dim):
        Xc = u_ref[c * npp : (c + 1) * npp, :]
        combo = _dot(drr_ref[:], Xc)
        for r in range(dim):
            der[r][c] = combo[r * npp : (r + 1) * npp, :]
        own[c] = combo[dim * npp :, :]
        nbr[c] = tr_ref[c * ftpp : (c + 1) * ftpp, :]

    # physical gradient grad[d][c] = du_c/dx_d
    def grad(d, c):
        out = None
        for r in range(dim):
            g = ginv_ref[r * dim + d : r * dim + d + 1, :]
            term = g * der[r][c]
            out = term if out is None else out + term
        return out

    gcache = {(d, c): grad(d, c) for d in range(dim) for c in range(dim)}
    du = [0.5 * nbr[c] + delta_ref[:] * own[c] for c in range(dim)]
    nd = [nrm_ref[d * ftpp : (d + 1) * ftpp, :] for d in range(dim)]
    return gcache, du, nd


def _stress_kernel(dim, n_sig, npp, ftpp,
                   u_ref, tr_ref, ginv_ref, nrm_ref, fsc_ref, delta_ref,
                   lam_ref, mu_ref, drr_ref, lift_ref, out_ref):
    gcache, du, nd = _stress_prelude(dim, npp, ftpp, u_ref, tr_ref,
                                     ginv_ref, nrm_ref, delta_ref, drr_ref)
    lam = lam_ref[0:1, :]
    mu = mu_ref[0:1, :]
    divu = sum(gcache[(d, d)] for d in range(dim))

    vol = []
    for c in range(dim):
        vol.append(lam * divu + 2.0 * mu * gcache[(c, c)])
    if dim == 2:
        vol.append(mu * (gcache[(1, 0)] + gcache[(0, 1)]))
    else:
        vol.append(mu * (gcache[(2, 1)] + gcache[(1, 2)]))
        vol.append(mu * (gcache[(2, 0)] + gcache[(0, 2)]))
        vol.append(mu * (gcache[(1, 0)] + gcache[(0, 1)]))

    ndu = sum(nd[d] * du[d] for d in range(dim))
    face = []
    for c in range(dim):
        face.append(lam * ndu + 2.0 * mu * nd[c] * du[c])
    if dim == 2:
        face.append(mu * (nd[0] * du[1] + nd[1] * du[0]))
    else:
        face.append(mu * (nd[1] * du[2] + nd[2] * du[1]))
        face.append(mu * (nd[0] * du[2] + nd[2] * du[0]))
        face.append(mu * (nd[0] * du[1] + nd[1] * du[0]))

    for c in range(n_sig):
        surf = _dot(lift_ref[:], face[c] * fsc_ref[:])
        out_ref[c * npp : (c + 1) * npp, :] = vol[c] + surf


def _stress_kernel_c(dim, n_sig, npp, ftpp,
                     u_ref, tr_ref, ginv_ref, nrm_ref, fsc_ref, delta_ref,
                     cmat_ref, drr_ref, lift_ref, out_ref):
    """General anisotropic Hooke law C : sym(a (x) b) (engineering Voigt
    strains, ops/anisotropic.py conventions): cmat_ref holds n_sig
    8-row sections, row c*8+k = C[c, k] per lane — the lane analog of the
    fused v2/v3 kernels' stiffness extension (ops/fused_kernels.py)."""
    from .anisotropic import _voigt_strain_pair

    gcache, du, nd = _stress_prelude(dim, npp, ftpp, u_ref, tr_ref,
                                     ginv_ref, nrm_ref, delta_ref, drr_ref)
    pairs = _voigt_strain_pair(dim)

    def crow(c, k):
        return cmat_ref[c * 8 + k : c * 8 + k + 1, :]

    eps = [sum(gcache[(j, i)] for (i, j) in pairs[k])
           for k in range(n_sig)]
    vol = [sum(crow(c, k) * eps[k] for k in range(n_sig))
           for c in range(n_sig)]
    epsf = [sum(nd[j] * du[i] for (i, j) in pairs[k])
            for k in range(n_sig)]
    face = [sum(crow(c, k) * epsf[k] for k in range(n_sig))
            for c in range(n_sig)]

    for c in range(n_sig):
        surf = _dot(lift_ref[:], face[c] * fsc_ref[:])
        out_ref[c * npp : (c + 1) * npp, :] = vol[c] + surf


def _stress_kernel_sel_c(dim, n_sig, npp, ftpp, selcfg,
                         u_ref, panels_ref, combo_ref,
                         ginv_ref, nrm_ref, fsc_ref, delta_ref,
                         cmat_ref, drr_ref, lift_ref, out_ref):
    tr = _select_tiles(panels_ref, combo_ref, None, selcfg)
    _stress_kernel_c(dim, n_sig, npp, ftpp, u_ref, tr, ginv_ref, nrm_ref,
                     fsc_ref, delta_ref, cmat_ref, drr_ref, lift_ref,
                     out_ref)


def _upwind_rows_sel(dim, n_sig, npp, ftpp, selcfg,
                     u_ref, s_ref, pu_ref, pt_ref, combo_ref,
                     sgu_ref, sgt_ref,
                     ginv_ref, nrm_ref, fsc_ref, irho_ref,
                     lam_ref, mu_ref, zpn_ref, zsn_ref, zown_ref,
                     drr_ref, lift_ref):
    """Coupled Godunov RHS rows with the (f2, pi)-select fused in-kernel —
    the unstructured-mesh analog of ops/upwind_kernels._upwind_body (see
    ops/upwind.py for the Riemann formulas).

    Plus-side states come from raw lane-take panels: ``pu_ref`` velocity
    traces, ``pt_ref`` producer-contracted tractions; the boundary ghost
    coefficients gu/gt are FOLDED INTO the per-face select signs
    (interior: +1 for velocity, -1 for traction — conforming faces have
    opposite normals; boundary self-pairs resolve to the own trace, so
    the sign row IS the ghost coefficient).  Impedance rows: ``zpn/zsn``
    face-node-expanded neighbour impedances, ``zown`` rows 0/1 = own
    Zp/Zs.  Returns (du rows, ds rows) as per-component (npp, B) lists —
    the caller's epilogue decides what to write (raw RHS, or the fused
    RK4 stage/accumulator axpys)."""
    V = voigt_map(dim)
    # own derivatives + own-face traces (combined matmul per component)
    der_u = [[None] * dim for _ in range(dim)]
    own_u = [None] * dim
    for c in range(dim):
        combo = _dot(drr_ref[:], u_ref[c * npp : (c + 1) * npp, :])
        for r in range(dim):
            der_u[r][c] = combo[r * npp : (r + 1) * npp, :]
        own_u[c] = combo[dim * npp :, :]
    der_s = [[None] * n_sig for _ in range(dim)]
    own_s = [None] * n_sig
    for c in range(n_sig):
        combo = _dot(drr_ref[:], s_ref[c * npp : (c + 1) * npp, :])
        for r in range(dim):
            der_s[r][c] = combo[r * npp : (r + 1) * npp, :]
        own_s[c] = combo[dim * npp :, :]

    nd = [nrm_ref[d * ftpp : (d + 1) * ftpp, :] for d in range(dim)]
    t_own = [sum(nd[dd] * own_s[V[c, dd]] for dd in range(dim))
             for c in range(dim)]

    # exchanged, ghosted plus-side states
    up_all = _select_tiles(pu_ref, combo_ref, sgu_ref, selcfg)
    tp_all = _select_tiles(pt_ref, combo_ref, sgt_ref, selcfg)
    u_p = [up_all[c * ftpp : (c + 1) * ftpp, :] for c in range(dim)]
    t_p = [tp_all[c * ftpp : (c + 1) * ftpp, :] for c in range(dim)]

    zp_p, zs_p = zpn_ref[:], zsn_ref[:]
    zp_m = zown_ref[0:1, :]
    zs_m = zown_ref[1:2, :]

    def nsum(vec):
        return sum(nd[dd] * vec[dd] for dd in range(dim))

    uN_m, uN_p = nsum(own_u), nsum(u_p)
    tN_m, tN_p = nsum(t_own), nsum(t_p)

    zp_sum = zp_m + zp_p
    zs_sum = zs_m + zs_p
    # guards: dead padded lanes carry zero impedance (zs also guards the
    # acoustic vs=0 limit, ops/upwind.py)
    zp_safe = jnp.where(zp_sum > 0, zp_sum, jnp.ones_like(zp_sum))
    zs_safe = jnp.where(zs_sum > 0, zs_sum, jnp.ones_like(zs_sum))
    has_shear = zs_sum > 0

    tstar_N = (zp_p * tN_m + zp_m * tN_p
               + zp_m * zp_p * (uN_p - uN_m)) / zp_safe
    ustar_N = (zp_m * uN_m + zp_p * uN_p + (tN_p - tN_m)) / zp_safe

    t_star, u_star = [], []
    for c in range(dim):
        tT_m = t_own[c] - tN_m * nd[c]
        tT_p = t_p[c] - tN_p * nd[c]
        uT_m = own_u[c] - uN_m * nd[c]
        uT_p = u_p[c] - uN_p * nd[c]
        tT = jnp.where(
            has_shear,
            (zs_p * tT_m + zs_m * tT_p
             + zs_m * zs_p * (uT_p - uT_m)) / zs_safe,
            0.5 * (tT_m + tT_p))
        uT = jnp.where(
            has_shear,
            (zs_m * uT_m + zs_p * uT_p + (tT_p - tT_m)) / zs_safe,
            0.5 * (uT_m + uT_p))
        t_star.append(tstar_N * nd[c] + tT)
        u_star.append(ustar_N * nd[c] + uT)

    # velocity equation: du = (1/rho)(div sigma + LIFT(Fscale (t*-t-)))
    irho = irho_ref[0:1, :]
    du_rows = []
    for c in range(dim):
        div = None
        for dd in range(dim):
            for r in range(dim):
                g = ginv_ref[r * dim + dd : r * dim + dd + 1, :]
                term = g * der_s[r][V[c, dd]]
                div = term if div is None else div + term
        surf = _dot(lift_ref[:], fsc_ref[:] * (t_star[c] - t_own[c]))
        du_rows.append(irho * (div + surf))

    # stress equation: ds = Hooke(grad u) + LIFT(Fscale Hooke_f(u*-u-))
    lam = lam_ref[0:1, :]
    mu = mu_ref[0:1, :]

    def grad(dd, c):
        out = None
        for r in range(dim):
            g = ginv_ref[r * dim + dd : r * dim + dd + 1, :]
            term = g * der_u[r][c]
            out = term if out is None else out + term
        return out

    gcache = {(dd, c): grad(dd, c)
              for dd in range(dim) for c in range(dim)}
    divu = sum(gcache[(dd, dd)] for dd in range(dim))
    vol = [lam * divu + 2.0 * mu * gcache[(c, c)] for c in range(dim)]
    if dim == 2:
        vol.append(mu * (gcache[(1, 0)] + gcache[(0, 1)]))
    else:
        vol.append(mu * (gcache[(2, 1)] + gcache[(1, 2)]))
        vol.append(mu * (gcache[(2, 0)] + gcache[(0, 2)]))
        vol.append(mu * (gcache[(1, 0)] + gcache[(0, 1)]))

    duf = [u_star[c] - own_u[c] for c in range(dim)]
    nduf = nsum(duf)
    face = [lam * nduf + 2.0 * mu * nd[c] * duf[c] for c in range(dim)]
    if dim == 2:
        face.append(mu * (nd[0] * duf[1] + nd[1] * duf[0]))
    else:
        face.append(mu * (nd[1] * duf[2] + nd[2] * duf[1]))
        face.append(mu * (nd[0] * duf[2] + nd[2] * duf[0]))
        face.append(mu * (nd[0] * duf[1] + nd[1] * duf[0]))

    ds_rows = []
    for c in range(n_sig):
        surf = _dot(lift_ref[:], fsc_ref[:] * face[c])
        ds_rows.append(vol[c] + surf)
    return du_rows, ds_rows


def _upwind_kernel_sel(dim, n_sig, npp, ftpp, selcfg, *refs):
    """Raw-RHS epilogue: out = stacked [du (dim*npp); ds (n_sig*npp)]."""
    *in_refs, out_ref = refs
    du_rows, ds_rows = _upwind_rows_sel(dim, n_sig, npp, ftpp, selcfg,
                                        *in_refs)
    for c in range(dim):
        out_ref[c * npp : (c + 1) * npp, :] = du_rows[c]
    for c in range(n_sig):
        out_ref[(dim + c) * npp : (dim + c + 1) * npp, :] = ds_rows[c]


def _upwind_kernel_sel_axpy(dim, n_sig, npp, ftpp, selcfg, cs, wa,
                            n_inj, use_damp, emit, *refs):
    """Fused RK4 epilogue (stage mode, ``cs`` is a float): besides the
    Godunov RHS k = (du, ds) of the stage input, reads the step BASE
    state (ub, sb) and the running RK4 ACCUMULATOR (au, as) and writes

        out = [ub + cs*du ; sb + cs*ds ; au + wa*du ; as + wa*ds]

    i.e. the NEXT stage input and the updated accumulator — the XLA-side
    stepper axpys (measured 5.24 ms/step vs a 0.9 ms traffic bound,
    BENCH_NOTES r4 reconciliation) never materialize.  Final mode
    (``cs`` is None) omits (ub, sb) and writes only [au + wa*du ;
    as + wa*ds] — the completed RK4 update — optionally damped in-
    register (use_damp: sponge rows (npp, B) broadcast per component).

    ``n_inj`` dense source groups (Su, Ss, r) fold the point source
    in-register BEFORE the epilogue: k += r*S — the per-stage XLA
    scatter-adds (the LF4 engines' measured "hidden 1.4 ms",
    BENCH_NOTES round 3) never run.

    ``emit``: PRODUCER-SIDE PANEL EMISSION (the r5 unstructured gather
    lever, BENCH_NOTES r5 gT4 attribution: the XLA own-rows build is
    3.94 of the 6.47 ms panel gather).  Appends to the output the
    own-face panels of the EMITTED state (stage mode: the next stage
    input; final mode: the damped final state):

        TU rows c*ftpp + f*nfp + k: R @ u'_c           (dim sections)
        TT rows c*ftpp + f*nfp + k: sum_d n_d R@s'_V[c,d] (producer
                                    normal contraction, dim sections)

    with R the own-face restriction (the last ftpp rows of ``drr``) —
    the next stage's gather then runs ONLY the nf lane takes; the XLA
    restriction pass (and its full-state HBM re-read) never runs.  The
    consumer select reads this layout with selcfg' = (ftp -> ftpp,
    rows_pad -> C*ftpp); the restriction data is already in VMEM, so
    emission costs dim+n_sig small extra MXU matmuls + the panel write."""
    fixed = refs[:16]
    k = 16
    inj = []
    for _ in range(n_inj):
        inj.append(refs[k : k + 3])
        k += 3
    if cs is not None:
        ub_ref, sb_ref = refs[k], refs[k + 1]
        k += 2
    dmp_ref = None
    au_ref, as_ref = refs[k], refs[k + 1]
    k += 2
    if use_damp:
        dmp_ref = refs[k]
        k += 1
    drr_ref, lift_ref, out_ref = refs[k], refs[k + 1], refs[k + 2]
    du_rows, ds_rows = _upwind_rows_sel(
        dim, n_sig, npp, ftpp, selcfg, *fixed, drr_ref, lift_ref)
    for su_ref, ss_ref, r_ref in inj:
        r = r_ref[0:1, :]
        for c in range(dim):
            du_rows[c] = du_rows[c] + r * su_ref[c * npp : (c + 1) * npp, :]
        for c in range(n_sig):
            ds_rows[c] = ds_rows[c] + r * ss_ref[c * npp : (c + 1) * npp, :]
    nu, ns = dim * npp, n_sig * npp
    off = 0
    eu, es = [], []  # the EMITTED state rows (stage: next input;
    #                  final: the damped update) for panel emission
    if cs is not None:
        for c in range(dim):
            row = ub_ref[c * npp : (c + 1) * npp, :] + cs * du_rows[c]
            out_ref[c * npp : (c + 1) * npp, :] = row
            eu.append(row)
        for c in range(n_sig):
            row = sb_ref[c * npp : (c + 1) * npp, :] + cs * ds_rows[c]
            out_ref[nu + c * npp : nu + (c + 1) * npp, :] = row
            es.append(row)
        off = nu + ns
    dmp = dmp_ref[:] if use_damp else None
    for c in range(dim):
        row = au_ref[c * npp : (c + 1) * npp, :] + wa * du_rows[c]
        if use_damp:
            row = dmp * row
        out_ref[off + c * npp : off + (c + 1) * npp, :] = row
        if cs is None:
            eu.append(row)
    for c in range(n_sig):
        row = as_ref[c * npp : (c + 1) * npp, :] + wa * ds_rows[c]
        if use_damp:
            row = dmp * row
        out_ref[off + nu + c * npp : off + nu + (c + 1) * npp, :] = row
        if cs is None:
            es.append(row)
    if emit:
        V = voigt_map(dim)
        R = drr_ref[:][dim * npp :, :]
        nd = [fixed[8][d * ftpp : (d + 1) * ftpp, :] for d in range(dim)]
        eb = off + nu + ns
        for c in range(dim):
            out_ref[eb + c * ftpp : eb + (c + 1) * ftpp, :] = _dot(R, eu[c])
        own_s = [_dot(R, es[c]) for c in range(n_sig)]
        eb += dim * ftpp
        for c in range(dim):
            tt = sum(nd[dd] * own_s[V[c, dd]] for dd in range(dim))
            out_ref[eb + c * ftpp : eb + (c + 1) * ftpp, :] = tt


def upwind_rhs_lm_sel_axpy(d: PallasOpData, uw, u_lm, s_lm, panels_u,
                           panels_t, combo, sign_u, sign_t, selcfg,
                           acc_u, acc_s, wa, base_u=None, base_s=None,
                           cs=None, inject=None, damp_row=None,
                           block: int = DEFAULT_BLOCK,
                           interpret: bool = False,
                           emit: bool = False) -> jax.Array:
    """Coupled Godunov RHS with the RK4 stage/accumulator axpys fused
    into the kernel epilogue (see _upwind_kernel_sel_axpy).

    Stage mode (base_u/base_s/cs given): returns stacked
    ((2*(dim+n_sig))*npp, E_pad) rows [u_stage; s_stage; u_acc; s_acc].
    Final mode: ((dim+n_sig)*npp, E_pad) rows [u_acc; s_acc].
    inject: None or [(Su (dim*npp, E_pad), Ss (n_sig*npp, E_pad),
    r (8, E_pad)), ...] kernel-fused dense source groups (k += r*S).
    damp_row ((npp, E_pad), final mode only): in-register sponge.
    emit: append [TU (dim*ftpp); TT (dim*ftpp)] own-face panels of the
    emitted state (producer-side panel emission — the caller passes
    panels_u/panels_t taken from the PREVIOUS call's emission and the
    matching ftpp-layout selcfg)."""
    zpn, zsn, zown = uw
    geo = [_pad_lanes(x, block)
           for x in (d.ginv, d.nrm, d.fsc, d.irho, d.lam, d.mu,
                     zpn, zsn, zown)]
    E_pad = u_lm.shape[1]
    grid = (E_pad // block,)
    stage = base_u is not None
    assert damp_row is None or not stage, "damp folds into final mode"
    inject = inject or []
    out_rows = (2 if stage else 1) * (d.dim + d.n_sig) * d.npp
    if emit:
        out_rows += 2 * d.dim * d.ftpp
    # cs/wa are RK4 coefficients derived from the (static) dt — bake them
    # into the kernel as immediates rather than passing scalar operands
    kernel = functools.partial(
        _upwind_kernel_sel_axpy, d.dim, d.n_sig, d.npp, d.ftpp, selcfg,
        float(cs) if stage else None, float(wa), len(inject),
        damp_row is not None, emit)
    extra = [x for g in inject for x in g]
    extra += ([base_u, base_s, acc_u, acc_s] if stage
              else [acc_u, acc_s])
    if damp_row is not None:
        extra.append(damp_row)
    ins = [u_lm, s_lm, panels_u, panels_t, combo, sign_u, sign_t,
           *geo, *extra]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, E_pad), u_lm.dtype),
        grid=grid,
        in_specs=_lane_specs(block, [x.shape[0] for x in ins])
        + [_table_spec(d.drr.shape), _table_spec(d.lift.shape)],
        out_specs=pl.BlockSpec((out_rows, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*ins, d.drr, d.lift)


def upwind_rhs_lm_sel(d: PallasOpData, uw, u_lm, s_lm, panels_u,
                      panels_t, combo, sign_u, sign_t, selcfg,
                      block: int = DEFAULT_BLOCK,
                      interpret: bool = False) -> jax.Array:
    """Coupled Godunov RHS on lane-major state, unstructured meshes:
    plus-side traces via raw lane-take panels + in-kernel select.

    ``uw`` = (zpn, zsn, zown) impedance lane rows (see
    _upwind_kernel_sel).  Returns stacked ((dim+n_sig)*npp, E_pad) rows
    [du; ds] — one VMEM pass reads u and sigma each once."""
    zpn, zsn, zown = uw
    geo = [_pad_lanes(x, block)
           for x in (d.ginv, d.nrm, d.fsc, d.irho, d.lam, d.mu,
                     zpn, zsn, zown)]
    E_pad = u_lm.shape[1]
    grid = (E_pad // block,)
    out_rows = (d.dim + d.n_sig) * d.npp
    kernel = functools.partial(_upwind_kernel_sel, d.dim, d.n_sig,
                               d.npp, d.ftpp, selcfg)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, E_pad), u_lm.dtype),
        grid=grid,
        in_specs=_lane_specs(
            block,
            [u_lm.shape[0], s_lm.shape[0], panels_u.shape[0],
             panels_t.shape[0], combo.shape[0], sign_u.shape[0],
             sign_t.shape[0]] + [g.shape[0] for g in geo],
        )
        + [_table_spec(d.drr.shape), _table_spec(d.lift.shape)],
        out_specs=pl.BlockSpec((out_rows, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u_lm, s_lm, panels_u, panels_t, combo, sign_u, sign_t, *geo,
      d.drr, d.lift)


def _lane_specs(block, row_counts):
    """BlockSpecs blocking the lane (element) axis."""
    return [
        pl.BlockSpec((rows, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
        for rows in row_counts
    ]


def _table_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _gather_traces(p: ElasticParams, field: jax.Array) -> jax.Array:
    flat = field.reshape((-1,) + field.shape[2:])
    return flat[p.nbr].reshape(field.shape[0], p.n_faces * p.n_fp, -1)


def make_pallas_ops(p: ElasticParams, block: int = DEFAULT_BLOCK,
                    interpret: bool = False, exchange=None):
    """Build (vel_op, stress_op) closures from CONCRETE params.

    ``build_pallas_data`` runs host-side numpy on the params, so it must see
    concrete arrays; the returned closures take (possibly traced) params for
    the gather index array and are safe to call under jit/scan.  Signature-
    compatible with ops.elastic.apply_vel_op/apply_stress_op.

    ``exchange``: a StructuredExchange plan replaces the unstructured trace
    gather with the roll-based fast path (ops/structured_exchange.py).
    """
    d = build_pallas_data(p)

    def vel_op(p_t: ElasticParams, sigma: jax.Array, pool=None):
        return _vel_apply(d, p_t, sigma, block, interpret, exchange)

    def stress_op(p_t: ElasticParams, u: jax.Array, pool=None):
        return _stress_apply(d, p_t, u, block, interpret, exchange)

    return vel_op, stress_op


def vel_op_pallas(p: ElasticParams, sigma: jax.Array,
                  block: int = DEFAULT_BLOCK,
                  interpret: bool = False) -> jax.Array:
    """Convenience one-shot wrapper (requires concrete p)."""
    d = build_pallas_data(p)
    return _vel_apply(d, p, sigma, block, interpret)


def stress_op_pallas(p: ElasticParams, u: jax.Array,
                     block: int = DEFAULT_BLOCK,
                     interpret: bool = False) -> jax.Array:
    """Convenience one-shot wrapper (requires concrete p)."""
    d = build_pallas_data(p)
    return _stress_apply(d, p, u, block, interpret)


def vel_op_lm(d: PallasOpData, sig_lm: jax.Array, tr_lm: jax.Array,
              block: int = DEFAULT_BLOCK,
              interpret: bool = False) -> jax.Array:
    """Raw lane-major fused velocity operator: (C npp, E_pad) in/out."""
    geo = [_pad_lanes(x, block)
           for x in (d.ginv, d.nrm, d.fsc, d.beta, d.irho)]
    E_pad = sig_lm.shape[1]
    grid = (E_pad // block,)
    kernel = functools.partial(_vel_kernel, d.dim, d.n_sig, d.npp, d.ftpp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d.dim * d.npp, E_pad), sig_lm.dtype),
        grid=grid,
        in_specs=_lane_specs(
            block,
            [sig_lm.shape[0], tr_lm.shape[0]] + [g.shape[0] for g in geo],
        )
        + [_table_spec(d.drr.shape), _table_spec(d.lift.shape)],
        out_specs=pl.BlockSpec((d.dim * d.npp, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sig_lm, tr_lm, *geo, d.drr, d.lift)


def _vel_apply(d: PallasOpData, p: ElasticParams, sigma: jax.Array,
               block: int, interpret: bool, exchange=None) -> jax.Array:
    E = sigma.shape[0]
    if exchange is not None:
        from .structured_exchange import gather_traces_structured

        traces = gather_traces_structured(exchange, sigma)
    else:
        traces = _gather_traces(p, sigma)  # (E, ftp, n_sig)

    sig_lm = _to_lane_major(sigma, d.npp, block)
    tr_lm = _to_lane_major(traces, d.ftpp, block)
    out = vel_op_lm(d, sig_lm, tr_lm, block, interpret)
    return _from_lane_major(out, d.n_p, d.npp, d.dim, E)


def stress_op_lm(d: PallasOpData, u_lm: jax.Array, tr_lm: jax.Array,
                 block: int = DEFAULT_BLOCK,
                 interpret: bool = False, cmat=None) -> jax.Array:
    """Raw lane-major fused stress operator: (C npp, E_pad) in/out.

    ``cmat`` (n_sig*8, E) lane rows (row c*8+k = Voigt C[c, k]) switches
    the in-kernel Hooke law to the general anisotropic contraction."""
    if cmat is not None:
        geo = [_pad_lanes(x, block)
               for x in (d.ginv, d.nrm, d.fsc, d.delta, cmat)]
        kernel = functools.partial(_stress_kernel_c, d.dim, d.n_sig,
                                   d.npp, d.ftpp)
    else:
        geo = [_pad_lanes(x, block)
               for x in (d.ginv, d.nrm, d.fsc, d.delta, d.lam, d.mu)]
        kernel = functools.partial(_stress_kernel, d.dim, d.n_sig, d.npp,
                                   d.ftpp)
    E_pad = u_lm.shape[1]
    grid = (E_pad // block,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d.n_sig * d.npp, E_pad), u_lm.dtype),
        grid=grid,
        in_specs=_lane_specs(
            block,
            [u_lm.shape[0], tr_lm.shape[0]] + [g.shape[0] for g in geo],
        )
        + [_table_spec(d.drr.shape), _table_spec(d.lift.shape)],
        out_specs=pl.BlockSpec((d.n_sig * d.npp, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u_lm, tr_lm, *geo, d.drr, d.lift)


def _stress_apply(d: PallasOpData, p: ElasticParams, u: jax.Array,
                  block: int, interpret: bool, exchange=None) -> jax.Array:
    E = u.shape[0]
    if exchange is not None:
        from .structured_exchange import gather_traces_structured

        traces = gather_traces_structured(exchange, u)
    else:
        traces = _gather_traces(p, u)  # (E, ftp, dim)

    u_lm = _to_lane_major(u, d.npp, block)
    tr_lm = _to_lane_major(traces, d.ftpp, block)
    out = stress_op_lm(d, u_lm, tr_lm, block, interpret)
    return _from_lane_major(out, d.n_p, d.npp, d.n_sig, E)
