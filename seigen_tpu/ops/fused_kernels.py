"""Exchange-fused Pallas TPU kernels — the v2 lane pipeline.

Round-2 redesign of ops/pallas_kernels.py attacking the HBM traffic that
kept the v1 step at ~25-35% of its bandwidth roofline (VERDICT.md missing
item 5 / BENCH_NOTES.md bottleneck analysis):

1. **Producer-side trace emission.**  Every operator kernel emits, as a
   second output, the face traces of the field it just produced — so the
   inter-element exchange never re-gathers rows from full field arrays.
   For stress fields the emitted traces are pre-contracted TRACTIONS
   t_c = n_d sigma_{V[c,d]} (dim rows per face node instead of n_sig),
   halving the sigma-exchange volume; the consumer flips the sign
   (conforming faces have opposite normals).
2. **Compact geometry.**  v1 expanded normals/Fscale/flux coefficients to
   face-node resolution on HBM (217-225 rows/element/op).  v2 stores them
   per-face (72 rows total, 8-aligned sections) and expands in-kernel with
   a one-hot (ftpp, 8) matmul on the MXU.
3. **Fused updates.**  The LF4 axpy u' = u + dt uh1 + dt^3/24 uh2 (and the
   stress counterpart, including sponge damping) happens inside the final
   operator kernel of each half-step, removing the separate XLA axpy
   round-trips and producing the traces of the UPDATED field directly.

The exchange itself (solver/lane_fused.py) becomes a pure permutation of
compact trace arrays: per (class, face) one contiguous row-block read from
the neighbour class's trace lanes, grid-rolled, sign-flipped (tractions),
boundary-masked — no field gathers.

Flux/BC semantics are identical to ops/elastic.py (jump = 0.5*nbr +
beta/delta*own with Fscale folded: scb = 0.5*Fscale, bfs = beta_t*Fscale,
dfs = delta_u*Fscale).  Correctness oracle: einsum twins + the v1 lane
runner (tests/test_fused.py).
"""

from __future__ import annotations

import functools
import weakref
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .elastic import ElasticParams, voigt_map

# lane-block sweep (BENCH_NOTES round 2): 512 beats 256 for the fused
# pipeline at BOTH n=24 (2.39 vs 2.36 G) and n=32 (2.28 vs 2.19 G);
# 128 is ~12% worse.  (The v1 pipeline keeps 256: round-1 measured 512
# regressing there at n=32.)
DEFAULT_BLOCK = 512


def _rup(x, m=8):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["drr", "lift", "erep", "geo", "damp", "gexp"],
    meta_fields=["dim", "n_p", "npp", "ftp", "ftpp", "n_sig", "E", "nf",
                 "n_fp", "off", "n_par"],
)
@dataclass(frozen=True)
class FusedOpData:
    """Operator data for the fused lane-major kernels.

    geo row layout (8-aligned sections; offsets in ``off``):
      ginv  dim*dim rows (r*dim+d)
      nrm   dim sections of 8 rows each, rows f<nf hold normal component d
      scb   0.5 * Fscale            (rows f<nf)
      bfs   beta_t * Fscale
      dfs   delta_u * Fscale
      mat   row 0 = 1/rho, row 1 = lambda, row 2 = mu
      C     (anisotropic only) n_sig sections of 8 rows: row c*8+k holds
            the Voigt stiffness C[c, k] (engineering strains)

    ``off`` = (ginv, nrm, scb, bfs, dfs, mat, C, total); C = -1 for
    isotropic media (the kernels then apply the lambda/mu Hooke law).

    ``n_par`` = 2: PACKED layout (build_packed_fused_data) — two
    elements per lane, parity par on sublane rows par*4+i (requires
    n_p <= 4 and nf <= 4, i.e. P1); face-trace rows par*ftq + f*n_fp + k
    with ftq = nf*n_fp per parity (ftp = 2*ftq, ftpp = roundup); geo face
    sections hold rows par*4+f; ginv is stored COMPACT (row 2*(r*dim+d)
    + par) and the mat section holds rows 2*{irho,lam,mu} + par.  The
    per-lane scalar broadcasts of the unpacked kernels become per-ROW
    operands, produced in-kernel by ONE one-hot ``gexp`` MXU expansion:
    gm = gexp @ [ginv_compact; mat_compact] with row map
    [ginv:(dim*dim*npp)][irho:npp][lam:npp][mu:npp][lam_f:ftpp]
    [mu_f:ftpp].  P1's n_p<=4 pads to npp=8, so HALF of every unpacked
    tile is dead weight; packing reclaims it (measured 1.62x at op
    level, bench/p1_pack_probe.py, BENCH_NOTES round 3).
    """

    drr: jax.Array  # (dim*npp + ftpp, npp): [Dr stack; own-face restriction]
    lift: jax.Array  # (npp, ftpp)
    erep: jax.Array  # (ftpp, 8) one-hot face -> face-node expansion
    geo: jax.Array  # (G_ROWS, E)
    damp: jax.Array | None  # (npp, E) or None
    dim: int
    n_p: int
    npp: int
    ftp: int
    ftpp: int
    n_sig: int
    E: int
    nf: int
    n_fp: int
    off: tuple  # (ginv, nrm, scb, bfs, dfs, mat, total)
    n_par: int = 1
    gexp: jax.Array | None = None  # packed: one-hot geo/mat row expansion


_FUSED_CACHE: dict[int, tuple] = {}


def build_fused_data(p: ElasticParams, damp=None,
                     stiffness=None) -> FusedOpData:
    """stiffness: optional (E, n_sig, n_sig) per-element Voigt stiffness
    (engineering strains, ops/anisotropic.py conventions) in the SAME
    element order as p — switches the stress kernels to the general
    C-contraction Hooke law."""
    # cache only the plain variant: damp/stiffness arrays are transient
    # per-runner objects whose ids can be reused after GC
    key = id(p)
    if damp is None and stiffness is None:
        hit = _FUSED_CACHE.get(key)
        if hit is not None and hit[0]() is p:
            return hit[1]
    dim, n_p = p.dim, p.n_p
    npp = _rup(n_p)
    nf, n_fp = p.n_faces, p.n_fp
    ftp = nf * n_fp
    ftpp = _rup(ftp)
    E = p.Ginv.shape[0]
    dt = p.Ginv.dtype

    Dr = np.zeros((dim * npp, npp), dtype=np.float64)
    for r in range(dim):
        Dr[r * npp : r * npp + n_p, :n_p] = np.asarray(p.Dr[r])
    LIFT = np.zeros((npp, ftpp), dtype=np.float64)
    LIFT[:n_p, :ftp] = np.asarray(p.LIFT)
    fn = np.array(p.fnodes).reshape(-1)
    R = np.zeros((ftpp, npp), dtype=np.float64)
    R[np.arange(ftp), fn] = 1.0

    erep = np.zeros((ftpp, 8), dtype=np.float64)
    for f in range(nf):
        erep[f * n_fp : (f + 1) * n_fp, f] = 1.0

    # geo sections
    ginv_rows = _rup(dim * dim)
    o_ginv = 0
    o_nrm = o_ginv + ginv_rows
    o_scb = o_nrm + 8 * dim
    o_bfs = o_scb + 8
    o_dfs = o_bfs + 8
    o_mat = o_dfs + 8
    n_sig = p.n_sig
    o_C = o_mat + 8 if stiffness is not None else -1
    total = o_mat + 8 + (n_sig * 8 if stiffness is not None else 0)
    geo = np.zeros((total, E), dtype=np.float64)
    geo[: dim * dim] = (
        np.asarray(p.Ginv).transpose(1, 2, 0).reshape(dim * dim, E))
    fsc = np.asarray(p.Fscale)  # (E, nf)
    for d in range(dim):
        geo[o_nrm + 8 * d : o_nrm + 8 * d + nf] = np.asarray(
            p.normals[:, :, d]).T
    geo[o_scb : o_scb + nf] = (0.5 * fsc).T
    geo[o_bfs : o_bfs + nf] = (np.asarray(p.beta_t) * fsc).T
    geo[o_dfs : o_dfs + nf] = (np.asarray(p.delta_u) * fsc).T
    geo[o_mat + 0] = np.asarray(p.inv_rho)
    geo[o_mat + 1] = np.asarray(p.lam)
    geo[o_mat + 2] = np.asarray(p.mu)
    if stiffness is not None:
        C = np.broadcast_to(np.asarray(stiffness), (E, n_sig, n_sig))
        for c in range(n_sig):
            geo[o_C + c * 8 : o_C + c * 8 + n_sig] = C[:, c, :].T

    dmp = None
    if damp is not None:
        dn = np.zeros((npp, E), dtype=np.float64)
        dn[:n_p] = np.asarray(damp).T
        dmp = jnp.asarray(dn, dt)

    data = FusedOpData(
        drr=jnp.asarray(np.concatenate([Dr, R], axis=0), dt),
        lift=jnp.asarray(LIFT, dt),
        erep=jnp.asarray(erep, dt),
        geo=jnp.asarray(geo, dt),
        damp=dmp,
        dim=dim,
        n_p=n_p,
        npp=npp,
        ftp=ftp,
        ftpp=ftpp,
        n_sig=p.n_sig,
        E=E,
        nf=nf,
        n_fp=n_fp,
        off=(o_ginv, o_nrm, o_scb, o_bfs, o_dfs, o_mat, o_C, total),
    )
    if damp is None and stiffness is None:
        _FUSED_CACHE[key] = (
            weakref.ref(p, lambda _, k=key: _FUSED_CACHE.pop(k, None)),
            data,
        )
    return data


def build_packed_fused_data(p: ElasticParams, pair0, pair1,
                            damp=None) -> FusedOpData:
    """Two-elements-per-lane P1 operator data (``n_par=2`` layout above).

    pair0/pair1: (B,) element indices (into p's order) packed onto
    parities 0/1 of lane column j — the caller owns the pairing (the
    merged runner pairs classes (2u, 2u+1) of the same supercell so the
    exchange-window lane math is untouched).  Isotropic only; requires
    n_p <= 4 and nf <= 4 (P1 simplices, the degree whose npp=8 padding
    wastes half of every unpacked tile).
    """
    dim, n_p = p.dim, p.n_p
    nf, n_fp = p.n_faces, p.n_fp
    if n_p > 4 or nf > 4:
        raise ValueError("packed layout requires P1 (n_p<=4, nf<=4)")
    npp = 8
    ftq = nf * n_fp  # per-parity face-trace rows
    ftp = 2 * ftq
    ftpp = _rup(ftp)
    B = len(pair0)
    assert len(pair1) == B
    dt = p.Ginv.dtype
    pairs = (np.asarray(pair0), np.asarray(pair1))

    Dr = np.zeros((dim * npp, npp), dtype=np.float64)
    LIFT = np.zeros((npp, ftpp), dtype=np.float64)
    R = np.zeros((ftpp, npp), dtype=np.float64)
    erep = np.zeros((ftpp, 8), dtype=np.float64)
    fn = np.array(p.fnodes).reshape(-1)
    for par in range(2):
        for r in range(dim):
            Dr[r * npp + par * 4 : r * npp + par * 4 + n_p,
               par * 4 : par * 4 + n_p] = np.asarray(p.Dr[r])
        LIFT[par * 4 : par * 4 + n_p,
             par * ftq : par * ftq + ftq] = np.asarray(p.LIFT)
        R[par * ftq + np.arange(ftq), par * 4 + fn] = 1.0
        for f in range(nf):
            erep[par * ftq + f * n_fp : par * ftq + (f + 1) * n_fp,
                 par * 4 + f] = 1.0

    # geo: compact ginv pair rows + per-(par, face) sections + compact mat
    gci = _rup(2 * dim * dim)
    o_ginv = 0
    o_nrm = gci
    o_scb = o_nrm + 8 * dim
    o_bfs = o_scb + 8
    o_dfs = o_bfs + 8
    o_mat = o_dfs + 8
    total = o_mat + 8
    geo = np.zeros((total, B), dtype=np.float64)
    Ginv = np.asarray(p.Ginv)
    fsc = np.asarray(p.Fscale)
    nrm = np.asarray(p.normals)
    beta = np.broadcast_to(np.asarray(p.beta_t), fsc.shape)
    delta = np.broadcast_to(np.asarray(p.delta_u), fsc.shape)
    for par, pe in enumerate(pairs):
        for r in range(dim):
            for d in range(dim):
                geo[o_ginv + 2 * (r * dim + d) + par] = Ginv[pe, r, d]
        for d in range(dim):
            geo[o_nrm + 8 * d + par * 4 : o_nrm + 8 * d + par * 4 + nf] = (
                nrm[pe][:, :, d].T)
        geo[o_scb + par * 4 : o_scb + par * 4 + nf] = 0.5 * fsc[pe].T
        geo[o_bfs + par * 4 : o_bfs + par * 4 + nf] = (
            (beta * fsc)[pe].T)
        geo[o_dfs + par * 4 : o_dfs + par * 4 + nf] = (
            (delta * fsc)[pe].T)
        geo[o_mat + 0 + par] = np.asarray(p.inv_rho)[pe]
        geo[o_mat + 2 + par] = np.asarray(p.lam)[pe]
        geo[o_mat + 4 + par] = np.asarray(p.mu)[pe]

    # one-hot expansion: gm = gexp @ [geo[ginv:+gci]; geo[mat:+8]]
    # row map: [ginv rd-major npp rows][irho npp][lam npp][mu npp]
    #          [lam_f ftpp][mu_f ftpp]
    G = dim * dim * npp
    gexp = np.zeros((G + 3 * npp + 2 * ftpp, gci + 8), dtype=np.float64)
    for rd in range(dim * dim):
        for par in range(2):
            gexp[rd * npp + par * 4 : rd * npp + par * 4 + 4,
                 2 * rd + par] = 1.0
    for j in range(3):  # irho, lam, mu volume rows
        for par in range(2):
            gexp[G + j * npp + par * 4 : G + j * npp + par * 4 + 4,
                 gci + 2 * j + par] = 1.0
    for j in range(2):  # lam_f, mu_f face-node rows
        for par in range(2):
            gexp[G + 3 * npp + j * ftpp + par * ftq
                 : G + 3 * npp + j * ftpp + par * ftq + ftq,
                 gci + 2 * (j + 1) + par] = 1.0

    dmp = None
    if damp is not None:
        dn = np.zeros((npp, B), dtype=np.float64)
        da = np.asarray(damp)
        for par, pe in enumerate(pairs):
            dn[par * 4 : par * 4 + n_p] = da[pe].T
        dmp = jnp.asarray(dn, dt)

    return FusedOpData(
        drr=jnp.asarray(np.concatenate([Dr, R], axis=0), dt),
        lift=jnp.asarray(LIFT, dt),
        erep=jnp.asarray(erep, dt),
        geo=jnp.asarray(geo, dt),
        damp=dmp,
        dim=dim,
        n_p=n_p,
        npp=npp,
        ftp=ftp,
        ftpp=ftpp,
        n_sig=p.n_sig,
        E=2 * B,
        nf=nf,
        n_fp=n_fp,
        off=(o_ginv, o_nrm, o_scb, o_bfs, o_dfs, o_mat, -1, total),
        n_par=2,
        gexp=jnp.asarray(gexp, dt),
    )


# In-kernel matmul precision scheme.  The package-wide policy is 'highest'
# (full f32, ~6 bf16 MXU passes — BENCH_NOTES.md precision policy), but
# Mosaic has no 'high' tier, and the A/B harness shows the extra passes
# dominate kernel time.  'x3' reproduces XLA's bf16_3x algorithm manually:
# split both operands into bf16 hi+lo and take the three leading products —
# relative error ~2^-21 per product, far below the DG spatial error floor
# (validated on the TPU eigenmode run, results/precision_study.json).
KERNEL_PRECISION = __import__("os").environ.get(
    "SEIGEN_TPU_KERNEL_PRECISION", "x3")


def _dot_raw(a, b, precision=None):
    # f64 inputs (interpret-mode exactness tests, adjoint checks) keep
    # f64 accumulation; f32/bf16 keep the f32 MXU path
    pet = a.dtype if a.dtype == jnp.float64 else jnp.float32
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=pet,
        precision=precision)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot(a, b, onehot=False):
    """Matmul at the configured kernel precision.

    onehot=True marks selection/expansion matrices whose entries are exact
    in bf16 (0/1): only the b operand needs splitting (2 passes).
    """
    if a.dtype == jnp.float64:  # bf16 splitting would destroy f64
        return _dot_raw(a, b, jax.lax.Precision.HIGHEST)
    if KERNEL_PRECISION == "highest":
        return _dot_raw(a, b, jax.lax.Precision.HIGHEST)
    if KERNEL_PRECISION == "default":
        return _dot_raw(a, b, jax.lax.Precision.DEFAULT)
    # x3: bf16_3x (hi*hi + lo*hi + hi*lo), f32 accumulation
    P = jax.lax.Precision.DEFAULT
    b_hi, b_lo = _split_bf16(b)
    if onehot:
        return _dot_raw(a, b_hi, P) + _dot_raw(a, b_lo, P)
    a_hi, a_lo = _split_bf16(a)
    return (_dot_raw(a_hi, b_hi, P) + _dot_raw(a_lo, b_hi, P)
            + _dot_raw(a_hi, b_lo, P))


def _geo_expand_all(erep, geo_ref, offs):
    """Face-node expansion of several 8-row geo sections in ONE wide matmul.

    Returns a list of (ftpp, B) arrays, one per offset.  Batching the tiny
    (ftpp, 8) @ (8, B) products along lanes keeps the MXU pipeline full
    (measured: per-component small dots dominated kernel time under the
    multi-pass 'highest' matmul precision).
    """
    B = geo_ref.shape[1]
    wide = jnp.concatenate(
        [geo_ref[off : off + 8, :] for off in offs], axis=1)
    out = _dot(erep, wide, onehot=True)
    return [out[:, i * B : (i + 1) * B] for i in range(len(offs))]


def _combo(drr_ref, x_ref, npp, dim, C):
    """[derivatives; own traces] for ALL components in one wide matmul.

    Returns (der, own): der[r][c] (npp, B), own[c] (ftpp, B).
    """
    B = x_ref.shape[1]
    wide = jnp.concatenate(
        [x_ref[c * npp : (c + 1) * npp, :] for c in range(C)], axis=1)
    combo = _dot(drr_ref[:], wide)  # (dim*npp + ftpp, C*B)
    der = [[None] * C for _ in range(dim)]
    own = [None] * C
    for c in range(C):
        blk = combo[:, c * B : (c + 1) * B]
        for r in range(dim):
            der[r][c] = blk[r * npp : (r + 1) * npp, :]
        own[c] = blk[dim * npp :, :]
    return der, own


def _wide_dot_split(mat, cols, onehot=False):
    """mat @ concat(cols, lanes) -> list of per-column-block results."""
    B = cols[0].shape[1]
    wide = jnp.concatenate(cols, axis=1)
    out = _dot(mat, wide, onehot=onehot)
    return [out[:, i * B : (i + 1) * B] for i in range(len(cols))]


def _geo_rows(dim, npp, ftpp, off, geo_ref, gexp_ref):
    """Packed-layout per-row geometry/material operands: ONE one-hot MXU
    expansion of the compact ginv + mat geo sections (see FusedOpData
    n_par=2).  Returns (g(r,d) lookup, irho, lam_v, mu_v, lam_f, mu_f)."""
    o_ginv, o_mat = off[0], off[5]
    gci = _rup(2 * dim * dim)
    gin = jnp.concatenate(
        [geo_ref[o_ginv : o_ginv + gci, :], geo_ref[o_mat : o_mat + 8, :]],
        axis=0)
    gm = _dot(gexp_ref[:], gin, onehot=True)
    G = dim * dim * npp

    def g(r, d):
        rd = r * dim + d
        return gm[rd * npp : (rd + 1) * npp, :]

    return (g, gm[G : G + npp, :], gm[G + npp : G + 2 * npp, :],
            gm[G + 2 * npp : G + 3 * npp, :],
            gm[G + 3 * npp : G + 3 * npp + ftpp, :],
            gm[G + 3 * npp + ftpp : G + 3 * npp + 2 * ftpp, :])


def _vel2_body(dim, n_sig, npp, ftpp, off, axpy, dt, c3, get_tr,
               sig_ref, axpy_refs, geo_ref, drr_ref, lift_ref, erep_ref,
               out_ref, trout_ref, emit_tr=None, inj=None, gexp_ref=None):
    """Fused velocity operator — THE physics, shared by the standalone
    kernel (tr from the exchange output ref) and the merged
    exchange-in-kernel variant (ops/merged_kernels.py).

    du_c = (1/rho) (div(sigma)_c + LIFT((scb*tr_c + bfs*t_own_c)))
    get_tr(cout, t_own) returns the SIGNED neighbour traction rows:
    +n_own . sigma_nbr on interior faces, +t_own on boundary faces.
    emit_tr(traces): override the trace-output write (merged per-face
    layout); default writes component rows of trout_ref.

    axpy: additionally reads (u, uh1) and emits u' = u + dt*uh1 + c3*du
    instead of du.  Always emits the face traces of the primary output.
    """
    V = voigt_map(dim)
    o_ginv, o_nrm, o_scb, o_bfs, _, o_mat = off[:6]
    if axpy:
        u_ref, uh1_ref = axpy_refs

    der, own = _combo(drr_ref, sig_ref, npp, dim, n_sig)
    exp = _geo_expand_all(
        erep_ref[:], geo_ref,
        [o_nrm + 8 * d for d in range(dim)] + [o_scb, o_bfs])
    nrm, scb, bfs = exp[:dim], exp[dim], exp[dim + 1]
    if gexp_ref is not None:  # packed: per-row operands (FusedOpData n_par=2)
        g_of, irho = _geo_rows(dim, npp, ftpp, off, geo_ref, gexp_ref)[:2]
    else:
        irho = geo_ref[o_mat : o_mat + 1, :]
        g_of = None
    rmat = drr_ref[dim * npp :, :]

    fluxes = []
    for cout in range(dim):
        t_own = None
        for d in range(dim):
            o = nrm[d] * own[V[cout, d]]
            t_own = o if t_own is None else t_own + o
        fluxes.append(scb * get_tr(cout, t_own) + bfs * t_own)
    surfs = _wide_dot_split(lift_ref[:], fluxes)

    res = [None] * dim
    for cout in range(dim):
        div = None
        for d in range(dim):
            for r in range(dim):
                g = (g_of(r, d) if g_of is not None else
                     geo_ref[o_ginv + r * dim + d
                             : o_ginv + r * dim + d + 1, :])
                term = g * der[r][V[cout, d]]
                div = term if div is None else div + term
        du = irho * (div + surfs[cout])
        if axpy:
            res[cout] = (u_ref[cout * npp : (cout + 1) * npp, :]
                         + dt * uh1_ref[cout * npp : (cout + 1) * npp, :]
                         + c3 * du)
        else:
            res[cout] = du
        if inj is not None:
            # kernel-fused point-source injection: du += r_g(t) * S_g for
            # each wavelet group; the emitted traces below then include
            # the source contribution for free (trace is linear)
            for s_ref, r_ref in inj:
                res[cout] = res[cout] + (
                    r_ref[0, 0]
                    * s_ref[cout * npp : (cout + 1) * npp, :])
        out_ref[cout * npp : (cout + 1) * npp, :] = res[cout]
    traces = _wide_dot_split(rmat, res, onehot=True)
    if emit_tr is not None:
        emit_tr(traces)
    else:
        for cout in range(dim):
            trout_ref[cout * ftpp : (cout + 1) * ftpp, :] = traces[cout]


def _vel2_kernel(dim, n_sig, npp, ftpp, off, axpy, dt, c3, packed,
                 *refs):
    """Standalone fused velocity kernel: traces come pre-exchanged in
    tr_ref (see _vel2_body for the physics)."""
    if packed:  # gexp is the last INPUT, before the two output refs
        gexp_ref = refs[-3]
        refs = refs[:-3] + refs[-2:]
    else:
        gexp_ref = None
    if axpy:
        (sig_ref, tr_ref, u_ref, uh1_ref, geo_ref, drr_ref, lift_ref,
         erep_ref, out_ref, trout_ref) = refs
        axpy_refs = (u_ref, uh1_ref)
    else:
        (sig_ref, tr_ref, geo_ref, drr_ref, lift_ref, erep_ref,
         out_ref, trout_ref) = refs
        axpy_refs = None

    def get_tr(cout, t_own):
        return tr_ref[cout * ftpp : (cout + 1) * ftpp, :]

    _vel2_body(dim, n_sig, npp, ftpp, off, axpy, dt, c3, get_tr,
               sig_ref, axpy_refs, geo_ref, drr_ref, lift_ref, erep_ref,
               out_ref, trout_ref, gexp_ref=gexp_ref)


def _stress2_body(dim, n_sig, npp, ftpp, off, axpy, use_damp, dt, c3,
                  get_tr, u_ref, axpy_refs, geo_ref, drr_ref, lift_ref,
                  erep_ref, out_ref, trout_ref, emit_tr=None, inj=None,
                  gexp_ref=None):
    """Fused stress operator — THE physics (see _vel2_body).

    ds = Hooke(grad u) + LIFT(Hooke_face(scb*tr_u + dfs*u_own)); emits
    TRACTION traces t_c = n_d res_{V[c,d]} of the primary output.
    get_tr(c, u_own_c) returns the exchanged neighbour velocity trace rows
    (+u_own on boundary faces).

    axpy: reads (s, sh1[, damp]) and emits s' = damp*(s + dt*sh1 + c3*ds).
    """
    if axpy:
        if use_damp:
            s_ref, sh1_ref, damp_ref = axpy_refs
        else:
            s_ref, sh1_ref = axpy_refs
    V = voigt_map(dim)
    o_ginv, o_nrm, o_scb, _, o_dfs, o_mat = off[:6]

    der, own = _combo(drr_ref, u_ref, npp, dim, dim)
    exp = _geo_expand_all(
        erep_ref[:], geo_ref,
        [o_nrm + 8 * d for d in range(dim)] + [o_scb, o_dfs])
    nrm, scb, dfs = exp[:dim], exp[dim], exp[dim + 1]
    if gexp_ref is not None:  # packed: per-row operands (FusedOpData n_par=2)
        g_of, _, lam, mu, lam_f, mu_f = _geo_rows(
            dim, npp, ftpp, off, geo_ref, gexp_ref)
    else:
        lam = lam_f = geo_ref[o_mat + 1 : o_mat + 2, :]
        mu = mu_f = geo_ref[o_mat + 2 : o_mat + 3, :]
        g_of = None
    rmat = drr_ref[dim * npp :, :]

    def grad(d, c):
        out = None
        for r in range(dim):
            g = (g_of(r, d) if g_of is not None else
                 geo_ref[o_ginv + r * dim + d
                         : o_ginv + r * dim + d + 1, :])
            term = g * der[r][c]
            out = term if out is None else out + term
        return out

    gcache = {(d, c): grad(d, c) for d in range(dim) for c in range(dim)}

    o_C = off[6] if len(off) > 6 else -1
    if o_C >= 0:
        assert gexp_ref is None, "packed layout is isotropic-only"
        # general anisotropic Hooke law: C : sym(a (x) b) with engineering
        # Voigt strains (ops/anisotropic.py conventions)
        from .anisotropic import _voigt_strain_pair

        pairs = _voigt_strain_pair(dim)

        def crow(c, k):
            return geo_ref[o_C + c * 8 + k : o_C + c * 8 + k + 1, :]

        eps = [sum(gcache[(j, i)] for (i, j) in pairs[k])
               for k in range(n_sig)]
        vol = [sum(crow(c, k) * eps[k] for k in range(n_sig))
               for c in range(n_sig)]
        du = [scb * get_tr(c, own[c]) + dfs * own[c] for c in range(dim)]
        epsf = [sum(nrm[j] * du[i] for (i, j) in pairs[k])
                for k in range(n_sig)]
        face = [sum(crow(c, k) * epsf[k] for k in range(n_sig))
                for c in range(n_sig)]
    else:
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

        # velocity jump at face nodes with Fscale folded
        du = [scb * get_tr(c, own[c]) + dfs * own[c]
              for c in range(dim)]
        ndu = sum(nrm[d] * du[d] for d in range(dim))
        face = []
        for c in range(dim):
            face.append(lam_f * ndu + 2.0 * mu_f * nrm[c] * du[c])
        if dim == 2:
            face.append(mu_f * (nrm[0] * du[1] + nrm[1] * du[0]))
        else:
            face.append(mu_f * (nrm[1] * du[2] + nrm[2] * du[1]))
            face.append(mu_f * (nrm[0] * du[2] + nrm[2] * du[0]))
            face.append(mu_f * (nrm[0] * du[1] + nrm[1] * du[0]))

    surfs = _wide_dot_split(lift_ref[:], face)
    res = [None] * n_sig
    for c in range(n_sig):
        ds = vol[c] + surfs[c]
        if axpy:
            r_ = (s_ref[c * npp : (c + 1) * npp, :]
                  + dt * sh1_ref[c * npp : (c + 1) * npp, :]
                  + c3 * ds)
            if use_damp:
                r_ = damp_ref[:] * r_
        else:
            r_ = ds
        if inj is not None:
            for s_ref, r_ref in inj:
                r_ = r_ + r_ref[0, 0] * s_ref[c * npp : (c + 1) * npp, :]
        res[c] = r_
        out_ref[c * npp : (c + 1) * npp, :] = r_

    # traction traces of the primary output
    tr_sig = _wide_dot_split(rmat, res, onehot=True)
    traces = []
    for cout in range(dim):
        t = None
        for d in range(dim):
            o = nrm[d] * tr_sig[V[cout, d]]
            t = o if t is None else t + o
        traces.append(t)
    if emit_tr is not None:
        emit_tr(traces)
    else:
        for cout in range(dim):
            trout_ref[cout * ftpp : (cout + 1) * ftpp, :] = traces[cout]


def _stress2_kernel(dim, n_sig, npp, ftpp, off, axpy, use_damp, dt, c3,
                    packed, *refs):
    """Standalone fused stress kernel: traces come pre-exchanged in tr_ref
    (see _stress2_body for the physics)."""
    if packed:  # gexp is the last INPUT, before the two output refs
        gexp_ref = refs[-3]
        refs = refs[:-3] + refs[-2:]
    else:
        gexp_ref = None
    i = 0
    u_ref, tr_ref = refs[0], refs[1]
    i = 2
    axpy_refs = None
    if axpy:
        if use_damp:
            axpy_refs = refs[i : i + 3]
            i += 3
        else:
            axpy_refs = refs[i : i + 2]
            i += 2
    geo_ref, drr_ref, lift_ref, erep_ref = refs[i : i + 4]
    out_ref, trout_ref = refs[i + 4], refs[i + 5]

    def get_tr(c, own_c):
        return tr_ref[c * ftpp : (c + 1) * ftpp, :]

    _stress2_body(dim, n_sig, npp, ftpp, off, axpy, use_damp, dt, c3,
                  get_tr, u_ref, axpy_refs, geo_ref, drr_ref, lift_ref,
                  erep_ref, out_ref, trout_ref, gexp_ref=gexp_ref)


def _lane_specs(block, row_counts):
    return [
        pl.BlockSpec((rows, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
        for rows in row_counts
    ]


def _table_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def vel2_op(d: FusedOpData, sig_lm, tr_lm, block=DEFAULT_BLOCK,
            interpret=False, axpy=None, dt=0.0, c3=0.0):
    """Fused velocity operator on lane-major state.

    sig_lm (n_sig*npp, E_pad), tr_lm (dim*ftpp, E_pad) signed neighbour
    tractions.  axpy: None or (u_lm, uh1_lm) -> primary output is
    u + dt*uh1 + c3*du.  Returns (out (dim*npp, E_pad), traces of out
    (dim*ftpp, E_pad))."""
    E_pad = sig_lm.shape[1]
    grid = (E_pad // block,)
    packed = d.gexp is not None
    kernel = functools.partial(
        _vel2_kernel, d.dim, d.n_sig, d.npp, d.ftpp, d.off,
        axpy is not None, dt, c3, packed)
    args = [sig_lm, tr_lm]
    rows = [sig_lm.shape[0], tr_lm.shape[0]]
    if axpy is not None:
        args += [axpy[0], axpy[1]]
        rows += [axpy[0].shape[0], axpy[1].shape[0]]
    args.append(d.geo)
    rows.append(d.geo.shape[0])
    tables = [d.drr, d.lift, d.erep] + ([d.gexp] if packed else [])
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((d.dim * d.npp, E_pad), sig_lm.dtype),
            jax.ShapeDtypeStruct((d.dim * d.ftpp, E_pad), sig_lm.dtype),
        ),
        grid=grid,
        in_specs=_lane_specs(block, rows)
        + [_table_spec(t.shape) for t in tables],
        out_specs=(
            pl.BlockSpec((d.dim * d.npp, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d.dim * d.ftpp, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*args, *tables)


def stress2_op(d: FusedOpData, u_lm, tr_lm, block=DEFAULT_BLOCK,
               interpret=False, axpy=None, dt=0.0, c3=0.0):
    """Fused stress operator; axpy: None or (s_lm, sh1_lm) — then the
    primary output is damp*(s + dt*sh1 + c3*ds) (damp folded if present).
    Returns (out (n_sig*npp, E_pad), TRACTION traces (dim*ftpp, E_pad))."""
    E_pad = u_lm.shape[1]
    grid = (E_pad // block,)
    use_damp = axpy is not None and d.damp is not None
    packed = d.gexp is not None
    kernel = functools.partial(
        _stress2_kernel, d.dim, d.n_sig, d.npp, d.ftpp, d.off,
        axpy is not None, use_damp, dt, c3, packed)
    args = [u_lm, tr_lm]
    rows = [u_lm.shape[0], tr_lm.shape[0]]
    if axpy is not None:
        args += [axpy[0], axpy[1]]
        rows += [axpy[0].shape[0], axpy[1].shape[0]]
        if use_damp:
            args.append(d.damp)
            rows.append(d.damp.shape[0])
    args.append(d.geo)
    rows.append(d.geo.shape[0])
    tables = [d.drr, d.lift, d.erep] + ([d.gexp] if packed else [])
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((d.n_sig * d.npp, E_pad), u_lm.dtype),
            jax.ShapeDtypeStruct((d.dim * d.ftpp, E_pad), u_lm.dtype),
        ),
        grid=grid,
        in_specs=_lane_specs(block, rows)
        + [_table_spec(t.shape) for t in tables],
        out_specs=(
            pl.BlockSpec((d.n_sig * d.npp, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d.dim * d.ftpp, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*args, *tables)
