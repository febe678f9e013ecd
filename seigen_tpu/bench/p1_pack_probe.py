"""P1 2-elements-per-tile packing probe (round-2 verdict item 9).

P1 tets have n_p=4 padded to npp=8 sublanes, so HALF of every state tile
row is zero padding and the fused per-degree table shows P1 at ~1.2e9
DOF/s vs P3's 2.6e9 (results/r2_per_degree.json).  The candidate fix is
packing TWO elements per 8-row tile: element 2j in rows 0-3, element 2j+1
in rows 4-7 of lane j, with block-diagonal operator tables — same MXU
shapes, half the lanes, ~40% less HBM traffic.

This probe measures that design honestly: a full packed P1 velocity
operator (physics identical to ops/fused_kernels._vel2_body at P1/3D,
verified numerically against vel2_op in the test suite) A/B'd against the
production v2 kernel in a scan.  Packed-layout costs it pays that the
padded layout does not:

- per-element geometry scalars become per-SUBLANE arrays: every ginv /
  normal / Fscale / 1/rho broadcast needs an (8, B) row-structured operand
  (built in-kernel by one-hot MXU expansion from compact pair rows);
- face-trace rows pack 2x12 = 24 rows/pair (0.75x the padded 2x16);
- the component slices inside a tile are 4-row sub-slices (sublane
  shuffles for the VPU).

Integration cost NOT measured here (noted for the BENCH_NOTES entry): the
windowed merged-v3 exchange must pair lane windows (neighbour elements
land on lane j//2 parity j%2), and every runner/exchange/source path needs
a packed twin.  Run:  python -m seigen_tpu.bench.p1_pack_probe [E] [steps]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.elastic import ElasticParams, voigt_map
from ..ops.fused_kernels import _dot


def build_packed_vel_data(p: ElasticParams):
    """Host tables + packed geo for the P1/3D packed velocity operator.

    Layouts (B = E/2 lanes, element pair (2j, 2j+1) on lane j, parity
    par = e & 1 selects rows par*4..par*4+4 of each 8-row tile):
      sig   (6*8, B)   rows c*8 + par*4 + i
      tr    (3*24, B)  rows c*24 + par*12 + f*3 + k   (signed tractions)
      out u (3*8, B);  trout (3*24, B) traces of out
    """
    dim, n_p, nf, n_fp = p.dim, p.n_p, p.n_faces, p.n_fp
    assert (dim, n_p) == (3, 4), "packed probe is the P1/3D experiment"
    ftp = nf * n_fp  # 12
    E = p.Ginv.shape[0]
    assert E % 2 == 0
    B = E // 2

    Dr = np.zeros((dim * 8, 8), np.float32)
    for r in range(dim):
        for par in range(2):
            Dr[r * 8 + par * 4 : r * 8 + par * 4 + n_p,
               par * 4 : par * 4 + n_p] = np.asarray(p.Dr[r])
    fn = np.array(p.fnodes).reshape(-1)
    R = np.zeros((2 * ftp, 8), np.float32)
    for par in range(2):
        R[par * ftp + np.arange(ftp), par * 4 + fn] = 1.0
    drr = np.concatenate([Dr, R], axis=0)  # (48, 8)

    lift = np.zeros((8, 2 * ftp), np.float32)
    for par in range(2):
        lift[par * 4 : par * 4 + n_p, par * ftp : (par + 1) * ftp] = (
            np.asarray(p.LIFT))

    erep = np.zeros((2 * ftp, 8), np.float32)  # face -> face-node rows
    for par in range(2):
        for f in range(nf):
            erep[par * ftp + f * n_fp : par * ftp + (f + 1) * n_fp,
                 par * 4 + f] = 1.0

    # ginv pair rows (2*9 -> 24 rows) + one-hot expansion to 9 x (8, B)
    gpair = np.zeros((24, B), np.float32)
    Ginv = np.asarray(p.Ginv)  # (E, dim, dim)
    for r in range(dim):
        for d in range(dim):
            gpair[2 * (r * dim + d) + 0] = Ginv[0::2, r, d]
            gpair[2 * (r * dim + d) + 1] = Ginv[1::2, r, d]
    gexp = np.zeros((dim * dim * 8, 24), np.float32)
    for rd in range(dim * dim):
        for par in range(2):
            gexp[rd * 8 + par * 4 : rd * 8 + par * 4 + 4,
                 2 * rd + par] = 1.0

    # per-(pair, face) rows: normals (3 sections), scb, bfs; per-pair irho
    fsc = np.asarray(p.Fscale)  # (E, nf)
    nrm = np.asarray(p.normals)  # (E, nf, dim)
    beta = np.broadcast_to(np.asarray(p.beta_t), fsc.shape)
    geo = np.zeros((24 + dim * 8 + 8 + 8 + 8, B), np.float32)
    geo[:24] = gpair
    o_nrm = 24
    for d in range(dim):
        for par in range(2):
            geo[o_nrm + d * 8 + par * 4 : o_nrm + d * 8 + par * 4 + nf] = (
                nrm[par::2, :, d].T)
    o_scb = o_nrm + dim * 8
    o_bfs = o_scb + 8
    o_irho = o_bfs + 8
    for par in range(2):
        geo[o_scb + par * 4 : o_scb + par * 4 + nf] = 0.5 * fsc[par::2].T
        geo[o_bfs + par * 4 : o_bfs + par * 4 + nf] = (
            (beta * fsc)[par::2].T)
        geo[o_irho + par * 4 : o_irho + par * 4 + 4] = np.broadcast_to(
            np.asarray(p.inv_rho)[par::2], (4, B))

    dt = p.Ginv.dtype
    return (jnp.asarray(drr, dt), jnp.asarray(lift, dt),
            jnp.asarray(erep, dt), jnp.asarray(gexp, dt),
            jnp.asarray(geo, dt), (o_nrm, o_scb, o_bfs, o_irho))


def _packed_vel_kernel(off, sig_ref, tr_ref, geo_ref, drr_ref, lift_ref,
                       erep_ref, gexp_ref, out_ref, trout_ref):
    """Packed P1/3D velocity operator: du = (1/rho)(div sigma + LIFT(
    scb*tr + bfs*t_own)) — _vel2_body's physics on the packed layout."""
    dim, n_sig, ftp2 = 3, 6, 24
    V = voigt_map(dim)
    o_nrm, o_scb, o_bfs, o_irho = off
    B = sig_ref.shape[1]

    wide = jnp.concatenate(
        [sig_ref[c * 8 : (c + 1) * 8, :] for c in range(n_sig)], axis=1)
    combo = _dot(drr_ref[:], wide)  # (48, 6B)
    der = [[combo[r * 8 : (r + 1) * 8, c * B : (c + 1) * B]
            for c in range(n_sig)] for r in range(dim)]
    own = [combo[dim * 8 :, c * B : (c + 1) * B] for c in range(n_sig)]

    gw = jnp.concatenate(
        [geo_ref[o_nrm + d * 8 : o_nrm + d * 8 + 8, :] for d in range(dim)]
        + [geo_ref[o_scb : o_scb + 8, :], geo_ref[o_bfs : o_bfs + 8, :]],
        axis=1)
    ex = _dot(erep_ref[:], gw, onehot=True)  # (24, 5B)
    nrm = [ex[:, d * B : (d + 1) * B] for d in range(dim)]
    scb = ex[:, dim * B : (dim + 1) * B]
    bfs = ex[:, (dim + 1) * B : (dim + 2) * B]

    fluxes = []
    for cout in range(dim):
        t_own = None
        for d in range(dim):
            o = nrm[d] * own[V[cout, d]]
            t_own = o if t_own is None else t_own + o
        fluxes.append(scb * tr_ref[cout * ftp2 : (cout + 1) * ftp2, :]
                      + bfs * t_own)
    surf = _dot(lift_ref[:], jnp.concatenate(fluxes, axis=1))  # (8, 3B)

    gall = _dot(gexp_ref[:], geo_ref[:24, :], onehot=True)  # (72, B)
    irho = geo_ref[o_irho : o_irho + 8, :]
    res = []
    for cout in range(dim):
        div = None
        for d in range(dim):
            for r in range(dim):
                g = gall[(r * dim + d) * 8 : (r * dim + d + 1) * 8, :]
                term = g * der[r][V[cout, d]]
                div = term if div is None else div + term
        du = irho * (div + surf[:, cout * B : (cout + 1) * B])
        res.append(du)
        out_ref[cout * 8 : (cout + 1) * 8, :] = du
    rmat = drr_ref[dim * 8 :, :]
    trc = _dot(rmat, jnp.concatenate(res, axis=1), onehot=True)
    for cout in range(dim):
        trout_ref[cout * ftp2 : (cout + 1) * ftp2, :] = (
            trc[:, cout * B : (cout + 1) * B])


def packed_vel_op(tables, sig_p, tr_p, block=512, interpret=False):
    drr, lift, erep, gexp, geo, off = tables
    B = sig_p.shape[1]
    ts = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    ls = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_vel_kernel, off),
        out_shape=(jax.ShapeDtypeStruct((24, B), sig_p.dtype),
                   jax.ShapeDtypeStruct((72, B), sig_p.dtype)),
        grid=(B // block,),
        in_specs=[ls(48), ls(72), ls(geo.shape[0]),
                  ts(drr), ts(lift), ts(erep), ts(gexp)],
        out_specs=(ls(24), ls(72)),
        interpret=interpret,
    )(sig_p, tr_p, geo, drr, lift, erep, gexp)


def pack_state(x, rows):
    """(E, n_p<=4, C) -> packed (C*8, E/2) with parity sub-rows."""
    E, m, C = x.shape
    out = np.zeros((C * 8, E // 2), x.dtype)
    for c in range(C):
        for par in range(2):
            out[c * 8 + par * 4 : c * 8 + par * 4 + m] = (
                x[par::2, :, c].T)
    return out


def pack_traces(t):
    """(E, dim, ftp=12) -> packed (dim*24, E/2)."""
    E, dim, ftp = t.shape
    out = np.zeros((dim * 2 * ftp, E // 2), t.dtype)
    for c in range(dim):
        for par in range(2):
            out[c * 2 * ftp + par * ftp : c * 2 * ftp + (par + 1) * ftp] = (
                t[par::2, c, :].T)
    return out


def unpack_state(y, m, C, E):
    """packed (C*8, E/2) -> (E, m, C)."""
    out = np.zeros((E, m, C), y.dtype)
    for c in range(C):
        for par in range(2):
            out[par::2, :, c] = y[c * 8 + par * 4 : c * 8 + par * 4 + m].T
    return out


def main(E=196608, n_steps=300, block=512):
    import time

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..mesh import box_mesh, build_discrete
    from ..ops import Material, build_params
    from ..ops.fused_kernels import build_fused_data, vel2_op

    n = round((E / 6) ** (1 / 3))
    dm = build_discrete(box_mesh(n, n, n), 1)
    p = build_params(dm, Material(rho=1.0, vp=2.0, vs=1.0),
                     dtype=jnp.float32)
    E = dm.num_elements
    d = build_fused_data(p)
    tables = build_packed_vel_data(p)
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((E, 4, 6)).astype(np.float32)
    trc = rng.standard_normal((E, 3, 12)).astype(np.float32)

    # padded v2 layout
    sig_lm = np.zeros((6 * 8, E), np.float32)
    for c in range(6):
        sig_lm[c * 8 : c * 8 + 4] = sig[:, :, c].T
    tr_lm = np.zeros((3 * 16, E), np.float32)
    for c in range(3):
        tr_lm[c * 16 : c * 16 + 12] = trc[:, c, :].T

    sig_p, tr_p = pack_state(sig, 4), pack_traces(trc)

    def make_chain(op, cat_rows):
        """ONE jitted scan per impl — re-jitting per timed call would bill
        a fresh remote compile into every measurement (~100 ms/op noise)."""
        def body(carry, _):
            s, t = carry
            u, to = op(s, t)
            return (s + 1e-30 * jnp.concatenate([u] * cat_rows, 0),
                    t + 1e-30 * to), ()

        def go(s, t):
            (s, t), _ = jax.lax.scan(body, (s, t), None, length=n_steps)
            return s

        return jax.jit(go)

    opA = lambda s, t: vel2_op(d, s, t, block=block)  # noqa: E731
    opB = lambda s, t: packed_vel_op(tables, s, t, block=block)  # noqa

    for name, op, s0, t0, cr in (("padded", opA, sig_lm, tr_lm, 2),
                                 ("packed", opB, sig_p, tr_p, 2)):
        go = make_chain(op, cr)
        s0, t0 = jnp.asarray(s0), jnp.asarray(t0)
        jax.block_until_ready(go(s0, t0))  # compile
        best = np.inf
        for _ in range(3):
            t1 = time.perf_counter()
            jax.block_until_ready(go(s0, t0))
            best = min(best, (time.perf_counter() - t1) / n_steps)
        print(f"{name}: {best * 1e3:.3f} ms/op at E={E} "
              f"({E * 4 * 9 / best / 1e9:.2f} GDOF/s-equivalent/op)")


if __name__ == "__main__":
    import sys

    main(*(int(a) for a in sys.argv[1:]))


def pad_trim_probe():
    """Plan-level probe of the parity-shared 24-row face block (the
    named next P1 packed rung): for each packed consumer class, group
    its window slots by (producer face, producer packed class, lane
    offset) ignoring producer parity, and count groups read by BOTH
    parities — only those would amortize a shared block.  Measured
    result (BENCH_NOTES round-4 'P1 packed pad-trim: NEGATIVE'): zero
    shared groups in 2D and 3D, so the shared block would cut trace
    writes 25% but widen every windowed read 16->24 rows.  Host-only.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..mesh import box_mesh, build_discrete, rect_mesh
    from ..ops import Material, build_params
    from ..ops.fused_kernels import build_packed_fused_data
    from ..ops.merged_kernels import build_merged_plan
    from ..ops.structured_exchange import detect_structured

    mat = Material(rho=1.0, vp=2.0, vs=1.0)
    out = {}
    for name, topo in (("3d", box_mesh(4, 4, 4)),
                       ("2d", rect_mesh(16, 16))):
        dm = build_discrete(topo, 1)
        p = build_params(dm, mat, dtype=jnp.float32)
        ex = detect_structured(dm)
        E = dm.num_elements
        NC = int(np.prod(ex.grid))
        idx = np.arange(E).reshape(ex.m, NC)
        d = build_packed_fused_data(
            p, idx[0::2].reshape(-1), idx[1::2].reshape(-1))
        plan = build_merged_plan(ex, d, 256, n_par=2)
        groups, shared = 0, 0
        for u in range(plan.m):
            seen = {}
            for (g, u2, o) in plan.slots[u]:
                seen.setdefault((g // 2, u2, o), []).append(g % 2)
            for pars in seen.values():
                groups += 1
                shared += len(set(pars)) == 2
        out[name] = (groups, shared)
        print(f"{name}: {groups} (face,u2,o) window groups, "
              f"{shared} read by both parities")
    return out
