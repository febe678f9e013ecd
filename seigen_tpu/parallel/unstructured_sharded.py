"""Multi-chip fast path for UNSTRUCTURED meshes — Morton-block SPMD.

The reference's flagship benchmark was unstructured AND distributed
(SURVEY.md §3/§9.3: Gmsh tet meshes over MPI ranks with DMPlex halos);
round 2 gave unstructured meshes a single-chip fast path
(solver/lane_unstructured.py) but sharding still fell back to the general
einsum ppermute path.  This module closes that gap: the SAME in-kernel
(f2, pi)-select Pallas operators as the single-chip unstructured runner,
run shard-locally under ``shard_map`` over a Morton-block element
partition.

Design (the TPU-native analog of the reference's METIS + PETSc-SF halos):

  1. **Morton-block partition.**  Elements are ordered along a Morton
     curve (parallel/partition.morton_order) and split into P contiguous
     blocks — each chip owns one dense lane slice of every field array.
     The tail block absorbs the lane padding (inert self-paired elements).
  2. **Compact trace-panel halos.**  Each shard extracts its producer
     traces locally (one-hot MXU matmul; tractions pre-contracted with
     producer normals — dim rows instead of n_sig).  The columns any
     OTHER shard reads (boundary producers, ~E_loc^(2/3) of them thanks
     to Morton locality) are gathered into one fixed-size panel and
     `all_gather`ed over the mesh axis — the only cross-chip traffic,
     and it is compact traces, never state.
  3. **Remapped lane takes.**  Each consumer face's lane take indexes the
     concatenation [local traces | all-gathered halo panels]; the indices
     are precomputed per shard at build time (host NumPy), so the device
     exchange is exactly the single-chip formulation: nf lane takes plus
     the in-kernel (f2, pi)-select (ops/pallas_kernels.*_sel).

Equivalence oracle: the general einsum path and the single-chip
UnstructuredLaneRunner (tests/test_unstructured_sharded.py asserts
partition invariance at 2/4/8 virtual shards on scrambled meshes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.elastic import ElasticParams, voigt_map
from ..ops.pallas_kernels import (
    DEFAULT_BLOCK,
    build_pallas_data,
    stress_op_lm_sel,
    vel_op_lm_trac_sel,
)
from ..ops.unstructured_exchange import (
    FacePairing,
    derive_face_pairing,
    orientation_groups,
    permute_pairing,
)
from ..solver.lane_major import from_lm, to_lm
from ..solver.source import ricker
from ..solver.timestep import State, compose_lf_step

AXIS = "x"

# aux entries that are shard-stacked along a leading P axis (un-stacked
# inside the shard_map body); everything else is lane-sharded or replicated
_STACKED = ("take", "gather", "combo", "sign")


def _rup(x, m):
    return ((x + m - 1) // m) * m


class ShardedUnstructuredRunner:
    """Morton-block sharded lane runner for arbitrary conforming meshes.

    LF2/LF4 via compose_lf_step; fused in-kernel select operators; one
    compact all-gathered trace panel per operator application.
    """

    def __init__(
        self,
        p: ElasticParams,
        dt: float,
        n_shards: int,
        *,
        centroids=None,
        order: int = 4,
        src=None,
        damp=None,
        receivers=None,
        block: int = DEFAULT_BLOCK,
        interpret: bool = False,
        devices=None,
    ):
        d = build_pallas_data(p)
        self.p = p
        self.order = order
        self.block = block
        self.interpret = interpret
        self.dtype = p.Ginv.dtype
        self.dt = jnp.asarray(dt, self.dtype)
        E = d.E
        Pn = n_shards
        self.P = Pn
        E_loc = _rup(-(-E // Pn), block)
        E_pad = E_loc * Pn
        self.E, self.E_loc, self.E_pad = E, E_loc, E_pad

        devices = (
            devices if devices is not None else jax.devices()[:Pn])
        if len(devices) != Pn:
            raise ValueError(
                f"need {Pn} devices for {Pn} shards, got "
                f"{len(devices)} — on CPU provision virtual devices "
                "first (XLA_FLAGS=--xla_force_host_platform_"
                "device_count=N)")
        self.mesh = Mesh(np.array(devices), (AXIS,))

        # --- element order: Morton curve, contiguous block per shard ---
        if centroids is None:
            old_of_new = np.arange(E, dtype=np.int64)
        else:
            from .partition import morton_order

            old_of_new = np.asarray(
                morton_order(np.asarray(centroids)), np.int64)
        new_of_old = np.empty(E, dtype=np.int64)
        new_of_old[old_of_new] = np.arange(E)
        self._old_of_new, self._new_of_old = old_of_new, new_of_old

        # --- global pairing in the new order; tail-padded self-pairs ---
        pr = derive_face_pairing(np.asarray(p.nbr), p.n_p, p.fnodes)
        pr = permute_pairing(pr, old_of_new, new_of_old)
        nf, nfp = pr.n_faces, pr.n_fp
        self.nf = nf
        pad_n = E_pad - E
        e2 = np.concatenate([
            pr.e2,
            np.repeat(np.arange(E, E_pad), nf).reshape(pad_n, nf)])
        f2 = np.concatenate([
            pr.f2, np.tile(np.arange(nf, dtype=np.int64), (pad_n, 1))])
        k2 = np.concatenate([
            pr.k2,
            np.broadcast_to(np.arange(nfp, dtype=np.int64),
                            (pad_n, nf, nfp))])
        ext = FacePairing(e2=e2, f2=f2, k2=k2, n_p=pr.n_p,
                          n_faces=nf, n_fp=nfp)

        # --- static select plan (global combo union; per-shard codes) ---
        gid, perms_np = orientation_groups(ext)
        comb = ext.f2 * perms_np.shape[0] + gid  # (E_pad, nf)
        face_combos = tuple(
            tuple(int(x) for x in np.unique(comb[:, f]))
            for f in range(nf))
        perms = tuple(tuple(int(x) for x in row) for row in perms_np)
        ftp = nf * nfp
        self.ftp = ftp
        rows_pad = _rup(d.dim * ftp, 8)
        self._rows_pad = rows_pad
        self._selcfg = (d.dim, nf, nfp, ftp, d.ftpp, rows_pad,
                        face_combos, perms)

        combo = np.zeros((Pn, 8, E_loc), dtype=np.int32)
        combo[:, :nf] = comb.T.reshape(nf, Pn, E_loc).transpose(1, 0, 2)
        boundary = (ext.e2 == np.arange(E_pad)[:, None]) & (
            ext.f2 == np.arange(nf)[None, :])
        sgn = np.where(boundary, 1.0, -1.0).astype(np.float32)
        sign = np.zeros((Pn, 8, E_loc), np.float32)
        sign[:, :nf] = sgn.T.reshape(nf, Pn, E_loc).transpose(1, 0, 2)

        # --- halo plan: published boundary columns per producer shard ---
        osh = e2 // E_loc  # producer shard per consumer face
        csh = np.arange(E_pad)[:, None] // E_loc
        cross = osh != csh
        pubs = [np.unique(e2[cross & (osh == o)]) for o in range(Pn)]
        nb = max(1, max((len(x) for x in pubs), default=1))
        self.nb = nb
        gather_cols = np.zeros((Pn, nb), np.int32)
        pos = np.zeros_like(e2)
        for o in range(Pn):
            gather_cols[o, : len(pubs[o])] = pubs[o] - o * E_loc
            m = cross & (osh == o)
            if m.any():
                pos[m] = np.searchsorted(pubs[o], e2[m])
        idx = np.where(cross, E_loc + osh * nb + pos, e2 - osh * E_loc)
        take_idx = idx.T.reshape(nf, Pn, E_loc).transpose(1, 0, 2)

        self._combo = jnp.asarray(combo)
        self._sign = jnp.asarray(sign)
        self._take = jnp.asarray(take_idx.astype(np.int32))
        self._gather = jnp.asarray(gather_cols)

        # --- geometry lanes: permute + tail-pad (inert zeros) ---
        import dataclasses as _dc

        def place(arr):
            a = np.asarray(arr)[:, old_of_new]
            out = np.zeros((a.shape[0], E_pad), a.dtype)
            out[:, :E] = a
            return jnp.asarray(out)

        self.d = d = _dc.replace(
            d, ginv=place(d.ginv), nrm=place(d.nrm), fsc=place(d.fsc),
            beta=place(d.beta), delta=place(d.delta), irho=place(d.irho),
            lam=place(d.lam), mu=place(d.mu))

        fn = np.array(p.fnodes)
        R = np.zeros((ftp, d.npp), np.float32)
        R[np.arange(ftp), fn.reshape(-1)] = 1.0
        self._rmat = jnp.asarray(R, self.dtype)

        if damp is not None:
            dn = np.zeros((d.npp, E_pad), np.float64)
            dn[: d.n_p, :E] = np.asarray(damp)[old_of_new].T
            self.damp_u = jnp.asarray(np.tile(dn, (d.dim, 1)), self.dtype)
            self.damp_s = jnp.asarray(
                np.tile(dn, (d.n_sig, 1)), self.dtype)
        else:
            self.damp_u = self.damp_s = None

        self._build_sources(src, new_of_old)
        self.rcv = (self._pack_receivers(receivers, new_of_old)
                    if receivers is not None else None)

    # --- sources / receivers (shard-stacked, amp=0 fill) ---------------
    def _build_sources(self, src, new_of_old):
        if src is None:
            self.src = None
            return
        self.src = self._pack_sources(src, new_of_old)

    def _pack_sources(self, src, new_of_old):
        """Shard-pack ONE shot's SourceData -> dict of (P, ...) arrays
        (amp=0 fill for shards that own none of the shot's points)."""
        d = self.d
        K = src.elems.shape[0]
        vu = np.zeros((d.dim * d.npp, K), dtype=np.float64)
        vs = np.zeros((d.n_sig * d.npp, K), dtype=np.float64)
        for c in range(d.dim):
            vu[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                src.vec_u[:, :, c]).T
        for c in range(d.n_sig):
            vs[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                src.vec_s[:, :, c]).T
        e_new = new_of_old[np.asarray(src.elems)]
        shard = e_new // self.E_loc
        local = e_new % self.E_loc
        S_max = max(int(np.bincount(shard, minlength=self.P).max()), 1)
        elems_sh = np.zeros((self.P, S_max), dtype=np.int32)
        vu_sh = np.zeros((self.P, vu.shape[0], S_max), np.float64)
        vs_sh = np.zeros((self.P, vs.shape[0], S_max), np.float64)
        f0 = np.ones((self.P, S_max), np.float64)
        t0 = np.zeros((self.P, S_max), np.float64)
        amp = np.zeros((self.P, S_max), np.float64)
        fill = np.zeros(self.P, dtype=np.int64)
        f0a = np.broadcast_to(np.asarray(src.f0, np.float64), (K,))
        t0a = np.broadcast_to(np.asarray(src.t0, np.float64), (K,))
        ampa = np.broadcast_to(np.asarray(src.amp, np.float64), (K,))
        for kk in range(K):
            p_ = shard[kk]
            j = fill[p_]
            elems_sh[p_, j] = local[kk]
            vu_sh[p_, :, j] = vu[:, kk]
            vs_sh[p_, :, j] = vs[:, kk]
            f0[p_, j] = f0a[kk]
            t0[p_, j] = t0a[kk]
            amp[p_, j] = ampa[kk]
            fill[p_] += 1
        return dict(
            elems=jnp.asarray(elems_sh),
            vu=jnp.asarray(vu_sh, self.dtype),
            vs=jnp.asarray(vs_sh, self.dtype),
            f0=jnp.asarray(f0, self.dtype),
            t0=jnp.asarray(t0, self.dtype),
            amp=jnp.asarray(amp, self.dtype),
        )

    def _pack_receivers(self, rcv, new_of_old):
        e_new = new_of_old[np.asarray(rcv.elems)]
        shard = e_new // self.E_loc
        local = e_new % self.E_loc
        Rn = len(e_new)
        elems_sh = np.zeros((self.P, Rn), dtype=np.int32)
        w_sh = np.zeros((self.P, Rn, np.asarray(rcv.weights).shape[1]),
                        np.float64)
        for r in range(Rn):
            elems_sh[shard[r], r] = local[r]
            w_sh[shard[r], r] = np.asarray(rcv.weights)[r]
        return dict(elems=jnp.asarray(elems_sh),
                    w=jnp.asarray(w_sh, self.dtype))

    # --- shard-local exchange: local extraction + all-gathered halo ----
    def _halo_takes(self, aux, T):
        """[local traces | all-gathered boundary panels] lane takes.
        T: (rows_pad, E_loc) shard-local producer traces."""
        B = jnp.take(T, aux["gather"], axis=1)  # (rows, nb)
        H = jax.lax.all_gather(B, AXIS)  # (P, rows, nb)
        T_ext = jnp.concatenate(
            [T, H.transpose(1, 0, 2).reshape(T.shape[0], -1)], axis=1)
        return jnp.concatenate(
            [jnp.take(T_ext, aux["take"][f], axis=1)
             for f in range(self.nf)], axis=0)

    def _panels_u(self, d, aux, u_lm):
        dim, npp, ftp = d.dim, d.npp, self.ftp
        Fp = u_lm.reshape(dim, npp, self.E_loc)
        T = jax.lax.dot_general(
            aux["rmat"].astype(u_lm.dtype), Fp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (ftp, dim, E_loc)
        T = T.transpose(1, 0, 2).reshape(dim * ftp, self.E_loc)
        if self._rows_pad != dim * ftp:
            T = jnp.pad(T, ((0, self._rows_pad - dim * ftp), (0, 0)))
        return self._halo_takes(aux, T)

    def _panels_t(self, d, aux, s_lm):
        """Producer-side traction contraction (n_sig -> dim rows) with the
        producer's own normals, then the same halo takes."""
        dim, n_sig, npp, ftp = d.dim, d.n_sig, d.npp, self.ftp
        V = voigt_map(dim)
        Fp = s_lm.reshape(n_sig, npp, self.E_loc)
        T6 = jax.lax.dot_general(
            aux["rmat"].astype(s_lm.dtype), Fp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (ftp, n_sig, E_loc)
        trac = []
        for c in range(dim):
            acc = None
            for dd in range(dim):
                nd = d.nrm[dd * d.ftpp : dd * d.ftpp + ftp]
                term = nd * T6[:, V[c, dd], :]
                acc = term if acc is None else acc + term
            trac.append(acc)
        T = jnp.stack(trac, axis=0).reshape(dim * ftp, self.E_loc)
        if self._rows_pad != dim * ftp:
            T = jnp.pad(T, ((0, self._rows_pad - dim * ftp), (0, 0)))
        return self._halo_takes(aux, T)

    # --- shard-local step ----------------------------------------------
    def _step_loc(self, d, aux, carry, t):
        def vel(s_lm):
            return vel_op_lm_trac_sel(
                d, s_lm, self._panels_t(d, aux, s_lm), aux["combo"],
                aux["sign"], self._selcfg, self.block, self.interpret)

        def stress(u_lm):
            return stress_op_lm_sel(
                d, u_lm, self._panels_u(d, aux, u_lm), aux["combo"],
                self._selcfg, self.block, self.interpret)

        def inject(field, vecs, t_):
            if self.src is None:
                return field
            r = (aux["src_amp"] * ricker(t_, aux["src_f0"],
                                         aux["src_t0"]))
            return field.at[:, aux["src_elems"]].add(
                vecs * r[None, :].astype(self.dtype))

        def post(u, s):
            if self.damp_u is None:
                return u, s
            return u * aux["damp_u"], s * aux["damp_s"]

        lf = compose_lf_step(
            vel=vel, stress=stress,
            inject_u=lambda du, t_: inject(du, aux.get("src_vu"), t_),
            inject_s=lambda ds, t_: inject(ds, aux.get("src_vs"), t_),
            post=post, dt=self.dt, order=self.order,
        )
        return lf(carry[0], carry[1], t)

    # --- driver ---------------------------------------------------------
    def _aux(self):
        aux = dict(rmat=self._rmat, take=self._take, gather=self._gather,
                   combo=self._combo, sign=self._sign)
        if self.damp_u is not None:
            aux["damp_u"], aux["damp_s"] = self.damp_u, self.damp_s
        if self.src is not None:
            for k in ("elems", "vu", "vs", "f0", "t0", "amp"):
                aux["src_" + k] = self.src[k]
        if self.rcv is not None:
            aux["rcv_elems"] = self.rcv["elems"]
            aux["rcv_w"] = self.rcv["w"]
        return aux

    def _aux_specs(self):
        specs = dict(rmat=P(), take=P(AXIS), gather=P(AXIS),
                     combo=P(AXIS), sign=P(AXIS))
        if self.damp_u is not None:
            specs["damp_u"] = specs["damp_s"] = P(None, AXIS)
        if self.src is not None:
            for k in ("elems", "vu", "vs", "f0", "t0", "amp"):
                specs["src_" + k] = P(AXIS)
        if self.rcv is not None:
            specs["rcv_elems"] = P(AXIS)
            specs["rcv_w"] = P(AXIS)
        return specs

    def _go(self):
        if hasattr(self, "_go_fn"):
            return self._go_fn
        d = self.d
        import dataclasses as _dc

        lane = P(None, AXIS)
        d_specs = _dc.replace(
            d, dr=P(), lift=P(), rmat=P(), drr=P(), ginv=lane, nrm=lane,
            fsc=lane, beta=lane, delta=lane, irho=lane, lam=lane, mu=lane)
        aux_specs = self._aux_specs()

        def inner(d_g, aux_g, ulm, slm, k0, n):
            aux = dict(aux_g)
            for k in list(aux):
                if k in _STACKED or k.startswith(("src_", "rcv_")):
                    aux[k] = aux[k][0]

            def body(carry, k):
                carry = self._step_loc(
                    d_g, aux, carry, k.astype(self.dtype) * self.dt)
                if self.rcv is not None:
                    g = carry[0][:, aux["rcv_elems"]]
                    g3 = g.reshape(d.dim, d.npp, -1)[:, : d.n_p]
                    ys = jax.lax.psum(
                        jnp.einsum("ri,cir->rc", aux["rcv_w"], g3), AXIS)
                else:
                    ys = None
                return carry, ys

            (ulm, slm), seis = jax.lax.scan(
                body, (ulm, slm), jnp.arange(n) + k0)
            return ulm, slm, seis

        def go(d_g, aux_g, ulm, slm, k0, n):
            return jax.shard_map(
                functools.partial(inner, n=n),
                mesh=self.mesh,
                in_specs=(d_specs, aux_specs, lane, lane, P()),
                out_specs=(lane, lane,
                           None if self.rcv is None else P()),
                check_vma=False,
            )(d_g, aux_g, ulm, slm, k0)

        self._go_fn = jax.jit(go, static_argnames=("n",))
        return self._go_fn

    # --- state conversion ------------------------------------------------
    def to_lm_state(self, state: State):
        d = self.d
        perm = jnp.asarray(self._old_of_new)
        return (to_lm(state.u[perm], d.npp, self.E_pad),
                to_lm(state.s[perm], d.npp, self.E_pad))

    def from_lm_state(self, ulm, slm) -> State:
        d = self.d
        inv = jnp.asarray(self._new_of_old)
        return State(
            u=from_lm(ulm, d.n_p, d.npp, d.dim, self.E)[inv],
            s=from_lm(slm, d.n_p, d.npp, d.n_sig, self.E)[inv],
        )

    def run(self, state0: State, n_steps: int, step0: int = 0):
        ulm, slm = self.to_lm_state(state0)
        ulm, slm, seis = self._go()(
            self.d, self._aux(), ulm, slm, jnp.asarray(step0), n_steps)
        return self.from_lm_state(ulm, slm), (
            None if seis is None else np.asarray(seis))

    def run_lm(self, ulm, slm, n_steps: int, step0: int = 0):
        return self._go()(
            self.d, self._aux(), ulm, slm, jnp.asarray(step0), n_steps)
