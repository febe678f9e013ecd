"""Slab-sharded upwind-RK4 (+viscoelastic) runner — DD for the
dissipative scheme.

VERDICT r4 (next-round #8): the physics x parallelism matrix had two
empty cells — upwind-RK4 and viscoelastic Q ran single-chip only.  This
closes both with ONE class: the slab decomposition, trace-plane
ppermute halo fill, per-class lane layout, and source/receiver packing
are inherited from ShardedFusedRunner verbatim (the machinery is
payload-size agnostic — the plan just carries pay=2*dim (u, traction)
rows per face instead of the LF engines' dim), and the step is the
structured upwind runner's RK4 with the sharded halo fill inside each
stage RHS.  Viscoelastic memory variables xi are ELEMENTWISE in the
element index, so they shard trivially along the lane axis with the
state — no extra communication.

Trace carry across RK4 stages is linear (solver/lane_upwind.py): each
stage RHS emits the traces of its output, and stage inputs' traces are
the same axpy combination as the fields.  The halo fill runs once per
stage consume (4/step), exactly the single-chip data flow plus the
plane ppermute.

Equivalence oracle: UpwindLaneRunner at 1..8 virtual shards
(tests/test_upwind_sharded.py, partition invariance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.elastic import voigt_map
from ..ops.upwind import UpwindData
from ..ops.upwind_kernels import UW_ROWS, build_upwind_rows, \
    upwind_rhs_merged
from ..solver.source import ricker
from ..solver.timestep import State, inject_columns
from .fused_sharded import AXIS, ShardedFusedRunner


class ShardedUpwindRunner(ShardedFusedRunner):
    """RK4 + Godunov flux on the slab-sharded merged pipeline."""

    def __init__(
        self,
        p,
        ex,
        w: UpwindData,
        dt: float,
        n_shards: int,
        src=None,
        damp=None,
        receivers=None,
        block: int | None = None,
        interpret: bool = False,
        devices=None,
        fill_mode: str = "auto",
        visco=None,
    ):
        self.visco = visco
        # damp handled here (RK4 damps u, s, AND carried traces); the
        # base runner's LF damp plumbing expects the stress_axpy fold
        super().__init__(
            p, ex, dt, n_shards, order=4, src=src, damp=None,
            receivers=receivers, block=block, interpret=interpret,
            devices=devices, overlap=False, fill_mode=fill_mode,
            packed=False, pay=2 * p.dim)
        d, plan = self.d, self.plan
        old_of_new = self._old_of_new

        self.uwg = jnp.asarray(
            self._place(build_upwind_rows(w)[:, old_of_new]), self.dtype)
        assert self.uwg.shape[0] == UW_ROWS

        if damp is not None:
            dmp = np.asarray(damp)[old_of_new]  # (E, n_p) dense-new
            dn = np.zeros((d.npp, self.E), dtype=np.float32)
            dn[: d.n_p] = dmp.T
            dn = self._place(dn)
            self.damp_u = jnp.asarray(
                np.tile(dn, (d.dim, 1)), self.dtype)
            self.damp_s = jnp.asarray(
                np.tile(dn, (d.n_sig, 1)), self.dtype)
            fn = np.array(p.fnodes)
            dface = dmp[:, fn.reshape(-1)].T  # (nf*n_fp, E) dense-new
            dtr = np.ones((plan.nf * plan.rtf, self.Lt), dtype=np.float32)
            for p_ in range(self.P):
                for t in range(self.m):
                    cols = dface[:, (p_ * self.m + t) * self.NCloc
                                 : (p_ * self.m + t + 1) * self.NCloc]
                    base = p_ * plan.Lt + t * plan.NCt + plan.h0
                    for f in range(plan.nf):
                        rowsf = cols[f * d.n_fp : (f + 1) * d.n_fp]
                        for q in range(plan.pay):
                            r0 = f * plan.rtf + q * d.n_fp
                            dtr[r0 : r0 + d.n_fp,
                                base : base + self.NCloc] = rowsf
            self.damp_tr = jnp.asarray(dtr, self.dtype)
        else:
            self.damp_u = self.damp_s = self.damp_tr = None

        if visco is not None:
            yk = np.asarray(visco.y_kappa)[old_of_new].T  # (L, E)
            ym = np.asarray(visco.y_mu)[old_of_new].T
            self.yk = jnp.asarray(
                self._place(yk)[:, None, :], self.dtype)  # (L, 1, Ls)
            self.ym = jnp.asarray(self._place(ym)[:, None, :], self.dtype)
            self.omegas = jnp.asarray(visco.omegas, self.dtype)

    # --- sources: combined (u, traction) payload patch ------------------
    def _build_sources(self, p, src, new_of_old):
        d, plan = self.d, self.plan
        if src is None:
            self.src = None
            self.src_dense = None
            return
        st = self._pack_state_sources(src)
        K = src.elems.shape[0]
        V = voigt_map(d.dim)
        vu, vs = self._lane_source_vecs(src)
        fnodes = np.array(p.fnodes)
        normals = np.asarray(p.normals)
        elems_old = np.asarray(src.elems)
        vec_u = np.asarray(src.vec_u)
        vec_s = np.asarray(src.vec_s)
        rtf = plan.rtf
        trp = np.zeros((d.nf * rtf, K), dtype=np.float64)
        for c in range(d.dim):
            for f in range(d.nf):
                ru = f * rtf + c * d.n_fp + np.arange(d.n_fp)
                rt = f * rtf + (d.dim + c) * d.n_fp + np.arange(d.n_fp)
                trp[ru] = vec_u[:, fnodes[f], c].T
                acc = np.zeros((K, d.n_fp))
                for dd in range(d.dim):
                    acc += (normals[elems_old, f, dd][:, None]
                            * vec_s[:, fnodes[f], V[c, dd]])
                trp[rt] = acc.T
        e_new = new_of_old[elems_old]
        shard = e_new // (self.m * self.NCloc)
        tl = self._lane(e_new, trace=True) - shard * plan.Lt
        S_max = st["elems"].shape[1]
        elems_tr_sh = np.zeros((self.P, S_max), dtype=np.int32)
        trp_sh = np.zeros((self.P, trp.shape[0], S_max), np.float64)
        fill = np.zeros(self.P, dtype=np.int64)
        for kk in range(K):
            p_ = shard[kk]
            j = fill[p_]
            elems_tr_sh[p_, j] = tl[kk]
            trp_sh[p_, :, j] = trp[:, kk]
            fill[p_] += 1

        # dense wavelet groups (global lane-major, lane-sharded); the
        # viscoelastic source must enter the RELAXED balance, so the
        # kernel-fused fold is elastic-only (solver/lane_upwind.py)
        self.src_dense = None
        self._src_groups = []
        f0a = np.broadcast_to(np.asarray(src.f0, np.float64), (K,))
        t0a = np.broadcast_to(np.asarray(src.t0, np.float64), (K,))
        ampa = np.broadcast_to(np.asarray(src.amp, np.float64), (K,))
        groups: dict = {}
        for kk in range(K):
            key = (round(float(f0a[kk]), 12), round(float(t0a[kk]), 12))
            groups.setdefault(key, []).append(kk)
        if len(groups) <= 2 and self.visco is None:
            sl_g = self._lane(e_new)
            dense = []
            for (f0g, t0g), idx in groups.items():
                Su = np.zeros((d.dim * d.npp, self.Ls), np.float64)
                Ss = np.zeros((d.n_sig * d.npp, self.Ls), np.float64)
                for kk in idx:
                    Su[:, sl_g[kk]] += vu[:, kk] * ampa[kk]
                    Ss[:, sl_g[kk]] += vs[:, kk] * ampa[kk]
                dense.append((jnp.asarray(Su, self.dtype),
                              jnp.asarray(Ss, self.dtype)))
                self._src_groups.append((f0g, t0g))
            self.src_dense = tuple(dense)
        self.src = dict(
            st,
            elems_tr=jnp.asarray(elems_tr_sh),
            trp=jnp.asarray(trp_sh, self.dtype),
        )

    # --- aux ------------------------------------------------------------
    def _aux_global(self):
        aux = {"uwg": self.uwg}
        if self.damp_u is not None:
            aux["damp_u"] = self.damp_u
            aux["damp_s"] = self.damp_s
            aux["damp_tr"] = self.damp_tr
        if self.src is not None:
            if self.src_dense is not None:
                aux["dense_src"] = self.src_dense
            else:
                for k in ("elems", "elems_tr", "vu", "vs", "trp",
                          "f0", "t0", "amp"):
                    aux["src_" + k] = self.src[k]
        if self.rcv is not None:
            aux["rcv_elems"] = self.rcv["elems"]
            aux["rcv_w"] = self.rcv["w"]
        if self.visco is not None:
            aux["yk"], aux["ym"] = self.yk, self.ym
            aux["omegas"] = self.omegas
        return aux

    def _aux_specs(self):
        lane = P(None, AXIS)
        specs = {"uwg": lane}
        if self.damp_u is not None:
            specs["damp_u"] = lane
            specs["damp_s"] = lane
            specs["damp_tr"] = lane
        if self.src is not None:
            if self.src_dense is not None:
                specs["dense_src"] = tuple(
                    (lane, lane) for _ in self.src_dense)
            else:
                for k in ("src_elems", "src_elems_tr", "src_vu",
                          "src_vs", "src_trp", "src_f0", "src_t0",
                          "src_amp"):
                    specs[k] = P(AXIS)
        if self.rcv is not None:
            specs["rcv_elems"] = P(AXIS)
            specs["rcv_w"] = P(AXIS)
        if self.visco is not None:
            specs["yk"] = P(None, None, AXIS)
            specs["ym"] = P(None, None, AXIS)
            specs["omegas"] = P()
        return specs

    # --- shard-local payload traces -------------------------------------
    def _payload_traces_loc(self, ulm, slm, nrm_exp, rmat):
        d, plan = self.d, self.plan
        V = voigt_map(d.dim)
        tr_u = [rmat @ ulm[c * d.npp : (c + 1) * d.npp]
                for c in range(d.dim)]
        tr_sig = [rmat @ slm[c * d.npp : (c + 1) * d.npp]
                  for c in range(d.n_sig)]
        tr_t = [
            sum(nrm_exp[dd] * tr_sig[V[c, dd]] for dd in range(d.dim))
            for c in range(d.dim)
        ]
        return self._payload_place_loc(tr_u, tr_t)

    def _traction_rows_loc(self, x_lm, nrm_exp, rmat):
        d = self.d
        V = voigt_map(d.dim)
        tr_sig = [rmat @ x_lm[c * d.npp : (c + 1) * d.npp]
                  for c in range(d.n_sig)]
        return [
            sum(nrm_exp[dd] * tr_sig[V[c, dd]] for dd in range(d.dim))
            for c in range(d.dim)
        ]

    def _payload_place_loc(self, u_rows, t_rows):
        d, plan = self.d, self.plan
        nfp = d.n_fp
        pad = plan.rtf - plan.pay * nfp
        zeros = None
        blocks = []
        for f in range(plan.nf):
            for rows in (u_rows, t_rows):
                for c in range(d.dim):
                    src = (rows[c][f * nfp : (f + 1) * nfp]
                           if rows is not None else None)
                    if src is None:
                        if zeros is None:
                            zeros = jnp.zeros(
                                (nfp, plan.Ls), dtype=self.dtype)
                        src = zeros
                    blocks.append(src)
            if pad:
                blocks.append(jnp.zeros((pad, plan.Ls), self.dtype))
        blk = jnp.concatenate(blocks, axis=0)
        out = jnp.zeros((plan.nf * plan.rtf, plan.Lt), dtype=blk.dtype)
        for t in range(self.m):
            out = jax.lax.dynamic_update_slice(
                out, blk[:, t * plan.NCs : t * plan.NCs + self.NCloc],
                (0, t * plan.NCt + plan.h0))
        return out

    # --- RK4 step (shard-local) -----------------------------------------
    def _rhs_loc(self, d, aux, mask, nrm_exp, rmat, ulm, slm, tr, xi, t_):
        plan, itp = self.plan, self.interpret
        dense = aux.get("dense_src")
        inject = None
        if dense is not None:
            inject = []
            for g in range(len(dense)):
                f0g, t0g = self._src_groups[g]
                r = jnp.full((8, plan.Ls), ricker(t_, f0g, t0g),
                             self.dtype)
                inject.append((dense[g][0], dense[g][1], r))
        du, ds_el, trk = upwind_rhs_merged(
            plan, d, aux["uwg"], ulm, slm, self._fill_halo(tr), mask,
            interpret=itp, inject=inject)

        def add_columns(du, ds, trk, t_):
            r = (aux["src_amp"]
                 * ricker(t_, aux["src_f0"], aux["src_t0"]))[None, :]
            r = r.astype(self.dtype)
            du = inject_columns(du, aux["src_elems"], aux["src_vu"] * r)
            ds = inject_columns(ds, aux["src_elems"], aux["src_vs"] * r)
            trk = inject_columns(trk, aux["src_elems_tr"],
                                 aux["src_trp"] * r)
            return du, ds, trk

        if self.visco is None:
            if self.src is not None and dense is None:
                du, ds_el, trk = add_columns(du, ds_el, trk, t_)
            return du, ds_el, trk, None
        from ..ops.viscoelastic import anelastic_rates_lm

        dxi, xi_sum = anelastic_rates_lm(
            ds_el, xi, aux["yk"], aux["ym"], aux["omegas"],
            d.dim, d.n_sig, d.npp)
        ds = ds_el - xi_sum
        trk = trk - self._payload_place_loc(
            None, self._traction_rows_loc(xi_sum, nrm_exp, rmat))
        if self.src is not None and dense is None:
            du, ds, trk = add_columns(du, ds, trk, t_)
        return du, ds, trk, dxi

    def _step_loc(self, d, aux, mask, nrm_exp, rmat, carry, t):
        ulm, slm, tr, xi = carry
        h = self.dt
        h2 = 0.5 * h

        def comb(a, b, w):
            return a if b is None else a + w * b

        rhs = functools.partial(self._rhs_loc, d, aux, mask, nrm_exp,
                                rmat)
        k1 = rhs(ulm, slm, tr, xi, t)
        k2 = rhs(ulm + h2 * k1[0], slm + h2 * k1[1], tr + h2 * k1[2],
                 comb(xi, k1[3], h2), t + h2)
        k3 = rhs(ulm + h2 * k2[0], slm + h2 * k2[1], tr + h2 * k2[2],
                 comb(xi, k2[3], h2), t + h2)
        k4 = rhs(ulm + h * k3[0], slm + h * k3[1], tr + h * k3[2],
                 comb(xi, k3[3], h), t + h)
        w = h / 6.0
        u_n = ulm + w * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        s_n = slm + w * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        tr_n = tr + w * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        has_xi = self.visco is not None  # elastic carries a () placeholder
        if has_xi:
            xi = xi + w * (k1[3] + 2 * k2[3] + 2 * k3[3] + k4[3])
        if self.damp_u is not None:
            u_n = u_n * aux["damp_u"]
            s_n = s_n * aux["damp_s"]
            tr_n = tr_n * aux["damp_tr"]
            if has_xi:
                xi = xi * aux["damp_s"][None]
        return u_n, s_n, tr_n, xi

    # --- driver ----------------------------------------------------------
    def _go(self):
        if hasattr(self, "_go_fn"):
            return self._go_fn
        d = self.d
        import dataclasses as _dc

        d_specs = _dc.replace(
            d, drr=P(), lift=P(), erep=P(), geo=P(None, AXIS),
            damp=None, gexp=None)
        aux_specs = self._aux_specs()
        has_xi = self.visco is not None

        def inner(d_g, aux_g, mask_g, nrm_g, rmat_g, ulm, slm, xi, k0, n):
            aux = dict(aux_g)
            for k in list(aux):
                if k.startswith(("src_", "rcv_")):
                    aux[k] = aux[k][0]
            trs = self._payload_traces_loc(ulm, slm, nrm_g, rmat_g)

            def body(carry, k):
                carry = self._step_loc(
                    d_g, aux, mask_g, nrm_g, rmat_g, carry,
                    k.astype(self.dtype) * self.dt)
                if self.rcv is not None:
                    g = carry[0][:, aux["rcv_elems"]]
                    g3 = g.reshape(d.dim, d.npp, -1)
                    partial = jnp.einsum("ri,cir->rc", aux["rcv_w"], g3)
                    ys = jax.lax.psum(partial, AXIS)
                else:
                    ys = None
                return carry, ys

            (ulm, slm, trs, xi), seis = jax.lax.scan(
                body, (ulm, slm, trs, xi), jnp.arange(n) + k0)
            return ulm, slm, xi, seis

        def go(d_g, aux_g, mask_g, nrm_g, rmat_g, ulm, slm, xi, k0, n):
            return jax.shard_map(
                functools.partial(inner, n=n),
                mesh=self.mesh,
                in_specs=(d_specs, aux_specs, P(None, AXIS),
                          P(None, None, AXIS), P(), P(None, AXIS),
                          P(None, AXIS),
                          P(None, None, AXIS) if has_xi else P(), P()),
                out_specs=(P(None, AXIS), P(None, AXIS),
                           P(None, None, AXIS) if has_xi else P(),
                           None if self.rcv is None else P()),
                check_vma=False,
            )(d_g, aux_g, mask_g, nrm_g, rmat_g, ulm, slm, xi, k0)

        self._go_fn = jax.jit(go, static_argnames=("n",))
        return self._go_fn

    def _xi0(self, slm):
        if self.visco is None:
            return jnp.zeros((), self.dtype)  # P() placeholder
        return jnp.zeros((self.visco.L,) + slm.shape, dtype=slm.dtype)

    def run(self, state0: State, n_steps: int, step0: int = 0):
        ulm, slm = self.to_lm_state(state0)
        xi = self._xi0(slm)
        ulm, slm, xi, seis = self._go()(
            self.d, self._aux_global(), self.mask, self._nrm_exp,
            self._rmat, ulm, slm, xi, jnp.asarray(step0), n_steps)
        out = self.from_lm_state(ulm, slm)
        return out, (None if seis is None else np.asarray(seis))
