"""Lane-major upwind/RK4 runner — the dissipative scheme on the v3 engine.

Closes round-2 VERDICT missing #2 for the upwind family: `--scheme
upwind-rk4` (and with it viscoelastic Q) previously ran only on the einsum
oracle (solver/rk4.py, full-field trace gathers).  This runner pairs the
merged exchange-in-kernel Godunov operator (ops/upwind_kernels.py) with
classic RK4 on lane-major state.

Trace carry across stages: the coupled operator is LINEAR in (u, s), so
the (u, traction) payload traces of any stage input are the same linear
combination of carried traces as the fields themselves —
  traces(u + a*k_u) = traces(u) + a*traces(k_u)
— and each RHS application emits the traces of its OUTPUT (du, ds).  The
scan carry is (u, s, payload-traces[, xi]); faces are never re-extracted
from full fields inside the loop.

Viscoelastic Q (ops/viscoelastic.py): the memory-variable ODEs are
elementwise given the unrelaxed elastic stress rate ds_el the kernel
outputs; xi rides the carry as an (L, n_sig*npp, Ls) stack and the
traction trace rows are corrected by -traces(sum_l xi_l) (linear again).

Equivalence oracle: solver/rk4.py + ops/upwind.py (tests/test_upwind_lane
.py).  Scheme semantics match the einsum path exactly: co-located (u, s)
in time, sources evaluated at stage times, damping after the update.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.elastic import ElasticParams, voigt_map
from ..ops.upwind import UpwindData
from ..ops.upwind_kernels import UW_ROWS, build_upwind_rows, \
    upwind_rhs_merged
from .lane_merged import MergedLaneRunner
from .source import SourceData, ricker
from .timestep import State, inject_columns


class UpwindLaneRunner(MergedLaneRunner):
    """RK4 + Godunov-flux runner on the merged lane pipeline.

    Extra args vs MergedLaneRunner: w (UpwindData — impedances + boundary
    ghosts) and visco (ViscoData or None).  State semantics: u and s are
    CO-LOCATED in time (no staggering), matching solver/rk4.py.
    """

    def __init__(
        self,
        p: ElasticParams,
        ex,
        w: UpwindData,
        dt: float,
        src: SourceData | None = None,
        damp: jax.Array | None = None,
        receivers=None,
        record_pressure: bool = False,
        block: int | None = None,
        interpret: bool = False,
        visco=None,
    ):
        self._setup_core(p, ex, dt, block, interpret, damp=None,
                         stiffness=None, pay=2 * p.dim)
        d, plan, E = self.d, self.plan, self.E
        self.record_pressure = record_pressure
        old_of_new = self._old_of_new

        # impedance/ghost rows in lane layout
        self.uwg = jnp.asarray(
            self._place(build_upwind_rows(w)[:, old_of_new]), self.dtype)
        assert self.uwg.shape[0] == UW_ROWS

        # RK4 damps BOTH fields (and xi) after the update; traces are
        # damped with the face-node values (restriction commutes with the
        # per-node diagonal)
        if damp is not None:
            dmp = np.asarray(damp)[old_of_new]  # (E, n_p)
            dn = np.zeros((d.npp, E), dtype=np.float32)
            dn[: d.n_p] = dmp.T
            dn = self._place(dn)
            self.damp_u = jnp.asarray(np.tile(dn, (d.dim, 1)), self.dtype)
            self.damp_s = jnp.asarray(
                np.tile(dn, (d.n_sig, 1)), self.dtype)
            fn = np.array(p.fnodes)  # (nf, n_fp)
            dface = dmp[:, fn.reshape(-1)].T  # (nf*n_fp, E)
            dtr = np.ones((plan.nf * plan.rtf, plan.Lt), dtype=np.float32)
            df_lane = self._place(dface)  # (nf*n_fp, Ls)
            for f in range(plan.nf):
                rowsf = df_lane[f * d.n_fp : (f + 1) * d.n_fp]
                for q in range(plan.pay):
                    r0 = f * plan.rtf + q * d.n_fp
                    for t in range(plan.m):
                        dtr[r0 : r0 + d.n_fp,
                            t * plan.NCt + plan.h0
                            : t * plan.NCt + plan.h0 + self.NC] = (
                            rowsf[:, t * plan.NCs
                                  : t * plan.NCs + self.NC])
            self.damp_tr = jnp.asarray(dtr, self.dtype)
        else:
            self.damp_u = self.damp_s = self.damp_tr = None

        self.visco = visco
        if visco is not None:
            yk = np.asarray(visco.y_kappa)[old_of_new].T  # (L, E)
            ym = np.asarray(visco.y_mu)[old_of_new].T
            self.yk = jnp.asarray(
                self._place(yk)[:, None, :], self.dtype)  # (L, 1, Ls)
            self.ym = jnp.asarray(self._place(ym)[:, None, :], self.dtype)
            self.omegas = jnp.asarray(visco.omegas, self.dtype)

        self._build_sources(src, self._new_of_old)
        self._build_receivers(receivers)

    # --- sources (payload trace patches) -------------------------------
    def _build_sources(self, src, new_of_old):
        d, p, plan = self.d, self.p, self.plan
        if src is None:
            self.src_elems = None
            self.src_dense = None
            return
        K = src.elems.shape[0]
        V = voigt_map(d.dim)
        vu = np.zeros((d.dim * d.npp, K), dtype=np.float32)
        vs = np.zeros((d.n_sig * d.npp, K), dtype=np.float32)
        for c in range(d.dim):
            vu[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                src.vec_u[:, :, c]).T
        for c in range(d.n_sig):
            vs[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                src.vec_s[:, :, c]).T
        fnodes = np.array(p.fnodes)
        normals = np.asarray(p.normals)
        elems_old = np.asarray(src.elems)
        vec_u = np.asarray(src.vec_u)
        vec_s = np.asarray(src.vec_s)
        # combined payload patch: u rows then traction rows per face
        rtf = plan.rtf
        trp = np.zeros((d.nf * rtf, K), dtype=np.float32)
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
        sl, tl = self._slane(e_new), self._tlane(e_new)
        self.src_elems = jnp.asarray(sl, jnp.int32)
        self.src_elems_tr = jnp.asarray(tl, jnp.int32)
        self._src_unique = bool(np.unique(e_new).size == e_new.size)
        self.src_vu = jnp.asarray(vu, self.dtype)
        self.src_vs = jnp.asarray(vs, self.dtype)
        self.src_trp = jnp.asarray(trp, self.dtype)
        self.src_f0, self.src_t0, self.src_amp = src.f0, src.t0, src.amp

        # dense wavelet groups (see lane_merged._build_sources)
        self.src_dense = None
        self._src_groups = []
        f0a = np.broadcast_to(np.asarray(src.f0, np.float64), (K,))
        t0a = np.broadcast_to(np.asarray(src.t0, np.float64), (K,))
        ampa = np.broadcast_to(np.asarray(src.amp, np.float64), (K,))
        groups: dict = {}
        for k in range(K):
            key = (round(float(f0a[k]), 12), round(float(t0a[k]), 12))
            groups.setdefault(key, []).append(k)
        # viscoelastic runs skip the kernel-fused dense injection: the
        # source must enter the RELAXED stress balance AFTER the
        # anelastic target is computed (solver/rk4.py:78-93), so it
        # cannot be folded into the kernel that emits ds_el
        if len(groups) <= 2 and self.visco is None:
            dense = []
            for (f0g, t0g), idx in groups.items():
                Su = np.zeros((d.dim * d.npp, plan.Ls), np.float32)
                Ss = np.zeros((d.n_sig * d.npp, plan.Ls), np.float32)
                for k in idx:
                    Su[:, sl[k]] += vu[:, k] * ampa[k]
                    Ss[:, sl[k]] += vs[:, k] * ampa[k]
                dense.append((jnp.asarray(Su, self.dtype),
                              jnp.asarray(Ss, self.dtype)))
                self._src_groups.append((f0g, t0g))
            self.src_dense = tuple(dense)

    def _aux(self):
        aux = {"mask": self.mask, "uwg": self.uwg}
        if self.damp_u is not None:
            aux["damp_u"] = self.damp_u
            aux["damp_s"] = self.damp_s
            aux["damp_tr"] = self.damp_tr
        if self.src_elems is not None:
            if self.src_dense is not None:
                aux["src_dense"] = self.src_dense
            else:
                aux["src_vu"], aux["src_vs"] = self.src_vu, self.src_vs
                aux["src_trp"] = self.src_trp
        if self.rcv is not None:
            aux["rcv_w"] = self.rcv.weights
        if self.visco is not None:
            aux["yk"], aux["ym"] = self.yk, self.ym
            aux["omegas"] = self.omegas
        return aux

    # --- payload traces -------------------------------------------------
    def payload_traces(self, ulm, slm):
        """(u, traction) payload traces of lane-major state, placed in the
        face-major trace layout — seeds the scan carry."""
        d, plan = self.d, self.plan
        V = voigt_map(d.dim)
        tr_u = [self._rmat @ ulm[c * d.npp : (c + 1) * d.npp]
                for c in range(d.dim)]
        tr_sig = [self._rmat @ slm[c * d.npp : (c + 1) * d.npp]
                  for c in range(d.n_sig)]
        tr_t = []
        for c in range(d.dim):
            t = sum(self._nrm_exp[dd] * tr_sig[V[c, dd]]
                    for dd in range(d.dim))
            tr_t.append(t)
        return self._payload_place(tr_u, tr_t)

    def _traction_rows(self, x_lm):
        """Traction rows (own normals) of a lane-major Voigt field."""
        d = self.d
        V = voigt_map(d.dim)
        tr_sig = [self._rmat @ x_lm[c * d.npp : (c + 1) * d.npp]
                  for c in range(d.n_sig)]
        return [
            sum(self._nrm_exp[dd] * tr_sig[V[c, dd]]
                for dd in range(d.dim))
            for c in range(d.dim)
        ]

    def _payload_place(self, u_rows, t_rows):
        """[(ftpp, Ls) rows per component] -> (nf*rtf, Lt) face-major."""
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
        blk = jnp.concatenate(blocks, axis=0)  # (nf*rtf, Ls)
        out = jnp.zeros((plan.nf * plan.rtf, plan.Lt), dtype=blk.dtype)
        for t in range(plan.m):
            out = jax.lax.dynamic_update_slice(
                out, blk[:, t * plan.NCs : t * plan.NCs + self.NC],
                (0, t * plan.NCt + plan.h0))
        return out

    # --- RK4 step --------------------------------------------------------
    def _rhs(self, d, aux, ulm, slm, tr, xi, t_):
        plan, mask, itp = self.plan, aux["mask"], self.interpret
        dense = aux.get("src_dense")
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
            r = (self.src_amp
                 * ricker(t_, self.src_f0, self.src_t0))[None, :]
            r = r.astype(self.dtype)
            du = inject_columns(du, self.src_elems, aux["src_vu"] * r,
                                unique=self._src_unique)
            ds = inject_columns(ds, self.src_elems,
                                aux["src_vs"] * r,
                                unique=self._src_unique)
            trk = inject_columns(trk, self.src_elems_tr,
                                 aux["src_trp"] * r,
                                 unique=self._src_unique)
            return du, ds, trk

        if self.visco is None:
            if self.src_elems is not None and dense is None:
                du, ds_el, trk = add_columns(du, ds_el, trk, t_)
            return du, ds_el, trk, None
        from ..ops.viscoelastic import anelastic_rates_lm

        d_ = self.d
        dxi, xi_sum = anelastic_rates_lm(
            ds_el, xi, aux["yk"], aux["ym"], aux["omegas"],
            d_.dim, d_.n_sig, d_.npp)
        ds = ds_el - xi_sum
        trk = trk - self._payload_place(
            None, self._traction_rows(xi_sum))
        if self.src_elems is not None:
            du, ds, trk = add_columns(du, ds, trk, t_)
        return du, ds, trk, dxi

    def step_with(self, d, aux, carry, t):
        ulm, slm, tr, xi = carry
        h = self.dt
        h2 = 0.5 * h

        def comb(a, b, w):
            return a if b is None else a + w * b

        k1 = self._rhs(d, aux, ulm, slm, tr, xi, t)
        k2 = self._rhs(
            d, aux, ulm + h2 * k1[0], slm + h2 * k1[1], tr + h2 * k1[2],
            comb(xi, k1[3], h2), t + h2)
        k3 = self._rhs(
            d, aux, ulm + h2 * k2[0], slm + h2 * k2[1], tr + h2 * k2[2],
            comb(xi, k2[3], h2), t + h2)
        k4 = self._rhs(
            d, aux, ulm + h * k3[0], slm + h * k3[1], tr + h * k3[2],
            comb(xi, k3[3], h), t + h)
        w = h / 6.0
        u_n = ulm + w * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        s_n = slm + w * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        tr_n = tr + w * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        if xi is not None:
            xi = xi + w * (k1[3] + 2 * k2[3] + 2 * k3[3] + k4[3])
        if self.damp_u is not None:
            u_n = u_n * aux["damp_u"]
            s_n = s_n * aux["damp_s"]
            tr_n = tr_n * aux["damp_tr"]
            if xi is not None:
                xi = xi * aux["damp_s"][None]
        return u_n, s_n, tr_n, xi

    # --- drivers ---------------------------------------------------------
    def _go(self):
        if not hasattr(self, "_go_fn"):

            @functools.partial(jax.jit, static_argnames=("n",))
            def go(d, aux, ulm, slm, xi, n, k0):
                trs = self.payload_traces(ulm, slm)

                def body(carry, k):
                    carry = self.step_with(
                        d, aux, carry, k.astype(self.dtype) * self.dt)
                    ys = (
                        self._sample(aux, carry[0], carry[1])
                        if self.rcv is not None
                        else None
                    )
                    return carry, ys

                (ulm, slm, trs, xi), seis = jax.lax.scan(
                    body, (ulm, slm, trs, xi), jnp.arange(n) + k0)
                return ulm, slm, xi, seis

            self._go_fn = go
        return self._go_fn

    def _xi0(self, slm):
        if self.visco is None:
            return None
        return jnp.zeros((self.visco.L,) + slm.shape, dtype=slm.dtype)

    def run(self, state0: State, n_steps: int, step0: int = 0,
            xi0=None):
        ulm, slm = self.to_lm_state(state0)
        xi = self._xi0(slm) if xi0 is None else xi0
        ulm, slm, xi, seis = self._go()(
            self.d, self._aux(), ulm, slm, xi, n_steps,
            jnp.asarray(step0))
        out = self.from_lm_state(ulm, slm)
        return out, (None if seis is None else np.asarray(seis))

    def run_lm(self, ulm, slm, n_steps: int, step0: int = 0, xi0=None):
        xi = self._xi0(slm) if xi0 is None else xi0
        ulm, slm, xi, seis = self._go()(
            self.d, self._aux(), ulm, slm, xi, n_steps,
            jnp.asarray(step0))
        return ulm, slm, seis

    # --- xi layout round-trip (checkpoint/resume chunks) ---------------
    def xi_to_lm(self, xi_std):
        """(E, n_p, n_sig, L) standard -> (L, n_sig*npp, Ls)."""
        return jnp.stack(
            [self._to_lm(xi_std[..., l], self.d.n_sig)
             for l in range(self.visco.L)], axis=0)

    def xi_from_lm(self, xi_lm):
        return jnp.stack(
            [self._from_lm(xi_lm[l], self.d.n_sig)
             for l in range(self.visco.L)], axis=-1)

    def run_xi(self, state0: State, xi_std, n_steps: int, step0: int = 0):
        """Viscoelastic chunked driver: standard-layout xi in and out
        (None xi_std = zeros)."""
        ulm, slm = self.to_lm_state(state0)
        xi = (self._xi0(slm) if xi_std is None
              else self.xi_to_lm(xi_std))
        ulm, slm, xi, seis = self._go()(
            self.d, self._aux(), ulm, slm, xi, n_steps,
            jnp.asarray(step0))
        return (self.from_lm_state(ulm, slm),
                None if xi is None else self.xi_from_lm(xi),
                None if seis is None else np.asarray(seis))
