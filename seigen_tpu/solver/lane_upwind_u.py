"""Upwind/RK4 runner for UNSTRUCTURED meshes — the dissipative scheme
(and with it viscoelastic Q) on the lane-take fast path.

Round-3 closure of the last physics x mesh-type matrix cell: `--scheme
upwind-rk4` rode the merged exchange-in-kernel pipeline on STRUCTURED
meshes (solver/lane_upwind.py) but fell to the einsum oracle on Gmsh /
scrambled meshes — and the reference's production runs were unstructured
(SURVEY.md §3).  This runner pairs the coupled Godunov kernel with the
face-bijection panel machinery of the unstructured LF runner:

- **Panels per RHS.**  Each RK4 stage re-extracts its input's (u,
  traction) panels with the existing gathers (_pg_u / _pg_t — one-hot
  MXU restriction + producer-side normal contraction + nf lane takes);
  the consumer-side (f2, pi)-select runs INSIDE the coupled kernel
  (ops/pallas_kernels._upwind_kernel_sel).  No trace carry is needed:
  unlike the merged runner there is no supercell window to fill, so
  re-extraction is the simpler and equally-fast formulation here.
- **Ghosts in the select signs.**  Boundary faces self-pair (the select
  resolves them to the own trace), so the Godunov ghost coefficients
  (free: t+ = -t-; rigid: u+ = -u-; absorbing: zero exterior) fold into
  the per-face sign rows: sign_u = gu on boundary (+1 interior), sign_t
  = gt on boundary (-1 interior — conforming faces have opposite
  normals, and panels carry producer-contracted tractions).
- **Viscoelastic xi** (ops/viscoelastic.py) is elementwise on lane rows,
  exactly as in the merged runner minus the trace correction.

Equivalence oracle: solver/rk4.py + ops/upwind.py on scrambled meshes
(tests/test_upwind_lane_u.py).  Scheme semantics match the einsum path:
co-located (u, s), sources at stage times, damping after the update.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.elastic import ElasticParams
from ..ops.pallas_kernels import upwind_rhs_lm_sel, upwind_rhs_lm_sel_axpy
from ..ops.upwind import UpwindData
from .lane_major import from_lm, to_lm
from .lane_unstructured import UnstructuredLaneRunner
from .source import SourceData, ricker
from .timestep import State


class UnstructuredUpwindRunner(UnstructuredLaneRunner):
    """RK4 + Godunov flux on the unstructured lane-take pipeline.

    Extra args vs UnstructuredLaneRunner: w (UpwindData) and visco
    (ViscoData or None).  State semantics: u and s CO-LOCATED in time.
    """

    def __init__(
        self,
        p: ElasticParams,
        w: UpwindData,
        dt: float,
        *,
        centroids=None,
        src: SourceData | None = None,
        damp=None,
        receivers=None,
        record_pressure: bool = False,
        block: int | None = None,
        interpret: bool = False,
        visco=None,
        fused_axpy: bool = True,
        panel_emit: bool = False,
    ):
        kw = {} if block is None else {"block": block}
        super().__init__(p, dt, centroids=centroids, src=src, damp=damp,
                         receivers=receivers,
                         record_pressure=record_pressure,
                         interpret=interpret, **kw)
        d, E, E_pad = self.d, self.E, self.E_pad
        old = self._old_of_new
        nf, nfp = p.n_faces, p.n_fp

        # impedance rows: neighbour Zp/Zs expanded to face nodes, own in
        # rows 0/1 of an 8-aligned section (new element order)
        def exp_face(a):  # (E, nf) old order -> (ftpp, E) new order
            rows = np.zeros((d.ftpp, E), dtype=np.float64)
            an = a[old]
            for f in range(nf):
                rows[f * nfp : (f + 1) * nfp] = an[:, f][None, :]
            return rows

        self.zpn = jnp.asarray(
            exp_face(np.asarray(w.zp_nbr[:, :, 0])), self.dtype)
        self.zsn = jnp.asarray(
            exp_face(np.asarray(w.zs_nbr[:, :, 0])), self.dtype)
        zo = np.zeros((8, E), dtype=np.float64)
        zo[0] = np.asarray(w.zp_own[:, 0, 0])[old]
        zo[1] = np.asarray(w.zs_own[:, 0, 0])[old]
        self.zown = jnp.asarray(zo, self.dtype)

        # ghost coefficients folded into the per-face select signs
        pr = self.pairing  # already permuted to the new order
        boundary = (pr.e2 == np.arange(E)[:, None]) & (
            pr.f2 == np.arange(nf)[None, :])
        gu = np.asarray(w.ghost_u[:, :, 0])[old]
        gt = np.asarray(w.ghost_t[:, :, 0])[old]
        su = np.zeros((8, E_pad), dtype=np.float32)
        st = np.zeros((8, E_pad), dtype=np.float32)
        su[:nf, :E] = np.where(boundary, gu, 1.0).T
        st[:nf, :E] = np.where(boundary, gt, -1.0).T
        self.sign_u = jnp.asarray(su)
        self.sign_t = jnp.asarray(st)

        self.visco = visco
        # fused RK4 axpys need the raw ds_el for the anelastic rates, so
        # the viscoelastic step keeps the XLA-side stepper glue
        self.fused_axpy = fused_axpy and visco is None
        # concrete dt: the fused kernel bakes the RK4 coefficients in as
        # immediates (self.dt is a device array and would trace)
        self._dt_f = float(dt)

        # dense per-wavelet-group source patterns for KERNEL-fused
        # injection (see lane_merged._build_sources: the blob pattern is
        # constant, only r_g(t) varies, so the stage kernels add r_g*S_g
        # in-register instead of per-stage XLA scatter-adds)
        self.src_dense = None
        self._src_groups = []
        if src is not None and self.fused_axpy:
            K = src.elems.shape[0]
            f0a = np.broadcast_to(np.asarray(src.f0, np.float64), (K,))
            t0a = np.broadcast_to(np.asarray(src.t0, np.float64), (K,))
            ampa = np.broadcast_to(np.asarray(src.amp, np.float64), (K,))
            groups: dict = {}
            for k in range(K):
                key = (round(float(f0a[k]), 12), round(float(t0a[k]), 12))
                groups.setdefault(key, []).append(k)
            if len(groups) <= 2:
                vu = np.asarray(self.src_vu)
                vs = np.asarray(self.src_vs)
                sl = np.asarray(self.src_elems)
                dense = []
                for (f0g, t0g), idx in groups.items():
                    Su = np.zeros((d.dim * d.npp, E_pad), np.float64)
                    Ss = np.zeros((d.n_sig * d.npp, E_pad), np.float64)
                    for k in idx:
                        Su[:, sl[k]] += vu[:, k] * ampa[k]
                        Ss[:, sl[k]] += vs[:, k] * ampa[k]
                    dense.append((jnp.asarray(Su, self.dtype),
                                  jnp.asarray(Ss, self.dtype)))
                    self._src_groups.append((f0g, t0g))
                self.src_dense = tuple(dense)
        # producer-side panel emission (r5 gather lever, opt-in): each
        # stage kernel appends the own-face panels of its EMITTED state
        # (restriction + producer traction contraction in VMEM), so the
        # next stage's gather is ONLY the nf lane takes — the XLA
        # own-rows pass (measured 3.94 of the 6.47 ms panel gather at
        # E=83k P3, results/r5_ab_upwind_u_split.json) never runs.
        # Requires the in-kernel epilogue to emit FINAL state values:
        # fused-axpy path, dense (or no) sources, in-register damp.
        self.panel_emit = False
        if panel_emit:
            if not self.fused_axpy:
                raise ValueError(
                    "panel_emit requires the fused-axpy elastic path")
            if src is not None and self.src_dense is None:
                raise ValueError(
                    "panel_emit requires dense source groups (<= 2 "
                    "distinct wavelets) or no sources — the scatter "
                    "fallback mutates the state after the kernel")
            C, nf_, nfp_, ftp, ftpp, _rows, fc, pm = self._pg_u[3]
            # consumer layout for KERNEL-emitted panels: per-component
            # ftpp sections (aligned rows), so ftp -> ftpp and
            # rows_pad -> C*ftpp in the select's row arithmetic
            self._selcfg_e = (C, nf_, nfp_, ftpp, ftpp, C * ftpp, fc, pm)
            self.panel_emit = True
        if visco is not None:
            def vrows(a):  # (E, L) old order -> (L, 1, E_pad)
                r = np.asarray(a)[old].T
                r = np.pad(r, ((0, 0), (0, E_pad - E)))
                return jnp.asarray(r[:, None, :], self.dtype)

            self.yk = vrows(visco.y_kappa)
            self.ym = vrows(visco.y_mu)
            self.omegas = jnp.asarray(visco.omegas, self.dtype)

    def _aux(self):
        aux = super()._aux()
        aux.pop("cmat", None)  # upwind Hooke is isotropic (visco too)
        aux["uw_combo"] = self._pg_u[1]
        aux["sign_u"], aux["sign_t"] = self.sign_u, self.sign_t
        aux["zpn"], aux["zsn"], aux["zown"] = self.zpn, self.zsn, self.zown
        if self.src_dense is not None:
            aux["src_dense"] = self.src_dense
        if self.fused_axpy and self.damp_u is not None:
            aux["damp_row"] = self.damp_u[: self.d.npp]
        if self.visco is not None:
            aux["yk"], aux["ym"] = self.yk, self.ym
            aux["omegas"] = self.omegas
        return aux

    # --- coupled RHS -----------------------------------------------------
    def _rhs(self, d, aux, ulm, slm, xi, t_):
        out = upwind_rhs_lm_sel(
            d, (aux["zpn"], aux["zsn"], aux["zown"]), ulm, slm,
            self._pg_u[0](ulm), self._pg_t[0](slm), aux["uw_combo"],
            aux["sign_u"], aux["sign_t"], self._pg_u[3],
            self.block, self.interpret)
        du = out[: d.dim * d.npp]
        ds_el = out[d.dim * d.npp :]
        du = self._inject_u(aux, du, t_)
        if self.visco is None:
            return du, self._inject_s(aux, ds_el, t_), None
        from ..ops.viscoelastic import anelastic_rates_lm

        dxi, xi_sum = anelastic_rates_lm(
            ds_el, xi, aux["yk"], aux["ym"], aux["omegas"],
            d.dim, d.n_sig, d.npp)
        return du, self._inject_s(aux, ds_el - xi_sum, t_), dxi

    def _inject_sc(self, aux, xu, xs, t_, c):
        """Add the stage source term, scaled by ``c``, to both blocks."""
        if self.src_elems is None:
            return xu, xs
        r = self.src_amp * ricker(t_, self.src_f0, self.src_t0)
        rr = (c * r)[None, :].astype(self.dtype)
        xu = xu.at[:, self.src_elems].add(aux["src_vu"] * rr)
        xs = xs.at[:, self.src_elems].add(aux["src_vs"] * rr)
        return xu, xs

    # --- producer-side panel emission (opt-in fast path) ---------------
    def _own_rows_e(self, ulm, slm):
        """Initial (TU, TT) own-face panels in the EMISSION layout
        (per-component ftpp sections, E_pad columns) — the scan-entry
        seed; every subsequent step's panels come from the kernels."""
        C, nf, nfp, ftp, ftpp, _rows, _fc, _pm = self._pg_u[3]
        E_pad = ulm.shape[1]

        def relay(T):  # (rows_pad, E) gather layout -> (C*ftpp, E_pad)
            out = jnp.zeros((C * ftpp, E_pad), T.dtype)
            for c in range(C):
                out = out.at[c * ftpp : c * ftpp + ftp, : T.shape[1]].set(
                    T[c * ftp : (c + 1) * ftp])
            return out

        return (relay(self._pg_u[0].own_rows_fn(ulm)),
                relay(self._pg_t[0].own_rows_fn(slm)))

    def _step_emit(self, d, aux, carry, t):
        """Fused RK4 step with producer-side panel emission: carry is
        (ulm, slm, (TU, TT)) — each kernel consumes the lane TAKES of
        the previous kernel's emitted panels and appends the panels of
        its own output; the XLA restriction pass never runs."""
        ulm, slm, (TU, TT) = carry
        h = self._dt_f
        h2, w = 0.5 * h, h / 6.0
        uw = (aux["zpn"], aux["zsn"], aux["zown"])
        dense = aux.get("src_dense")
        damp_row = aux.get("damp_row")
        tku = self._pg_u[0].takes_fn
        tkt = self._pg_t[0].takes_fn

        def inj(t_):
            if dense is None:
                return None
            return [
                (dense[g][0], dense[g][1],
                 jnp.full((8, ulm.shape[1]),
                          ricker(t_, *self._src_groups[g]), self.dtype))
                for g in range(len(dense))
            ]

        def call(uin, sin, TU_, TT_, au, asg, wa, t_, bu=None, bs=None,
                 cs=None, dmp=None):
            return upwind_rhs_lm_sel_axpy(
                d, uw, uin, sin, tku(TU_), tkt(TT_), aux["uw_combo"],
                aux["sign_u"], aux["sign_t"], self._selcfg_e, au, asg,
                wa, bu, bs, cs, inj(t_), dmp, self.block,
                self.interpret, emit=True)

        nu, ns = d.dim * d.npp, d.n_sig * d.npp
        ne = d.dim * d.ftpp

        def split(o):  # stage mode + emission tail
            b = 2 * (nu + ns)
            return (o[:nu], o[nu : nu + ns], o[nu + ns : 2 * nu + ns],
                    o[2 * nu + ns : b], o[b : b + ne], o[b + ne :])

        s2u, s2s, au, asg, TU, TT = split(
            call(ulm, slm, TU, TT, ulm, slm, w, t, ulm, slm, h2))
        s3u, s3s, au, asg, TU, TT = split(
            call(s2u, s2s, TU, TT, au, asg, 2 * w, t + h2, ulm, slm, h2))
        s4u, s4s, au, asg, TU, TT = split(
            call(s3u, s3s, TU, TT, au, asg, 2 * w, t + h2, ulm, slm, h))
        # final stage: in-register damp (the panel_emit gate guarantees
        # no scatter source follows), panels of the DAMPED final state
        o = call(s4u, s4s, TU, TT, au, asg, w, t + h, dmp=damp_row)
        u_n, s_n = o[:nu], o[nu : nu + ns]
        return u_n, s_n, (o[nu + ns : nu + ns + ne], o[nu + ns + ne :])

    # --- RK4 step ----------------------------------------------------------
    def step_with(self, d, aux, carry, t):
        """One RK4 step.  Elastic default: the fused-epilogue path (the
        kernel emits next-stage input + running accumulator directly,
        upwind_rhs_lm_sel_axpy) — the XLA-side stage/combination axpys
        measured 5.24 ms/step vs a 0.9 ms traffic bound (BENCH_NOTES r4
        reconciliation).  Viscoelastic (or fused_axpy=False) keeps the
        glue path: anelastic rates need the raw ds_el of every stage."""
        if not self.fused_axpy:
            return self._step_glue(d, aux, carry, t)
        if self.panel_emit:
            return self._step_emit(d, aux, carry, t)
        ulm, slm, _ = carry
        h = self._dt_f
        h2, w = 0.5 * h, h / 6.0
        uw = (aux["zpn"], aux["zsn"], aux["zown"])
        dense = aux.get("src_dense")
        damp_row = aux.get("damp_row")

        def inj(t_):
            # dense kernel-fused groups: k += r_g(t_)*S_g in-register
            if dense is None:
                return None
            return [
                (dense[g][0], dense[g][1],
                 jnp.full((8, ulm.shape[1]),
                          ricker(t_, *self._src_groups[g]), self.dtype))
                for g in range(len(dense))
            ]

        def call(uin, sin, au, asg, wa, t_, bu=None, bs=None, cs=None,
                 dmp=None):
            return upwind_rhs_lm_sel_axpy(
                d, uw, uin, sin, self._pg_u[0](uin), self._pg_t[0](sin),
                aux["uw_combo"], aux["sign_u"], aux["sign_t"],
                self._pg_u[3], au, asg, wa, bu, bs, cs, inj(t_), dmp,
                self.block, self.interpret)

        nu, ns = d.dim * d.npp, d.n_sig * d.npp

        def split(o):
            return (o[:nu], o[nu : nu + ns],
                    o[nu + ns : 2 * nu + ns], o[2 * nu + ns :])

        def scat(xu, xs, t_, c):
            # scatter fallback: many-wavelet sources (no dense groups)
            return ((xu, xs) if dense is not None
                    else self._inject_sc(aux, xu, xs, t_, c))

        # stage 1 (k1 at t): next input u + h/2 k1, acc = u + w k1
        s2u, s2s, au, asg = split(
            call(ulm, slm, ulm, slm, w, t, ulm, slm, h2))
        s2u, s2s = scat(s2u, s2s, t, h2)
        au, asg = scat(au, asg, t, w)
        # stage 2 (k2 at t+h/2): next input u + h/2 k2, acc += 2w k2
        s3u, s3s, au, asg = split(
            call(s2u, s2s, au, asg, 2 * w, t + h2, ulm, slm, h2))
        s3u, s3s = scat(s3u, s3s, t + h2, h2)
        au, asg = scat(au, asg, t + h2, 2 * w)
        # stage 3 (k3 at t+h/2): next input u + h k3, acc += 2w k3
        s4u, s4s, au, asg = split(
            call(s3u, s3s, au, asg, 2 * w, t + h2, ulm, slm, h))
        s4u, s4s = scat(s4u, s4s, t + h2, h)
        au, asg = scat(au, asg, t + h2, 2 * w)
        # stage 4 (k4 at t+h, final mode): u' = damp*(acc + w k4).
        # In-register damp only when no scatter source follows (the
        # scatter fallback's w*S4 must land BEFORE the sponge multiply)
        dmp = (damp_row if dense is not None or self.src_elems is None
               else None)
        o = call(s4u, s4s, au, asg, w, t + h, dmp=dmp)
        u_n, s_n = o[:nu], o[nu:]
        u_n, s_n = scat(u_n, s_n, t + h, w)
        if self.damp_u is not None and dmp is None:
            u_n = u_n * aux["damp_u"]
            s_n = s_n * aux["damp_s"]
        return u_n, s_n, None

    def _step_glue(self, d, aux, carry, t):
        ulm, slm, xi = carry
        h = self.dt
        h2 = 0.5 * h

        def comb(a, b, w):
            return a if b is None else a + w * b

        k1 = self._rhs(d, aux, ulm, slm, xi, t)
        k2 = self._rhs(d, aux, ulm + h2 * k1[0], slm + h2 * k1[1],
                       comb(xi, k1[2], h2), t + h2)
        k3 = self._rhs(d, aux, ulm + h2 * k2[0], slm + h2 * k2[1],
                       comb(xi, k2[2], h2), t + h2)
        k4 = self._rhs(d, aux, ulm + h * k3[0], slm + h * k3[1],
                       comb(xi, k3[2], h), t + h)
        w = h / 6.0
        u_n = ulm + w * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        s_n = slm + w * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        if xi is not None:
            xi = xi + w * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        if self.damp_u is not None:
            u_n = u_n * aux["damp_u"]
            s_n = s_n * aux["damp_s"]
            if xi is not None:
                xi = xi * aux["damp_s"][None]
        return u_n, s_n, xi

    # --- drivers -------------------------------------------------------
    def _go(self):
        if not hasattr(self, "_go_fn"):

            @functools.partial(jax.jit, static_argnames=("n",))
            def go(d, aux, ulm, slm, xi, n, k0):
                if self.panel_emit:
                    # seed the emission carry: own-face panels of the
                    # entry state (once per scan; kernels emit the rest)
                    xi = self._own_rows_e(ulm, slm)

                def body(carry, k):
                    carry = self.step_with(
                        d, aux, carry, k.astype(self.dtype) * self.dt)
                    ys = (
                        self._sample(aux, carry[0], carry[1])
                        if self.rcv is not None
                        else None
                    )
                    return carry, ys

                (ulm, slm, xi), seis = jax.lax.scan(
                    body, (ulm, slm, xi), jnp.arange(n) + k0)
                return ulm, slm, xi, seis

            self._go_fn = go
        return self._go_fn

    def _xi0(self, slm):
        if self.visco is None:
            return None
        return jnp.zeros((self.visco.L,) + slm.shape, dtype=slm.dtype)

    def run(self, state0: State, n_steps: int, step0: int = 0, xi0=None):
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
        """(E, n_p, n_sig, L) standard -> (L, n_sig*npp, E_pad)."""
        d = self.d
        perm = jnp.asarray(self._old_of_new)
        return jnp.stack(
            [to_lm(xi_std[perm, :, :, l], d.npp, self.E_pad)
             for l in range(self.visco.L)], axis=0)

    def xi_from_lm(self, xi_lm):
        d = self.d
        inv = jnp.asarray(self._new_of_old)
        return jnp.stack(
            [from_lm(xi_lm[l], d.n_p, d.npp, d.n_sig, self.E)[inv]
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
