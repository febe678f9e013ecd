"""Exchange-in-kernel lane-major LF4 solver — the v3 TPU pipeline.

Same physics and trace-carry design as solver/lane_fused.py (v2), but the
standalone Pallas trace-exchange kernel is gone: the operator kernels read
the producer trace arrays directly through lane-shifted neighbour windows
and do the (f2, pi) permutation + sign flip + boundary select in-register
(ops/merged_kernels.py).  Consumer-ordered traces never exist in HBM.

Layout difference vs v2: per-class lane padding (state stride NCs =
roundup(NC, block), trace stride NCt) lifts the ``block | NC`` constraint —
any measured-best block size is legal on any mesh.  Dead lanes carry zero
geometry and mask=1, so they stay exactly 0 through the whole run.

LF4 only (like v2).  Equivalence oracle: FusedLaneRunner / LaneMajorRunner
(tests/test_merged.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.elastic import ElasticParams, voigt_map
from ..ops.fused_kernels import (
    FusedOpData,
    build_fused_data,
    build_packed_fused_data,
)
from ..ops.merged_kernels import (
    build_merged_plan,
    choose_block,
    stress_merged,
    vel_merged,
)
from ..ops.structured_exchange import StructuredExchange
from .lane_major import class_major_perm
from .receivers import ReceiverData
from .source import SourceData, ricker
from .timestep import State, compose_lf_step_traced


class MergedLaneRunner:
    """v3 exchange-in-kernel lane-major runner (LF4, structured meshes)."""

    def __init__(
        self,
        p: ElasticParams,
        ex: StructuredExchange,
        dt: float,
        order: int = 4,
        src: SourceData | None = None,
        damp: jax.Array | None = None,
        receivers: ReceiverData | None = None,
        record_pressure: bool = False,
        block: int | None = None,
        interpret: bool = False,
        stiffness=None,
        packed: bool | str = False,
    ):
        if order != 4:
            raise ValueError("MergedLaneRunner is LF4-only (use the v1 lane "
                             "path for order=2)")
        if packed == "auto":
            # two-elements-per-lane pays only where the npp=8 tile is
            # half-dead (P1) and the layout supports it (isotropic, even
            # class count); see FusedOpData n_par=2
            packed = (p.n_p <= 4 and p.n_faces <= 4 and stiffness is None
                      and ex.m % 2 == 0)
        self._dt_f = float(dt)
        self._c3_f = float(dt) ** 3 / 24.0
        self._setup_core(
            p, ex, dt, block, interpret, damp=damp, stiffness=stiffness,
            packed=packed)
        d, plan, E = self.d, self.plan, self.E
        self.record_pressure = record_pressure

        # XLA damp multiply for u (see FusedLaneRunner: u is damped AFTER
        # its traces feed the sh1 stage); d.damp is already placed in the
        # runner lane layout by _setup_core (both packed and unpacked).
        # Stored UNtiled (npp, Ls) and broadcast across the dim components
        # in post_u — reading the pre-tiled (dim*npp, Ls) array cost a
        # third of the 72 MB/step post_u traffic (roofline lever 2's
        # cheap half; the full in-kernel fold is measured-deferred, see
        # BENCH_NOTES round 4 damp-fold note).
        if damp is not None:
            self.damp_u = jnp.asarray(np.asarray(self.d.damp), self.dtype)
        else:
            self.damp_u = None

        self._build_sources(src, self._new_of_old)
        self._build_receivers(receivers)

    def _setup_core(self, p, ex, dt, block, interpret, damp=None,
                    stiffness=None, pay=None, packed=False):
        """Shared lane-layout setup (also used by the upwind RK4 runner):
        class-major permutation, merged plan, placed geo/mask, face-node
        normal expansion + restriction matrix.  Returns the permuted damp
        node values (or None).

        packed=True: the P1 two-elements-per-lane layout — original
        classes (2u, 2u+1) pair onto packed class u, parity par = t & 1
        on sublane rows par*4+i (FusedOpData n_par=2 / MergedPlan
        docstrings).  Lanes are supercells in BOTH layouts, so the
        window/shift machinery is shared."""
        self.p = p
        self.ex = ex
        self.interpret = interpret
        self.dtype = p.Ginv.dtype
        self.dt = jnp.asarray(dt, self.dtype)
        self.n_par = 2 if packed else 1

        NC = int(np.prod(ex.grid))
        self.NC = NC

        E = p.Ginv.shape[0]
        old_of_new, new_of_old = class_major_perm(ex, E)
        self._old_of_new, self._new_of_old = old_of_new, new_of_old

        damp_perm = None if damp is None else np.asarray(damp)[old_of_new]
        if packed:
            if stiffness is not None:
                raise ValueError("packed layout is isotropic-only")
            if ex.m % 2:
                raise ValueError("packed layout needs an even class count")
            idx = np.arange(E).reshape(ex.m, NC)
            d = build_packed_fused_data(
                p, old_of_new[idx[0::2].reshape(-1)],
                old_of_new[idx[1::2].reshape(-1)], damp=damp)
        else:
            d = build_fused_data(p, damp=damp_perm, stiffness=stiffness)
        self.E = E
        from ..ops.merged_kernels import (
            BLOCK_LADDER, VMEM_BLOCK_BUDGET, vmem_block_rows)

        if block is not None:
            bx = block
        elif packed:
            # packed halves the lane count, shifting the measured-best
            # block up: P1 E=196k packed 1024 -> 2.945e9 vs 768 -> 2.753e9
            # (BENCH_NOTES round-4 P1 section)
            bx = choose_block(NC, prefer=(1024, 1536, 768, 512, 384, 256))
        else:
            bx = choose_block(NC)
        while True:
            plan = build_merged_plan(ex, d, bx, pay=pay,
                                     n_par=self.n_par)
            if plan is None:
                raise ValueError("mesh does not satisfy the merged-kernel "
                                 "constraints (see build_merged_plan)")
            if block is not None or bx <= 128:
                break
            # cap the block below Mosaic's scoped-vmem stack limit (P4's
            # 40-row tiles overflow at 768: see vmem_block_rows)
            if vmem_block_rows(d, plan) * bx * 8 <= VMEM_BLOCK_BUDGET:
                break
            bx = max(b for b in BLOCK_LADDER if b < bx)
        self.block = bx
        self.plan = plan
        # parity row offset within a state tile; ftq = per-parity trace rows
        self._hp = d.npp // self.n_par
        self._ftq = d.ftp // self.n_par

        import dataclasses as _dc

        # packed d.geo/d.damp columns are already pair-ordered (the pairs
        # above compose old_of_new); unpacked needs the class-major perm
        geo_cols = (np.asarray(d.geo) if packed
                    else np.asarray(d.geo)[:, old_of_new])
        self.d = d = _dc.replace(
            d,
            geo=jnp.asarray(self._place(geo_cols), self.dtype),
            damp=None if d.damp is None else jnp.asarray(
                self._place(np.asarray(d.damp)), self.dtype),
        )

        # per-face boundary mask as lane rows (8, Ls); dead lanes = 1
        # (own); packed: row par*4 + f of packed class t // 2
        mk = np.ones((8, plan.Ls), dtype=np.float32)
        for t in range(ex.m):
            u, par = divmod(t, self.n_par)
            for f in range(ex.n_faces):
                mk[par * 4 + f,
                   u * plan.NCs : u * plan.NCs + NC] = (
                    ex.self_mask[t, f].reshape(-1))
        self.mask = jnp.asarray(mk, self.dtype)

        # face-node-expanded normals for the initial traction extraction
        # (packed: parity row sections par*ftq + f*n_fp + k)
        nrm = np.asarray(p.normals)  # OLD element order
        rep = np.repeat(np.arange(d.nf), d.n_fp)
        ftq = self._ftq
        nrm_exp = np.zeros((d.dim, d.ftpp, plan.Ls), dtype=np.float64)
        for t in range(ex.m):
            u, par = divmod(t, self.n_par)
            pe = old_of_new[t * NC : (t + 1) * NC]
            for dd in range(d.dim):
                nrm_exp[dd, par * ftq : par * ftq + ftq,
                        u * plan.NCs : u * plan.NCs + NC] = (
                    nrm[pe][:, rep, dd].T)
        self._nrm_exp = jnp.asarray(nrm_exp, self.dtype)
        rmat = np.zeros((d.ftpp, d.npp), dtype=np.float64)
        fn = np.array(p.fnodes).reshape(-1)
        for par in range(self.n_par):
            rmat[par * ftq + np.arange(ftq), par * self._hp + fn] = 1.0
        self._rmat = jnp.asarray(rmat, self.dtype)
        return damp_perm

    def _build_receivers(self, receivers):
        if receivers is not None:
            e_new = self._new_of_old[np.asarray(receivers.elems)]
            # node weights expanded to the npp tile rows at the element's
            # parity section (unpacked: rows 0..n_p; dead rows are exactly
            # 0 in the state, so the full-tile einsum in _sample is exact)
            w = np.asarray(receivers.weights)
            w8 = np.zeros((w.shape[0], self.d.npp), dtype=w.dtype)
            par_r = np.asarray(self._epar(e_new))
            for par in range(self.n_par):
                kk = par_r == par
                w8[kk, par * self._hp : par * self._hp + self.d.n_p] = (
                    w[kk])
            self.rcv = ReceiverData(
                elems=jnp.asarray(self._slane(e_new), jnp.int32),
                weights=jnp.asarray(w8, self.dtype),
            )
        else:
            self.rcv = None

    # --- layout helpers -----------------------------------------------
    def _place(self, arr):
        """np (rows, E) class-major -> (rows, Ls) per-class padded."""
        plan, NC = self.plan, self.NC
        out = np.zeros((arr.shape[0], plan.Ls), arr.dtype)
        for t in range(plan.m):
            out[:, t * plan.NCs : t * plan.NCs + NC] = (
                arr[:, t * NC : (t + 1) * NC])
        return out

    def _slane(self, e_new):
        """class-major element index -> state lane (packed: of its pair)."""
        return ((e_new // self.NC) // self.n_par) * self.plan.NCs + (
            e_new % self.NC)

    def _tlane(self, e_new):
        """class-major element index -> trace lane (packed: of its pair)."""
        return (((e_new // self.NC) // self.n_par) * self.plan.NCt
                + self.plan.h0 + e_new % self.NC)

    def _epar(self, e_new):
        """class-major element index -> parity within its lane pair."""
        return (e_new // self.NC) % self.n_par

    # ------------------------------------------------------------------
    def _build_sources(self, src, new_of_old):
        d, p = self.d, self.p
        if src is None:
            self.src_elems = None
            return
        K = src.elems.shape[0]
        V = voigt_map(d.dim)
        fnodes = np.array(p.fnodes)
        normals = np.asarray(p.normals)  # OLD order
        elems_old = np.asarray(src.elems)
        vec_u = np.asarray(src.vec_u)
        vec_s = np.asarray(src.vec_s)
        e_new = new_of_old[elems_old]
        par_k = self._epar(e_new)  # parity row section per source element
        hp = self._hp
        vu = np.zeros((d.dim * d.npp, K), dtype=np.float64)
        vs = np.zeros((d.n_sig * d.npp, K), dtype=np.float64)
        # face-major trace patches, rows f*rtf + par*rtq + c*n_fp + k
        rtf, rtq = self.plan.rtf, self.plan.rtq
        tru = np.zeros((d.nf * rtf, K), dtype=np.float64)
        trt = np.zeros((d.nf * rtf, K), dtype=np.float64)
        for par in range(self.n_par):
            kk = np.where(par_k == par)[0]
            if not kk.size:
                continue
            for c in range(d.dim):
                vu[c * d.npp + par * hp
                   : c * d.npp + par * hp + d.n_p, kk] = (
                    vec_u[kk][:, :, c].T)
            for c in range(d.n_sig):
                vs[c * d.npp + par * hp
                   : c * d.npp + par * hp + d.n_p, kk] = (
                    vec_s[kk][:, :, c].T)
            for c in range(d.dim):
                for f in range(d.nf):
                    rows = (f * rtf + par * rtq + c * d.n_fp
                            + np.arange(d.n_fp))
                    tru[np.ix_(rows, kk)] = vec_u[kk][:, fnodes[f], c].T
                    acc = np.zeros((kk.size, d.n_fp))
                    for dd in range(d.dim):
                        acc += (normals[elems_old[kk], f, dd][:, None]
                                * vec_s[kk][:, fnodes[f], V[c, dd]])
                    trt[np.ix_(rows, kk)] = acc.T
        sl, tl = self._slane(e_new), self._tlane(e_new)
        self.src_elems = jnp.asarray(sl, jnp.int32)
        self.src_elems_tr = jnp.asarray(tl, jnp.int32)
        # packed pairs may share a LANE with different parities — parity
        # rows are disjoint, but inject_columns adds whole columns, so
        # uniqueness must be judged on lanes
        self._src_unique = bool(np.unique(sl).size == sl.size)

        # dense per-wavelet-group patterns for KERNEL-fused injection: a
        # "point" source is a Gaussian blob over O(10k) elements (radius
        # 2h), so per-element scatters cost ~1.3 ms/step at E=83k
        # (BENCH_NOTES round 3).  Since the spatial pattern is constant
        # and only the wavelet r_g(t) varies, the injection is
        # out += r_g(t) * S_g inside the stage kernels — the emitted
        # traces then carry the source for free.
        self.src_dense = None
        self._src_groups = []
        f0a = np.broadcast_to(np.asarray(src.f0, np.float64), (K,))
        t0a = np.broadcast_to(np.asarray(src.t0, np.float64), (K,))
        ampa = np.broadcast_to(np.asarray(src.amp, np.float64), (K,))
        groups: dict = {}
        for k in range(K):
            key = (round(float(f0a[k]), 12), round(float(t0a[k]), 12))
            groups.setdefault(key, []).append(k)
        if len(groups) <= 2:
            dense = []
            for (f0g, t0g), idx in groups.items():
                Su = np.zeros((d.dim * d.npp, self.plan.Ls), np.float64)
                Ss = np.zeros((d.n_sig * d.npp, self.plan.Ls), np.float64)
                for k in idx:
                    Su[:, sl[k]] += vu[:, k] * ampa[k]
                    Ss[:, sl[k]] += vs[:, k] * ampa[k]
                dense.append((jnp.asarray(Su, self.dtype),
                              jnp.asarray(Ss, self.dtype)))
                self._src_groups.append((f0g, t0g))
            self.src_dense = tuple(dense)
        self.src_vu = jnp.asarray(vu, self.dtype)
        self.src_vs = jnp.asarray(vs, self.dtype)
        self.src_tru = jnp.asarray(tru, self.dtype)
        self.src_trt = jnp.asarray(trt, self.dtype)
        self.src_f0, self.src_t0, self.src_amp = src.f0, src.t0, src.amp

    def _aux(self):
        aux = {"mask": self.mask}
        if self.damp_u is not None:
            aux["damp_u"] = self.damp_u
        if self.src_elems is not None:
            if self.src_dense is not None:
                aux["src_dense"] = self.src_dense
            else:
                aux["src_vu"], aux["src_vs"] = self.src_vu, self.src_vs
                aux["src_tru"], aux["src_trt"] = (
                    self.src_tru, self.src_trt)
        if self.rcv is not None:
            aux["rcv_w"] = self.rcv.weights
        return aux

    # --- state conversion ---
    def _to_lm(self, x, C):
        """(E, n_p, C) standard -> (C*npp, Ls) per-class padded lanes
        (packed: original class t on parity rows (t % 2)*4 + i of packed
        class t // 2)."""
        d, plan = self.d, self.plan
        perm = jnp.asarray(self._old_of_new)
        xt = x[perm].transpose(2, 1, 0)  # (C, n_p, E) class-major
        out = jnp.zeros((C * d.npp, plan.Ls), dtype=x.dtype)
        for c in range(C):
            for t in range(plan.m * self.n_par):
                u, par = divmod(t, self.n_par)
                out = jax.lax.dynamic_update_slice(
                    out, xt[c][:, t * self.NC : (t + 1) * self.NC],
                    (c * d.npp + par * self._hp, u * plan.NCs))
        return out

    def _from_lm(self, y, C):
        d, plan = self.d, self.plan
        inv = jnp.asarray(self._new_of_old)
        comps = []
        for c in range(C):
            cls = []
            for t in range(plan.m * self.n_par):
                u, par = divmod(t, self.n_par)
                r0 = c * d.npp + par * self._hp
                cls.append(y[r0 : r0 + d.n_p,
                             u * plan.NCs : u * plan.NCs + self.NC])
            comps.append(jnp.concatenate(cls, axis=1))
        return jnp.stack(comps, axis=0).transpose(2, 1, 0)[inv]

    def to_lm_state(self, state: State):
        return self._to_lm(state.u, self.d.dim), self._to_lm(
            state.s, self.d.n_sig)

    def from_lm_state(self, ulm, slm) -> State:
        return State(u=self._from_lm(ulm, self.d.dim),
                     s=self._from_lm(slm, self.d.n_sig))

    def traction_traces(self, slm):
        """Own-face traction traces of a lane-major stress field, placed in
        the per-face TRACE lane layout — seeds the scan carry."""
        d, plan = self.d, self.plan
        V = voigt_map(d.dim)
        tr_sig = [
            self._rmat @ slm[c * d.npp : (c + 1) * d.npp]
            for c in range(d.n_sig)
        ]
        rows = []
        for c in range(d.dim):
            t = sum(self._nrm_exp[dd] * tr_sig[V[c, dd]]
                    for dd in range(d.dim))
            rows.append(t)  # (ftpp, Ls) per component
        nfp, pad = d.n_fp, plan.rtq - d.dim * d.n_fp
        ftq = self._ftq
        blocks = []
        for f in range(plan.nf):
            for par in range(self.n_par):
                blocks += [rows[c][par * ftq + f * nfp
                                   : par * ftq + (f + 1) * nfp]
                           for c in range(d.dim)]
                if pad:
                    blocks.append(
                        jnp.zeros((pad, plan.Ls), rows[0].dtype))
        blk = jnp.concatenate(blocks, axis=0)  # (nf*rtf, Ls) face-major
        out = jnp.zeros((plan.nf * plan.rtf, plan.Lt), dtype=blk.dtype)
        for t in range(plan.m):
            out = jax.lax.dynamic_update_slice(
                out, blk[:, t * plan.NCs : t * plan.NCs + self.NC],
                (0, t * plan.NCt + plan.h0))
        return out

    # --- step ---
    def _inject(self, aux, field, tr, vecs, tr_vecs, t):
        if self.src_elems is None:
            return field, tr
        r = (self.src_amp * ricker(t, self.src_f0, self.src_t0))[None, :]
        r = r.astype(self.dtype)
        from .timestep import inject_columns

        field = inject_columns(field, self.src_elems, vecs * r,
                               unique=self._src_unique)
        tr = inject_columns(tr, self.src_elems_tr, tr_vecs * r,
                            unique=self._src_unique)
        return field, tr

    def _fill_halo(self, tr):
        """Single-chip: no halos (axis-0 wraps are boundary-masked)."""
        return tr

    def _src_stage_ops(self, d, aux, plan, mask, itp, fill):
        """(vel_src, stress_src) kernel-fused injection stage operators,
        or (None, None) when the dense-pattern path is not active."""
        dense = aux.get("src_dense")
        if dense is None:
            return None, None
        Lsz = plan.Ls

        def rfull(t_, g):
            f0g, t0g = self._src_groups[g]
            return jnp.full((8, Lsz), ricker(t_, f0g, t0g), self.dtype)

        def vel_src(s, tr, t_):
            return vel_merged(
                plan, d, s, fill(tr), mask, itp,
                inject=[(dense[g][0], rfull(t_, g))
                        for g in range(len(dense))])

        def stress_src(u, tr, t_):
            return stress_merged(
                plan, d, u, fill(tr), mask, itp,
                inject=[(dense[g][1], rfull(t_, g))
                        for g in range(len(dense))])

        return vel_src, stress_src

    def step_with(self, d, aux, carry, t):
        ulm, slm, trs = carry
        dt, c3 = self._dt_f, self._c3_f
        itp = self.interpret
        plan, mask = self.plan, aux["mask"]
        fill = self._fill_halo
        vel_src, stress_src = self._src_stage_ops(
            d, aux, plan, mask, itp, fill)

        lf = compose_lf_step_traced(
            vel_src=vel_src,
            stress_src=stress_src,
            vel=lambda s, tr: vel_merged(plan, d, s, fill(tr), mask, itp),
            stress=lambda u, tr: stress_merged(
                plan, d, u, fill(tr), mask, itp),
            vel_axpy=lambda s, tr, u, uh1: vel_merged(
                plan, d, s, fill(tr), mask, itp, axpy=(u, uh1),
                dt=dt, c3=c3),
            stress_axpy=lambda u, tr, s, sh1: stress_merged(
                plan, d, u, fill(tr), mask, itp, axpy=(s, sh1),
                dt=dt, c3=c3),
            inject_u=lambda f, tr, t_: self._inject(
                aux, f, tr, aux.get("src_vu"), aux.get("src_tru"), t_),
            inject_s=lambda f, tr, t_: self._inject(
                aux, f, tr, aux.get("src_vs"), aux.get("src_trt"), t_),
            post_u=lambda u: (
                u if self.damp_u is None else (
                    u.reshape(d.dim, d.npp, -1) * aux["damp_u"][None]
                ).reshape(u.shape)),
        )
        return lf(ulm, slm, trs, t, self.dt)

    def _sample(self, aux, u_lm, s_lm=None):
        # rcv_w is tile-row expanded (see _build_receivers): the einsum
        # runs over the full npp rows, parity handled by the weight rows
        d = self.d
        g = u_lm[:, self.rcv.elems]
        g3 = g.reshape(d.dim, d.npp, -1)
        rec = jnp.einsum("ri,cir->rc", aux["rcv_w"], g3)
        if self.record_pressure and s_lm is not None:
            gs = s_lm[:, self.rcv.elems].reshape(d.n_sig, d.npp, -1)
            pr = -jnp.mean(gs[: d.dim], axis=0)
            rec_p = jnp.einsum("ri,ir->r", aux["rcv_w"], pr)[:, None]
            rec = jnp.concatenate([rec, rec_p], axis=-1)
        return rec

    def _go(self):
        if not hasattr(self, "_go_fn"):

            @functools.partial(jax.jit, static_argnames=("n",))
            def go(d, aux, ulm, slm, n, k0):
                # trace seed INSIDE the jit: eager per-op dispatch through
                # the TPU tunnel costs ~1 s round-trip (BENCH_NOTES), so
                # the ~30 small ops of traction_traces must not run
                # un-jitted once per run chunk
                trs = self.traction_traces(slm)

                def body(carry, k):
                    carry = self.step_with(
                        d, aux, carry, k.astype(self.dtype) * self.dt)
                    ys = (
                        self._sample(aux, carry[0], carry[1])
                        if self.rcv is not None
                        else None
                    )
                    return carry, ys

                (ulm, slm, trs), seis = jax.lax.scan(
                    body, (ulm, slm, trs), jnp.arange(n) + k0)
                return ulm, slm, trs, seis

            self._go_fn = go
        return self._go_fn

    def run(self, state0: State, n_steps: int, step0: int = 0):
        ulm, slm = self.to_lm_state(state0)
        ulm, slm, _, seis = self._go()(
            self.d, self._aux(), ulm, slm, n_steps, jnp.asarray(step0))
        return self.from_lm_state(ulm, slm), (
            None if seis is None else np.asarray(seis))

    def run_lm(self, ulm, slm, n_steps: int, step0: int = 0):
        ulm, slm, trs, seis = self._go()(
            self.d, self._aux(), ulm, slm, n_steps, jnp.asarray(step0))
        return ulm, slm, seis
