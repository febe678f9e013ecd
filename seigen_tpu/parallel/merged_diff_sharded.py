"""Domain-decomposed FWI gradients at the v3 (merged-kernel) rate.

parallel/lane_diff_sharded.py gave the inversion a domain-decomposition
axis, but its forward+adjoint sweeps run the v1 lane operators — the
sharded analog of LaneDiffFwi(engine="lane"), a generation behind the
merged engine the production forward path uses.  This module is the
sharded analog of LaneDiffFwi(engine="merged"): the energy-conjugation
custom VJPs (solver/lane_diff.make_conjugated_vjp) wrap the SLAB-SHARDED
exchange-in-kernel merged operators (parallel/fused_sharded.py).

Per-op trace seeding, as in the single-chip merged diff ops
(solver/lane_diff.make_merged_diff_ops): each application recomputes its
input's own-face traces (cheap row restriction, + producer normal
contraction for tractions), ships the compact first/last supercell trace
planes to the slab neighbours (ShardedFusedRunner._fill_halo — ONE
ppermute pair), and runs the merged kernel whose windowed BlockSpecs do
the exchange in-register.  The transpose of each sharded operator is ONE
application of the other — including the halo ppermute, because the
sharded operators compute exactly the GLOBAL material-free operators
(partition invariance tested) and the conjugation weights are
per-element.  Gradient equivalence vs the single-chip merged engine is
verified at 2/4 virtual shards in tests/test_merged_diff_sharded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.merged_kernels import stress_merged, vel_merged
from ..solver.lane_diff import (_mass_weights, _material_free,
                                lame_rows, make_conjugated_vjp,
                                theta_of_params)
from ..solver.source import ricker
from ..solver.timestep import compose_lf_step
from .fused_sharded import AXIS, ShardedFusedRunner


class ShardedMergedDiffFwi:
    """Slab-sharded FWI value-and-gradient on the merged (v3) operators
    (single- or multi-shot, shots looped on host; the DOMAIN is the
    sharded axis).  LF4-only, structured meshes."""

    def __init__(
        self,
        p0,
        dm,
        ex,
        dt: float,
        n_steps: int,
        shots,
        receivers,
        observed,
        n_shards: int,
        *,
        damp=None,
        segment: int | None = None,
        block: int | None = None,
        interpret: bool | None = None,
        devices=None,
    ):
        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        if receivers is None:
            raise ValueError("ShardedMergedDiffFwi needs receivers")
        self.runner = r = ShardedFusedRunner(
            _material_free(p0), ex, dt, n_shards, order=4, src=None,
            damp=damp, receivers=receivers, block=block,
            interpret=interpret, devices=devices)
        self.order = 4
        self.n_steps = n_steps
        self.segment = segment
        self.dtype = r.dtype
        self.dt = r.dt
        self.E = r.E
        self.observed = observed
        self._theta0 = theta_of_params(p0)
        self._perm = jnp.asarray(r._old_of_new)
        self._lanes = jnp.asarray(r._lane(np.arange(r.E)), jnp.int32)

        # conjugation weights at the global state lanes (detj placed at
        # real lanes, dead class-padding lanes 1); the boundary mask and
        # trace-seed tables ride in w so every operand is a jit argument
        self.w = _mass_weights(dm, r, lanes=np.asarray(self._lanes),
                               L=r.Ls)
        self.w.update(mask=r.mask, nrm=r._nrm_exp, rmat=r._rmat)

        # stress damp rows (production folds them into stress_axpy; the
        # diff path damps via compose_lf_step's post)
        d = r.d
        self._damp_s = (None if d.damp is None
                        else jnp.tile(d.damp, (d.n_sig, 1)))

        # per-shot shard-packed sources at shard-local STATE lanes (the
        # diff step is (state -> state): no trace patches needed)
        elems = np.asarray(shots.elems)
        if elems.ndim == 1:
            shots = jax.tree.map(lambda x: jnp.asarray(x)[None], shots)
            elems = elems[None]
        self.n_shots = elems.shape[0]
        packed = [self._pack_shot(
            jax.tree.map(lambda x, k=k: np.asarray(x)[k], shots))
            for k in range(self.n_shots)]
        smax = max(p_["elems"].shape[1] for p_ in packed)

        def pad_entry(a):
            if a.ndim == 2:
                return jnp.pad(a, ((0, 0), (0, smax - a.shape[1])))
            return jnp.pad(a, ((0, 0), (0, 0), (0, smax - a.shape[2])))

        self.src = {
            key: jnp.stack([pad_entry(p_[key]) for p_ in packed])
            for key in packed[0]
        }
        self._vg_one = None
        self._make_ops()

    # --- per-shot source packing (shard-local state lanes) -------------
    def _pack_shot(self, src):
        r = self.runner
        d = r.d
        K = src.elems.shape[0]
        vu = np.zeros((d.dim * d.npp, K), dtype=np.float64)
        vs = np.zeros((d.n_sig * d.npp, K), dtype=np.float64)
        for c in range(d.dim):
            vu[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                src.vec_u[:, :, c]).T
        for c in range(d.n_sig):
            vs[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                src.vec_s[:, :, c]).T
        e_new = r._new_of_old[np.asarray(src.elems)]
        shard = e_new // (r.m * r.NCloc)
        local = r._lane(e_new) - shard * r.plan.Ls
        S_max = max(int(np.bincount(shard, minlength=r.P).max()), 1)
        elems_sh = np.zeros((r.P, S_max), dtype=np.int32)
        vu_sh = np.zeros((r.P, vu.shape[0], S_max), np.float64)
        vs_sh = np.zeros((r.P, vs.shape[0], S_max), np.float64)
        f0 = np.ones((r.P, S_max), np.float64)
        t0 = np.zeros((r.P, S_max), np.float64)
        amp = np.zeros((r.P, S_max), np.float64)
        fill = np.zeros(r.P, dtype=np.int64)
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

    # -- custom-vjp'd shard-local material-free merged ops --------------
    def _make_ops(self):
        if hasattr(self, "_ops"):
            return self._ops
        r = self.runner
        d, plan, itp = r.d, r.plan, r.interpret

        def a_prim(dd, ww, sig_lm):
            trs = r._traction_traces_loc(sig_lm, ww["nrm"], ww["rmat"])
            return vel_merged(plan, dd, sig_lm, r._fill_halo(trs),
                              ww["mask"], itp)[0]

        def b_prim(dd, ww, u_lm):
            trs = r._field_traces_loc(u_lm, ww["rmat"], d.dim)
            return stress_merged(plan, dd, u_lm, r._fill_halo(trs),
                                 ww["mask"], itp)[0]

        self._ops = make_conjugated_vjp(a_prim, b_prim, d.dim, d.n_sig,
                                        d.npp, self.dtype)
        return self._ops

    def _mrows(self, theta, defaults):
        full = {**defaults, **theta}
        take = lambda a: jnp.asarray(a, self.dtype)[self._perm]
        lam, mu, irho = lame_rows(take(full["vp"]), take(full["vs"]),
                                  take(full["rho"]))

        def place(a, dead):
            row = jnp.full((self.runner.Ls,), dead, self.dtype)
            return row.at[self._lanes].set(a)[None]

        return {"lam": place(lam, 0.0), "mu": place(mu, 0.0),
                "irho": place(irho, 1.0)}

    def _aux(self):
        r = self.runner
        aux = {}
        if r.damp_u is not None:
            aux["damp_u"] = r.damp_u
            aux["damp_s"] = self._damp_s
        if r.rcv is not None:
            aux["rcv_elems"] = r.rcv["elems"]
            aux["rcv_w"] = r.rcv["w"]
        return aux

    # -- the shard_map'd differentiable forward ------------------------
    def _forward(self, theta, defaults, dd, ww, aux, src_k):
        import dataclasses as _dc

        r = self.runner
        d = r.d
        A, B = self._make_ops()
        n_sig, npp, dim = d.n_sig, d.npp, d.dim

        lane = P(None, AXIS)
        d_specs = _dc.replace(
            d, drr=P(), lift=P(), erep=P(), geo=lane,
            damp=None if d.damp is None else lane)
        w_specs = {"Mn": P(), "Mninv": P(), "detj": lane, "idetj": lane,
                   "mask": lane, "nrm": P(None, None, AXIS), "rmat": P()}
        m_specs = {k: lane for k in ("lam", "mu", "irho")}
        aux_specs = {}
        if "damp_u" in aux:
            aux_specs["damp_u"] = lane
            aux_specs["damp_s"] = lane
        if "rcv_elems" in aux:
            aux_specs["rcv_elems"] = P(AXIS)
            aux_specs["rcv_w"] = P(AXIS)
        src_specs = {k: P(AXIS) for k in src_k}

        n, seg = self.n_steps, self.segment

        def inner(dd, ww, auxg, mr, sk):
            aux_l = dict(auxg)
            for k in ("rcv_elems", "rcv_w"):
                if k in aux_l:
                    aux_l[k] = aux_l[k][0]
            sk_l = {k: v[0] for k, v in sk.items()}
            lam, mu, irho = mr["lam"], mr["mu"], mr["irho"]

            def vel(sf):
                return irho * A(dd, ww, sf)

            def stress(uf):
                eps = B(dd, ww, uf).reshape(n_sig, npp, -1)
                tr = jnp.sum(eps[:dim], axis=0)
                out = 2.0 * mu[None] * eps
                out = out.at[:dim].add(lam[None] * tr[None])
                return out.reshape(n_sig * npp, -1)

            def inj(vecs):
                return lambda f, t_: f.at[:, sk_l["elems"]].add(
                    vecs * (sk_l["amp"]
                            * ricker(t_, sk_l["f0"], sk_l["t0"]))
                    [None, :].astype(self.dtype))

            def post(u, s):
                if "damp_u" not in aux_l:
                    return u, s
                return u * aux_l["damp_u"], s * aux_l["damp_s"]

            lf = compose_lf_step(
                vel=vel, stress=stress, inject_u=inj(sk_l["vu"]),
                inject_s=inj(sk_l["vs"]), post=post, dt=self.dt,
                order=self.order)

            u0 = jnp.zeros((dim * npp, r.plan.Ls), self.dtype)
            s0 = jnp.zeros((n_sig * npp, r.plan.Ls), self.dtype)

            def body(carry, k):
                carry = lf(carry[0], carry[1],
                           k.astype(self.dtype) * self.dt)
                g = carry[0][:, aux_l["rcv_elems"]]
                g3 = g.reshape(dim, npp, -1)[:, : d.n_p]
                part = jnp.einsum("ri,cir->rc", aux_l["rcv_w"], g3)
                return carry, jax.lax.psum(part, AXIS)

            if not seg or seg >= n:
                _, seis = jax.lax.scan(body, (u0, s0), jnp.arange(n))
            else:
                if n % seg:
                    raise ValueError(f"segment {seg} !| n_steps {n}")

                @jax.checkpoint
                def chunk(carry, k0):
                    return jax.lax.scan(body, carry,
                                        k0 + jnp.arange(seg))

                _, seis = jax.lax.scan(chunk, (u0, s0),
                                       seg * jnp.arange(n // seg))
                seis = seis.reshape((n,) + seis.shape[2:])
            return seis

        mrows_p = self._mrows(theta, defaults)
        return jax.shard_map(
            inner, mesh=r.mesh,
            in_specs=(d_specs, w_specs, aux_specs, m_specs, src_specs),
            out_specs=P(),
            check_vma=False,
        )(dd, ww, aux, mrows_p, src_k)

    def _loss_one(self, theta, defaults, dd, ww, aux, src_k, obs, taps):
        seis = self._forward(theta, defaults, dd, ww, aux, src_k)
        if taps is not None:
            from ..solver.fwi import lowpass
            seis = lowpass(seis, taps, axis=0)
        res = seis - obs
        return 0.5 * jnp.sum(res * res)

    def synth(self, theta: dict):
        r = self.runner
        if not hasattr(self, "_synth_one"):
            self._synth_one = jax.jit(
                lambda th, df, dd, ww, aux, sk:
                self._forward(th, df, dd, ww, aux, sk))
        aux = self._aux()
        out = []
        for k in range(self.n_shots):
            sk = {kk: v[k] for kk, v in self.src.items()}
            out.append(np.asarray(self._synth_one(
                theta, self._theta0, r.d, self.w, aux, sk)))
        return np.stack(out)

    def vg_factory(self, taps):
        if self.observed is None:
            raise ValueError("observed data not set")
        obs = self.observed
        if taps is not None:
            from ..solver.fwi import lowpass
            obs = lowpass(jnp.asarray(obs, self.dtype), taps, axis=1)
        obs = jnp.asarray(obs, self.dtype)
        r = self.runner
        aux = self._aux()

        if self._vg_one is None:
            def loss(th, df, dd, ww, auxg, sk, obs_s, taps_):
                return self._loss_one(th, df, dd, ww, auxg, sk,
                                      obs_s, taps_)

            self._vg_one = jax.jit(jax.value_and_grad(loss))

        def vg(theta):
            tot_v, tot_g = 0.0, None
            for k in range(self.n_shots):
                sk = {kk: v[k] for kk, v in self.src.items()}
                v, g = self._vg_one(theta, self._theta0, r.d, self.w,
                                    aux, sk, obs[k], taps)
                tot_v += float(v)
                tot_g = g if tot_g is None else jax.tree.map(
                    jnp.add, tot_g, g)
            return tot_v, tot_g

        return vg
