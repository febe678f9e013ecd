"""Shared scaffold for the domain-decomposed FWI gradient engines.

Three DD engines exist — slab-sharded v1 lane ops
(parallel/lane_diff_sharded.py), slab-sharded v3 merged ops
(parallel/merged_diff_sharded.py), Morton-block unstructured ops
(parallel/unstructured_diff_sharded.py).  They differ ONLY in how the
material-free operators and their sharding specs are built; everything
else — per-shot source packing with a common jit signature, the
shard_map'd differentiable forward (compose_lf_step over the conjugated
custom-VJP ops, receiver psum sampling, jax.checkpoint segmenting),
the misfit, synth, and the host-accumulated vg loop — is THIS class.

Subclass contract (set before calling ``_finish_init``):
  self.runner   — the sharded forward runner (mesh, dt, dtype, d, rcv)
  self.w        — conjugation-weight tree (Mn/Mninv/detj/idetj + any
                  engine operands: masks, index plans, trace tables)
  self._lanes   — (E,) int lane of each dense-new element in the
                  engine's state-lane layout
  self._L       — state-lane width (global)
and implement:
  _make_ops()   — (A, B) = make_conjugated_vjp over the engine's
                  shard-local material-free ops (cached on self._ops)
  _pack_shot(s) — ONE shot -> dict of (P, ...) shard-stacked source
                  arrays with keys elems/vu/vs/f0/t0/amp (amp=0 fill)
  _d_specs()    — PartitionSpec tree matching runner.d
  _w_specs()    — PartitionSpec tree matching self.w
  _unstack_w(w) — strip shard-stacked leading axes inside the body
                  (default: identity)
  _loc_width()  — shard-LOCAL state-lane width (u0/s0 columns)
  _aux()        — replicat-able aux dict (damp rows lane-sharded,
                  rcv_elems/rcv_w shard-stacked)

Tunnel-dispatch discipline: ``vg_factory``/``synth`` pre-slice observed
data and sources on the HOST (numpy) — per-device-op dispatch through
the axon tunnel costs ~1 s, so slicing jnp arrays per shot per
iteration would dominate a multi-shot inversion (solver/lane_diff.py
learned this first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..solver.lane_diff import lame_rows, theta_of_params
from ..solver.source import ricker
from ..solver.timestep import compose_lf_step


class DomainDecomposedFwi:
    """Base: domain-decomposed FWI value-and-gradient (single- or
    multi-shot, shots looped on host; the DOMAIN is the sharded axis)."""

    #: name of the mesh axis (subclasses share "x")
    AXIS = "x"

    def _finish_init(self, p0, n_steps, shots, observed, segment):
        r = self.runner
        self.n_steps = n_steps
        self.segment = segment
        self.dtype = r.dtype
        self.dt = r.dt
        self.E = r.E
        self.observed = observed
        self._theta0 = theta_of_params(p0)
        self._perm = jnp.asarray(r._old_of_new)
        # parity bookkeeping (packed merged runner; 1/zeros otherwise):
        # paired elements share a lane on disjoint parity row sections,
        # so material/detj placement is per-ROW (solver/lane_diff.py)
        self._npar = getattr(r, "n_par", 1)
        self._hp = r.d.npp // self._npar
        self._lanes_np = np.asarray(self._lanes)
        self._pars_np = (np.asarray(r._epar(np.arange(self.E)))
                         if self._npar > 1 else None)

        # per-shot shard-packed sources, shot axis padded to a common
        # per-shard S_max (amp=0 fill) for one jit signature
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
            if a.ndim == 2:  # (P, S)
                return jnp.pad(a, ((0, 0), (0, smax - a.shape[1])))
            return jnp.pad(a, ((0, 0), (0, 0), (0, smax - a.shape[2])))

        self.src = {
            key: jnp.stack([pad_entry(p_[key]) for p_ in packed])
            for key in packed[0]
        }
        self._vg_one = None
        # create the custom_vjp closures OUTSIDE any trace
        self._make_ops()

    # --- hooks (see module docstring) ----------------------------------
    def _make_ops(self):
        raise NotImplementedError

    def _pack_shot(self, src):
        raise NotImplementedError

    def _d_specs(self):
        raise NotImplementedError

    def _w_specs(self):
        raise NotImplementedError

    def _unstack_w(self, ww):
        return ww

    def _loc_width(self):
        raise NotImplementedError

    def _aux(self):
        raise NotImplementedError

    # --- shared pieces --------------------------------------------------
    def _mrows(self, theta, defaults):
        """theta {vp,vs,rho} (E,) original order -> (1, L) material lane
        rows of the engine's layout (dead lanes: lam=mu=0, irho=1)."""
        full = {**defaults, **theta}
        take = lambda a: jnp.asarray(a, self.dtype)[self._perm]
        lam, mu, irho = lame_rows(take(full["vp"]), take(full["vs"]),
                                  take(full["rho"]))

        def place(a, dead):
            if self._npar == 1:
                row = jnp.full((self._L,), dead, self.dtype)
                return row.at[self._lanes].set(a)[None]
            # packed: per-ROW (npp, L) material — paired elements on one
            # lane differ, so each parity's row section gets its own
            # value (pad rows keep the section value; they multiply
            # zero data)
            out = jnp.full((self._npar * self._hp, self._L), dead,
                           self.dtype)
            for par in range(self._npar):
                kk = np.where(self._pars_np == par)[0]
                out = out.at[par * self._hp : (par + 1) * self._hp,
                             self._lanes_np[kk]].set(a[kk][None])
            return out

        return {"lam": place(lam, 0.0), "mu": place(mu, 0.0),
                "irho": place(irho, 1.0)}

    def _forward(self, theta, defaults, dd, ww, aux, src_k, illum=False):
        """(n_steps, R, dim) seismograms; runs UNDER jit, shard_map
        inside.  ``illum=True``: instead of sampling receivers, the scan
        accumulates the per-lane source-side illumination sum_k |u|^2
        (the diagonal pseudo-Hessian proxy, solver/lane_diff.py
        illumination) and returns the shard-gathered lane rows — packed
        layouts keep per-ROW sums so paired elements stay separable."""
        r = self.runner
        d = r.d
        A, B = self._make_ops()
        AXIS = self.AXIS
        n_sig, npp, dim = d.n_sig, d.npp, d.dim
        n_p = d.n_p

        lane = P(None, AXIS)
        d_specs = self._d_specs()
        w_specs = self._w_specs()
        m_specs = {k: lane for k in ("lam", "mu", "irho")}
        aux_specs = {}
        if "damp_u" in aux:
            aux_specs["damp_u"] = lane
            aux_specs["damp_s"] = lane
        if "rcv_elems" in aux:
            aux_specs["rcv_elems"] = P(AXIS)
            aux_specs["rcv_w"] = P(AXIS)
            # normalize weights to npp tile rows: the fused forward
            # runner already expands them (parity sections), the lane/
            # unstructured runners hand over n_p node weights — pad with
            # zeros so the sampler can run one full-tile einsum (dead
            # state rows are exactly 0)
            w = aux["rcv_w"]
            if w.shape[-1] < npp:
                aux = dict(
                    aux,
                    rcv_w=jnp.pad(
                        w, ((0, 0), (0, 0), (0, npp - w.shape[-1]))))
        src_specs = {k: P(AXIS) for k in src_k}

        n, seg = self.n_steps, self.segment
        L_loc = self._loc_width()

        def inner(dd, wwg, auxg, mr, sk):
            ww = self._unstack_w(wwg)
            aux_l = dict(auxg)
            for k in ("rcv_elems", "rcv_w"):
                if k in aux_l:
                    aux_l[k] = aux_l[k][0]
            sk_l = {k: v[0] for k, v in sk.items()}
            lam, mu, irho = mr["lam"], mr["mu"], mr["irho"]

            def vel(sf):
                y = A(dd, ww, sf)
                if irho.shape[0] == 1:
                    return irho * y
                # packed: per-ROW (npp, L) material, broadcast per
                # component (solver/lane_diff.py _make_step)
                return (y.reshape(dim, npp, -1)
                        * irho[None]).reshape(y.shape)

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

            u0 = jnp.zeros((dim * npp, L_loc), self.dtype)
            s0 = jnp.zeros((n_sig * npp, L_loc), self.dtype)

            if illum:  # forward-only |u|^2 accumulation (no AD, no rcv)
                acc0 = jnp.zeros((npp, L_loc) if self._npar > 1
                                 else (L_loc,), self.dtype)

                def ibody(carry, k):
                    u, s, acc = carry
                    u, s = lf(u, s, k.astype(self.dtype) * self.dt)
                    u2 = (jnp.sum((u * u).reshape(dim, npp, -1), axis=0)
                          if self._npar > 1 else jnp.sum(u * u, axis=0))
                    return (u, s, acc + u2), None

                (_, _, acc), _ = jax.lax.scan(
                    ibody, (u0, s0, acc0), jnp.arange(n))
                return acc

            def body(carry, k):
                carry = lf(carry[0], carry[1],
                           k.astype(self.dtype) * self.dt)
                g = carry[0][:, aux_l["rcv_elems"]]
                # rcv_w is tile-row expanded to npp by the forward
                # runner's _pack_receivers (dead state rows are 0)
                g3 = g.reshape(dim, npp, -1)
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
        out_specs = P()
        if illum:  # shard-local lane rows -> global lane axis
            out_specs = P(None, AXIS) if self._npar > 1 else P(AXIS)
        return jax.shard_map(
            inner, mesh=r.mesh,
            in_specs=(d_specs, w_specs, aux_specs, m_specs, src_specs),
            out_specs=out_specs,
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
        src_np = jax.tree.map(np.asarray, self.src)  # host pre-slice
        out = []
        for k in range(self.n_shots):
            sk = jax.tree.map(lambda x, k=k: x[k], src_np)
            out.append(np.asarray(self._synth_one(
                theta, self._theta0, r.d, self.w, aux, sk)))
        return np.stack(out)

    def illumination(self, theta: dict | None = None):
        """Source-side illumination I_e = sum over shots, steps, nodes,
        components of u^2, accumulated INSIDE the shard_map'd forward
        scan (the DD analog of LaneDiffFwi.illumination — one extra
        per-lane VPU reduction per step, no wavefield storage, lane rows
        gathered over the mesh axis).  Returns (E,) float64 in original
        element order; use e.g. ``precond = 1/(I + 0.01*I.max())`` with
        solver.fwi.invert."""
        r = self.runner
        aux = self._aux()
        if not hasattr(self, "_illum_one"):
            self._illum_one = jax.jit(
                lambda th, df, dd, ww, auxg, sk:
                self._forward(th, df, dd, ww, auxg, sk, illum=True))
        th = {} if theta is None else theta
        src_np = jax.tree.map(np.asarray, self.src)  # host pre-slice
        tot = np.zeros((self._hp * self._npar, self._L)
                       if self._npar > 1 else (self._L,), np.float64)
        for k in range(self.n_shots):
            sk = jax.tree.map(lambda x, k=k: x[k], src_np)
            tot += np.asarray(self._illum_one(
                th, self._theta0, r.d, self.w, aux, sk), np.float64)
        out = np.zeros(self.E, np.float64)
        if self._npar == 1:
            out[np.asarray(self._perm)] = tot[self._lanes_np]
        else:
            # packed: paired elements live on one lane's disjoint parity
            # row sections — extract each element's own section sum
            vals = np.zeros(self.E, np.float64)
            for par in range(self._npar):
                kk = np.where(self._pars_np == par)[0]
                vals[kk] = tot[par * self._hp : (par + 1) * self._hp,
                               self._lanes_np[kk]].sum(axis=0)
            out[np.asarray(self._perm)] = vals
        return out

    def vg_factory(self, taps):
        if self.observed is None:
            raise ValueError("observed data not set")
        obs = self.observed
        if taps is not None:
            from ..solver.fwi import lowpass
            obs = lowpass(jnp.asarray(obs, self.dtype), taps, axis=1)
        r = self.runner
        aux = self._aux()

        if self._vg_one is None:
            def loss(th, df, dd, ww, auxg, sk, obs_s, taps_):
                return self._loss_one(th, df, dd, ww, auxg, sk,
                                      obs_s, taps_)

            self._vg_one = jax.jit(jax.value_and_grad(loss))

        # pre-sliced on HOST: per-shot jnp slicing costs ~1 s/dispatch
        # through the axon tunnel (see module docstring)
        obs_np = np.asarray(obs)
        src_np = jax.tree.map(np.asarray, self.src)

        def vg(theta):
            tot_v, tot_g = 0.0, None
            for k in range(self.n_shots):
                sk = jax.tree.map(lambda x, k=k: x[k], src_np)
                v, g = self._vg_one(theta, self._theta0, r.d, self.w,
                                    aux, sk, obs_np[k], taps)
                g = jax.tree.map(np.asarray, g)
                tot_v += float(v)
                tot_g = g if tot_g is None else jax.tree.map(
                    np.add, tot_g, g)
            return tot_v, tot_g

        return vg
