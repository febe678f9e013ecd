"""Domain-decomposed FWI gradients on UNSTRUCTURED meshes: the
energy-conjugation custom VJPs of solver/lane_diff.py applied to the
Morton-block sharded in-kernel-select operators.

This is the last cell of the inversion parallel-axis matrix — the
reference's flagship combination (unstructured AND distributed,
SURVEY.md §3/§9.3) made differentiable:

    structured mesh  | single chip: LaneDiffFwi(engine="lane"/"merged")
                     | domain-dec.: parallel/lane_diff_sharded.py
    unstructured mesh| single chip: LaneDiffFwi(engine="lane_u")
                     | domain-dec.: THIS MODULE

Why the conjugation identities survive sharding unchanged: the sharded
unstructured operators (parallel/unstructured_sharded.py: shard-local
Pallas (f2, pi)-select kernels + one all-gathered boundary trace panel)
compute exactly the GLOBAL material-free operators — partition
invariance is tested — and the conjugation weights (reference mass
matrix x per-element detJ) are block-diagonal per element, hence
shard-local.  The transpose of each sharded operator is therefore ONE
application of the OTHER sharded operator, halo all_gather included, so
the adjoint sweep's cross-chip traffic is the same compact trace panel
as the forward's.  Exactness vs the single-chip lane_u engine is
asserted in tests/test_unstructured_diff_sharded.py.

The exchange index plans (lane takes, halo gather columns, select
combos) ride as integer leaves of the conjugation-weight tree ``w``
(structural float0 cotangents, solver/lane_diff._ct_zeros), so every
E-sized operand stays a jit ARGUMENT (the axon remote-compile size
rule, solver/lane_major.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.pallas_kernels import stress_op_lm_sel, vel_op_lm_trac_sel
from ..solver.lane_diff import (_mass_weights, _material_free,
                                lame_rows, make_conjugated_vjp,
                                theta_of_params)
from ..solver.source import ricker
from ..solver.timestep import compose_lf_step
from .unstructured_sharded import AXIS, ShardedUnstructuredRunner

# w leaves that are shard-stacked along a leading P axis (un-stacked
# inside the shard_map body before reaching the custom-vjp ops)
_W_STACKED = ("take", "gather", "combo", "sign")


class ShardedUnstructuredDiffFwi:
    """Morton-block-sharded FWI value-and-gradient on arbitrary
    conforming meshes (single- or multi-shot, shots looped on host; the
    DOMAIN is the sharded axis)."""

    def __init__(
        self,
        p0,
        dm,
        dt: float,
        n_steps: int,
        shots,
        receivers,
        observed,
        n_shards: int,
        *,
        order: int = 4,
        damp=None,
        segment: int | None = None,
        block: int = 256,
        interpret: bool | None = None,
        devices=None,
    ):
        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        if receivers is None:
            raise ValueError("ShardedUnstructuredDiffFwi needs receivers")
        self.runner = ShardedUnstructuredRunner(
            _material_free(p0), dt, n_shards,
            centroids=np.asarray(dm.coords.mean(axis=1)),
            order=order, src=None, damp=damp, receivers=receivers,
            block=block, interpret=interpret, devices=devices)
        r = self.runner
        self.order = order
        self.n_steps = n_steps
        self.segment = segment
        self.dtype = r.dtype
        self.dt = r.dt
        self.E = r.E
        self.observed = observed
        self._theta0 = theta_of_params(p0)
        self._perm = jnp.asarray(r._old_of_new)

        # mass-conjugation weights on the first E lanes of E_pad (dead
        # tail lanes are inert self-paired elements), plus the exchange
        # plan: rmat replicated, takes/gathers/combos/signs shard-stacked
        self.w = _mass_weights(dm, r)
        self.w.update(rmat=r._rmat, take=r._take, gather=r._gather,
                      combo=r._combo, sign=r._sign)

        # per-shot shard-packed sources, shot axis padded to a common
        # per-shard S_max (amp=0 fill) for one jit signature
        elems = np.asarray(shots.elems)
        if elems.ndim == 1:
            shots = jax.tree.map(lambda x: jnp.asarray(x)[None], shots)
            elems = elems[None]
        self.n_shots = elems.shape[0]
        packed = [
            r._pack_sources(
                jax.tree.map(lambda x, k=k: np.asarray(x)[k], shots),
                r._new_of_old)
            for k in range(self.n_shots)
        ]
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
        # create the custom_vjp closures OUTSIDE any trace (the closures
        # themselves carry no arrays; consistency with the other engines)
        self._make_ops()

    # -- custom-vjp'd shard-local material-free ops --------------------
    def _make_ops(self):
        if hasattr(self, "_ops"):
            return self._ops
        r = self.runner
        d = r.d
        blk, itp = r.block, r.interpret

        # ww doubles as the runner's exchange aux (rmat/gather/take keys)
        def a_prim(dd, ww, sf):
            return vel_op_lm_trac_sel(
                dd, sf, r._panels_t(dd, ww, sf), ww["combo"], ww["sign"],
                r._selcfg, blk, itp)

        def b_prim(dd, ww, uf):
            return stress_op_lm_sel(
                dd, uf, r._panels_u(dd, ww, uf), ww["combo"],
                r._selcfg, blk, itp)

        self._ops = make_conjugated_vjp(a_prim, b_prim, d.dim, d.n_sig,
                                        d.npp, self.dtype)
        return self._ops

    def _mrows(self, theta, defaults):
        """theta {vp,vs,rho} (E,) original order -> (1, E_pad) lane rows
        (Morton order, inert tail: lam=mu=0, irho=1)."""
        full = {**defaults, **theta}
        take = lambda a: jnp.asarray(a, self.dtype)[self._perm]
        lam, mu, irho = lame_rows(take(full["vp"]), take(full["vs"]),
                                  take(full["rho"]))

        def place(a, dead):
            row = jnp.full((self.runner.E_pad,), dead, self.dtype)
            return row.at[: self.E].set(a)[None]

        return {"lam": place(lam, 0.0), "mu": place(mu, 0.0),
                "irho": place(irho, 1.0)}

    def _aux(self):
        r = self.runner
        aux = {}
        if r.damp_u is not None:
            aux["damp_u"], aux["damp_s"] = r.damp_u, r.damp_s
        if r.rcv is not None:
            aux["rcv_elems"] = r.rcv["elems"]
            aux["rcv_w"] = r.rcv["w"]
        return aux

    # -- the shard_map'd differentiable forward ------------------------
    def _forward(self, theta, defaults, dd, ww, aux, src_k):
        """(n_steps, R, dim) seismograms; runs UNDER jit, shard_map
        inside."""
        r = self.runner
        d = r.d
        A, B = self._make_ops()
        n_sig, npp, dim = d.n_sig, d.npp, d.dim

        lane = P(None, AXIS)
        d_specs = dataclasses.replace(
            d, dr=P(), lift=P(), rmat=P(), drr=P(), ginv=lane, nrm=lane,
            fsc=lane, beta=lane, delta=lane, irho=lane, lam=lane, mu=lane)
        w_specs = {"Mn": P(), "Mninv": P(), "detj": lane, "idetj": lane,
                   "rmat": P(), "take": P(AXIS), "gather": P(AXIS),
                   "combo": P(AXIS), "sign": P(AXIS)}
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

        def inner(dd, wwg, auxg, mr, sk):
            ww = dict(wwg)
            for k in _W_STACKED:
                ww[k] = ww[k][0]
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

            u0 = jnp.zeros((dim * npp, r.E_loc), self.dtype)
            s0 = jnp.zeros((n_sig * npp, r.E_loc), self.dtype)

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
