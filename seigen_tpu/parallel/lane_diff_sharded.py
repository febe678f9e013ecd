"""Domain-decomposed FWI gradients: the energy-conjugation custom VJPs of
solver/lane_diff.py applied to the SLAB-SHARDED lane operators.

Why this works unchanged: the conjugation identities

    A^T  = -detJ (M x K^-1)  B'  detJ^-1 (M^-1 x I)
    B'^T = -detJ (M x I)     A   detJ^-1 (M^-1 x K)

hold for the GLOBAL material-free operators, and the sharded operators
(parallel/lane_sharded.py: shard-local Pallas kernels + halo-plane
ppermute exchange) compute exactly the global operators (partition
invariance is tested).  The mass weights are block-diagonal PER ELEMENT,
so they apply shard-locally; the transpose of each sharded operator is
therefore ONE application of the OTHER sharded operator — halo exchange
included — conjugated by local weights.  No collective ever needs
hand-transposing: the adjoint sweep's halo traffic is just the forward
exchange of the conjugate field.

This completes the parallel-axis matrix for inversion: shots scale by
data parallelism (solver/lane_diff.vg_factory_sharded, psum'd grads) and
a single too-big-for-one-chip shot scales by domain decomposition (this
module).  Gradient equivalence vs the single-chip lane path is verified
on virtual devices in tests/test_lane_diff_sharded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.pallas_kernels import stress_op_lm, vel_op_lm
from ..solver.lane_diff import (_mass_weights, _material_free,
                                lame_rows, make_conjugated_vjp,
                                theta_of_params)
from ..solver.source import ricker
from ..solver.timestep import compose_lf_step
from .lane_sharded import AXIS, ShardedLaneRunner


class ShardedLaneDiffFwi:
    """Mesh-sharded FWI value-and-gradient (single- or multi-shot, shots
    looped on host; the DOMAIN is the sharded axis)."""

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
            raise ValueError("ShardedLaneDiffFwi needs receivers")
        self.runner = ShardedLaneRunner(
            _material_free(p0), ex, dt, n_shards, order=order, src=None,
            damp=damp, receivers=receivers, block=block,
            interpret=interpret, devices=devices)
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

        # mass-conjugation weights, global lane rows (sharded by lanes);
        # the boundary mask travels in w as float rows so the shared
        # conjugation factory sees all-float cotangent structure
        self.w = _mass_weights(dm, r, lanes=np.arange(r.E), L=r.E)
        self.w["mask"] = r.self_mask.astype(self.dtype)

        # per-shot shard-packed sources
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
        # per-shot packing pads to that shot's own per-shard max; pad the
        # shot axis to a common S_max for one jit signature
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
        # create the custom_vjp closures OUTSIDE any trace: the kinv/kdiag
        # constants they capture must not be materialized while a jit trace
        # is live (tracer-constant lowering failure otherwise)
        self._make_ops()

    # -- custom-vjp'd shard-local material-free ops --------------------
    def _make_ops(self):
        if hasattr(self, "_ops"):
            return self._ops
        r = self.runner
        d = r.d
        blk, itp = r.block, r.interpret

        def a_prim(dd, ww, sf):
            tr = r._exchange_loc(sf, ww["mask"] != 0, "s", d.n_sig)
            return vel_op_lm(dd, sf, tr, blk, itp)

        def b_prim(dd, ww, uf):
            tr = r._exchange_loc(uf, ww["mask"] != 0, "u", d.dim)
            return stress_op_lm(dd, uf, tr, blk, itp)

        self._ops = make_conjugated_vjp(a_prim, b_prim, d.dim, d.n_sig,
                                        d.npp, self.dtype)
        return self._ops

    def _mrows(self, theta, defaults):
        full = {**defaults, **theta}
        take = lambda a: jnp.asarray(a, self.dtype)[self._perm]
        lam, mu, irho = lame_rows(take(full["vp"]), take(full["vs"]),
                                  take(full["rho"]))
        return {"lam": lam[None], "mu": mu[None], "irho": irho[None]}

    # -- the shard_map'd differentiable forward ------------------------
    def _forward(self, theta, defaults, dd, ww, aux, src_k):
        """(n_steps, R, dim) seismograms; runs UNDER jit, shard_map inside."""
        r = self.runner
        d = r.d
        A, B = self._make_ops()
        n_sig, npp, dim = d.n_sig, d.npp, d.dim

        d_specs = type(d)(
            dr=P(), lift=P(), rmat=P(), drr=P(),
            ginv=P(None, AXIS), nrm=P(None, AXIS), fsc=P(None, AXIS),
            beta=P(None, AXIS), delta=P(None, AXIS), irho=P(None, AXIS),
            lam=P(None, AXIS), mu=P(None, AXIS),
            dim=d.dim, n_p=d.n_p, npp=d.npp, ftp=d.ftp, ftpp=d.ftpp,
            n_sig=d.n_sig, E=d.E)
        w_specs = {"Mn": P(), "Mninv": P(), "detj": P(None, AXIS),
                   "idetj": P(None, AXIS), "mask": P(None, AXIS)}
        m_specs = {k: P(None, AXIS) for k in ("lam", "mu", "irho")}
        aux_specs = {}
        if "damp_u" in aux:
            aux_specs["damp_u"] = P(None, AXIS)
            aux_specs["damp_s"] = P(None, AXIS)
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

            rowsu = dim * npp
            rowss = n_sig * npp
            u0 = jnp.zeros((rowsu, r.E_loc), self.dtype)
            s0 = jnp.zeros((rowss, r.E_loc), self.dtype)

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

    def _loss_one(self, theta, defaults, dd, ww, aux, src_k, obs,
                  taps):
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
        aux = r._aux_global()
        aux = {k: v for k, v in aux.items()
               if k.startswith("rcv") or k.startswith("damp")}
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
        aux = {k: v for k, v in r._aux_global().items()
               if k.startswith("rcv") or k.startswith("damp")}

        if self._vg_one is None:
            def loss(th, df, dd, ww, auxg, sk, obs_s, taps_):
                return self._loss_one(th, df, dd, ww, auxg, sk,
                                      obs_s, taps_)

            self._vg_one = jax.jit(jax.value_and_grad(loss))

        def vg(theta):
            tot_v, tot_g = 0.0, None
            for k in range(self.n_shots):
                sk = {kk: v[k] for kk, v in self.src.items()}
                v, g = self._vg_one(theta, self._theta0, r.d, self.w, aux,
                                    sk, obs[k], taps)
                tot_v += float(v)
                tot_g = g if tot_g is None else jax.tree.map(
                    jnp.add, tot_g, g)
            return tot_v, tot_g

        return vg
