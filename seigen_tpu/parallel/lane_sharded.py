"""Multi-chip lane-major solver: slab-sharded structured meshes.

Combines the two fast paths into the production config-5 pipeline
(BASELINE.json config 5): the fully lane-major scan state + fused Pallas
kernels (solver/lane_major.py) sharded SPMD over a device mesh by SLAB
decomposition of the supercell grid's outer axis.  Each chip owns G0/P
supercell slabs (all classes, class-major lanes); the only cross-chip
communication is one state-plane `lax.ppermute` pair per operator
application — the lane-major analog of the reference's MPI halo exchange
(SURVEY.md §7.8), riding ICI.

Axis-0 (slab) shifts read [left_halo | local | right_halo] extended slabs —
the ring ppermute supplies halos, so periodic wrap is automatic and
non-periodic boundary faces are masked to own traces (the received garbage
plane is never read).  Axis-1/2 shifts are shard-local rolls.

The general unstructured sharded path (parallel/dist_ops.py) remains for
arbitrary meshes and shard counts; this path requires n_shards | G0.
Partition invariance vs the single-chip lane runner is verified on virtual
CPU devices (tests/test_lane_sharded.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas_kernels import (
    DEFAULT_BLOCK,
    build_pallas_data,
    stress_op_lm,
    vel_op_lm,
)
from ..ops.structured_exchange import StructuredExchange
from ..solver.source import ricker
from ..solver.timestep import State, compose_lf_step

AXIS = "x"


class ShardedLaneRunner:
    """Slab-sharded lane-major runner (requires a structured mesh and
    n_shards dividing the outer supercell-grid axis)."""

    def __init__(
        self,
        p_params,
        ex: StructuredExchange,
        dt: float,
        n_shards: int,
        order: int = 4,
        src=None,
        damp=None,
        receivers=None,
        block: int = DEFAULT_BLOCK,
        interpret: bool = False,
        devices=None,
    ):
        d = build_pallas_data(p_params)
        self.ex = ex
        self.order = order
        self.block = block
        self.interpret = interpret
        G0 = ex.grid[0]
        if G0 % n_shards:
            raise ValueError(
                f"slab sharding needs n_shards | G0 ({n_shards} vs {G0})")
        self.P = n_shards
        self.G0loc = G0 // n_shards
        self.rest_grid = tuple(ex.grid[1:])
        self.Grest = int(np.prod(self.rest_grid)) if self.rest_grid else 1
        self.m = ex.m
        E = d.E
        self.E = E
        self.E_loc = E // n_shards
        if self.E_loc % block:
            # Pallas grid must tile the local lane count exactly; fall back
            # to the largest power-of-two divisor (tiny test meshes).
            b = block
            while b > 1 and self.E_loc % b:
                b //= 2
            block = b
            self.block = b
        self.dtype = p_params.Ginv.dtype
        self.dt = jnp.asarray(dt, self.dtype)

        devices = (
            devices if devices is not None else jax.devices()[:n_shards])
        if len(devices) != n_shards:
            raise ValueError(
                f"need {n_shards} devices for {n_shards} shards, got "
                f"{len(devices)} — on CPU provision virtual devices "
                "first (XLA_FLAGS=--xla_force_host_platform_"
                "device_count=N)")
        self.mesh = Mesh(np.array(devices), (AXIS,))

        # --- lane permutation: shard-major (cls, g0_local, rest) ---
        old_of_new, new_of_old = self._compute_perm(ex, E, n_shards)
        self._old_of_new, self._new_of_old = old_of_new, new_of_old

        import dataclasses as _dc

        def pc(arr):
            a = np.asarray(arr)
            return jnp.asarray(a[:, old_of_new], a.dtype)

        self.d = d = _dc.replace(
            d, ginv=pc(d.ginv), nrm=pc(d.nrm), fsc=pc(d.fsc),
            beta=pc(d.beta), delta=pc(d.delta), irho=pc(d.irho),
            lam=pc(d.lam), mu=pc(d.mu),
        )

        # per-(face) self masks as lane vectors in the new global order:
        # lane (shard, cls=(t), g0l, rest) — mask depends on (t, f, cell)
        nf = ex.n_faces
        mask = np.zeros((nf, E), dtype=bool)
        for t in range(ex.m):
            for f in range(nf):
                mg = ex.self_mask[t, f].reshape(G0, self.Grest)
                for p_ in range(n_shards):
                    sl = mg[p_ * self.G0loc : (p_ + 1) * self.G0loc]
                    base = p_ * self.E_loc + t * self.G0loc * self.Grest
                    mask[f, base : base + self.G0loc * self.Grest] = (
                        sl.reshape(-1))
        self.self_mask = jnp.asarray(mask)  # (nf, E)

        if damp is not None:
            dn = np.zeros((d.npp, E), dtype=np.float64)
            dn[: d.n_p] = np.asarray(damp)[old_of_new].T
            self.damp_u = jnp.asarray(np.tile(dn, (d.dim, 1)), self.dtype)
            self.damp_s = jnp.asarray(np.tile(dn, (d.n_sig, 1)), self.dtype)
        else:
            self.damp_u = self.damp_s = None

        self.src = self._pack_sources(src, new_of_old) if src else None
        self.rcv = (
            self._pack_receivers(receivers, new_of_old)
            if receivers is not None else None
        )

        # static exchange row tables per field kind
        self.rows = {}
        for C, tag in ((d.dim, "u"), (d.n_sig, "s")):
            rs, ro = {}, {}
            for t in range(ex.m):
                for f in range(nf):
                    rs[(t, f)] = np.concatenate(
                        [c * d.npp + ex.nodes[t, f] for c in range(C)])
                    ro[(t, f)] = np.concatenate(
                        [c * d.npp + ex.own_nodes[f] for c in range(C)])
            self.rows[tag] = (rs, ro)

    def _compute_perm(self, ex, E, n_shards):
        base_grid, scale, m0 = ex.base_grid, ex.scale, ex.m0
        idx = np.arange(E)
        t = idx % m0
        c = idx // m0
        cs = []
        for g in reversed(base_grid):
            cs.append(c % g)
            c = c // g
        cs = cs[::-1]
        sup = [ci // scale for ci in cs]
        sub = [ci % scale for ci in cs]
        k = np.zeros_like(t)
        for s in sub:
            k = k * scale + s
        cls = k * m0 + t
        rest = np.zeros_like(t)
        for g, ci in zip(ex.grid[1:], sup[1:]):
            rest = rest * g + ci
        g0 = sup[0]
        shard = g0 // self.G0loc
        g0l = g0 % self.G0loc
        local = (cls * self.G0loc + g0l) * self.Grest + rest
        new_of_old = shard * self.E_loc + local
        old_of_new = np.empty(E, dtype=np.int64)
        old_of_new[new_of_old] = np.arange(E)
        return old_of_new, new_of_old

    def _pack_sources(self, src, new_of_old):
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
        new_e = new_of_old[np.asarray(src.elems)]
        shard = new_e // self.E_loc
        local = new_e % self.E_loc
        S_max = max(int(np.bincount(shard, minlength=self.P).max()), 1)
        elems_sh = np.zeros((self.P, S_max), dtype=np.int32)
        vu_sh = np.zeros((self.P, vu.shape[0], S_max), np.float64)
        vs_sh = np.zeros((self.P, vs.shape[0], S_max), np.float64)
        f0 = np.ones((self.P, S_max), np.float64)
        t0 = np.zeros((self.P, S_max), np.float64)
        amp = np.zeros((self.P, S_max), np.float64)
        fill = np.zeros(self.P, dtype=np.int64)
        for kk in range(K):
            p_ = shard[kk]
            j = fill[p_]
            elems_sh[p_, j] = local[kk]
            vu_sh[p_, :, j] = vu[:, kk]
            vs_sh[p_, :, j] = vs[:, kk]
            f0[p_, j] = np.asarray(src.f0)[kk]
            t0[p_, j] = np.asarray(src.t0)[kk]
            amp[p_, j] = np.asarray(src.amp)[kk]
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
        new_e = new_of_old[np.asarray(rcv.elems)]
        shard = new_e // self.E_loc
        local = new_e % self.E_loc
        R = len(new_e)
        elems_sh = np.zeros((self.P, R), dtype=np.int32)
        w_sh = np.zeros((self.P, R, np.asarray(rcv.weights).shape[1]),
                        np.float64)
        for r in range(R):
            elems_sh[shard[r], r] = local[r]
            w_sh[shard[r], r] = np.asarray(rcv.weights)[r]
        return dict(elems=jnp.asarray(elems_sh),
                    w=jnp.asarray(w_sh, self.dtype))

    # ------------------------------------------------------------------
    def _exchange_loc(self, F_loc, mask_loc, tag, C):
        """Shard-local exchange with halo-plane ppermute.

        F_loc: (C*npp, E_loc); returns (C*ftpp, E_loc) neighbour traces.
        """
        ex, d = self.ex, self.d
        rowsN = C * d.npp
        m, G0l, Grest = self.m, self.G0loc, self.Grest
        Fv = F_loc.reshape(rowsN, m, G0l, Grest)
        fwd = [(i, (i - 1) % self.P) for i in range(self.P)]
        bwd = [(i, (i + 1) % self.P) for i in range(self.P)]
        right_halo = jax.lax.ppermute(Fv[:, :, 0], AXIS, fwd)  # from p+1
        left_halo = jax.lax.ppermute(Fv[:, :, -1], AXIS, bwd)  # from p-1

        rows_src, rows_own = self.rows[tag]
        mask_v = mask_loc.reshape(ex.n_faces, m, G0l, Grest)
        rest_grid = self.rest_grid
        dimr = len(rest_grid)

        cls_blocks = []
        for t in range(ex.m):
            face_blocks = []
            for f in range(ex.n_faces):
                t2 = int(ex.nbr_class[t, f])
                rs = rows_src[(t, f)]
                slab = Fv[rs, t2]  # (C*nfp, G0l, Grest)
                s0 = int(ex.shift[t, f, 0])
                if s0 == 1:
                    slab = jnp.concatenate(
                        [slab[:, 1:], right_halo[rs, t2][:, None]], axis=1)
                elif s0 == -1:
                    slab = jnp.concatenate(
                        [left_halo[rs, t2][:, None], slab[:, :-1]], axis=1)
                if dimr:
                    blk = slab.reshape((len(rs), G0l) + rest_grid)
                    for ax in range(dimr):
                        s = int(ex.shift[t, f, 1 + ax])
                        if s:
                            blk = jnp.roll(blk, -s, axis=2 + ax)
                    slab = blk.reshape(len(rs), G0l, Grest)
                if ex.self_mask[t, f].any():
                    own_blk = Fv[rows_own[(t, f)], t]
                    mk = mask_v[f, t][None]  # (1, G0l, Grest)
                    slab = jnp.where(mk, own_blk, slab)
                face_blocks.append(
                    slab.reshape(C, ex.n_fp, G0l * Grest))
            cls = jnp.concatenate(face_blocks, axis=1)  # (C, ftp, NCloc)
            pad_rows = d.ftpp - ex.n_faces * ex.n_fp
            if pad_rows:
                cls = jnp.pad(cls, ((0, 0), (0, pad_rows), (0, 0)))
            cls_blocks.append(cls.reshape(C * d.ftpp, G0l * Grest))
        return jnp.concatenate(cls_blocks, axis=1)  # (C*ftpp, E_loc)

    def _step_loc(self, d_loc, aux, mask_loc, carry, t):
        blk, itp = self.block, self.interpret

        def vel(sf):
            tr = self._exchange_loc(sf, mask_loc, "s", self.d.n_sig)
            return vel_op_lm(d_loc, sf, tr, blk, itp)

        def stress(uf):
            tr = self._exchange_loc(uf, mask_loc, "u", self.d.dim)
            return stress_op_lm(d_loc, uf, tr, blk, itp)

        def inj(vecs):
            if self.src is None:
                return lambda f, t_: f
            return lambda f, t_: f.at[:, aux["src_elems"]].add(
                vecs * (aux["src_amp"]
                        * ricker(t_, aux["src_f0"], aux["src_t0"]))
                [None, :].astype(self.dtype))

        def post(u, s):
            if self.damp_u is None:
                return u, s
            return u * aux["damp_u"], s * aux["damp_s"]

        lf = compose_lf_step(
            vel=vel, stress=stress,
            inject_u=inj(aux.get("src_vu")), inject_s=inj(aux.get("src_vs")),
            post=post, dt=self.dt, order=self.order,
        )
        return lf(carry[0], carry[1], t)

    # ------------------------------------------------------------------
    def _aux_global(self):
        aux = {}
        if self.damp_u is not None:
            aux["damp_u"], aux["damp_s"] = self.damp_u, self.damp_s
        if self.src is not None:
            aux["src_elems"] = self.src["elems"]
            aux["src_vu"] = self.src["vu"]
            aux["src_vs"] = self.src["vs"]
            aux["src_f0"] = self.src["f0"]
            aux["src_t0"] = self.src["t0"]
            aux["src_amp"] = self.src["amp"]
        if self.rcv is not None:
            aux["rcv_elems"] = self.rcv["elems"]
            aux["rcv_w"] = self.rcv["w"]
        return aux

    def _aux_specs(self):
        specs = {}
        if self.damp_u is not None:
            specs["damp_u"] = P(None, AXIS)
            specs["damp_s"] = P(None, AXIS)
        if self.src is not None:
            for k in ("src_elems", "src_vu", "src_vs", "src_f0", "src_t0",
                      "src_amp"):
                specs[k] = P(AXIS)
        if self.rcv is not None:
            specs["rcv_elems"] = P(AXIS)
            specs["rcv_w"] = P(AXIS)
        return specs

    def _go(self):
        if hasattr(self, "_go_fn"):
            return self._go_fn
        d = self.d
        import dataclasses as _dc

        d_specs = _dc.replace(
            d,
            dr=P(), lift=P(), rmat=P(), drr=P(),
            ginv=P(None, AXIS), nrm=P(None, AXIS), fsc=P(None, AXIS),
            beta=P(None, AXIS), delta=P(None, AXIS), irho=P(None, AXIS),
            lam=P(None, AXIS), mu=P(None, AXIS),
        )
        st_specs = (P(None, AXIS), P(None, AXIS))
        mask_specs = P(None, AXIS)
        aux_specs = self._aux_specs()

        def inner(d_g, aux_g, mask_g, ulm, slm, k0, n):
            # squeeze per-shard leading axes on stacked source/receiver data
            aux = dict(aux_g)
            for k in ("src_elems", "src_vu", "src_vs", "src_f0", "src_t0",
                      "src_amp", "rcv_elems", "rcv_w"):
                if k in aux:
                    aux[k] = aux[k][0]

            def body(carry, k):
                carry = self._step_loc(
                    d_g, aux, mask_g, carry, k.astype(self.dtype) * self.dt)
                if self.rcv is not None:
                    g = carry[0][:, aux["rcv_elems"]]
                    g3 = g.reshape(d.dim, d.npp, -1)[:, : d.n_p]
                    partial = jnp.einsum("ri,cir->rc", aux["rcv_w"], g3)
                    ys = jax.lax.psum(partial, AXIS)
                else:
                    ys = None
                return carry, ys

            (ulm, slm), seis = jax.lax.scan(
                body, (ulm, slm), jnp.arange(n) + k0)
            return ulm, slm, seis

        def go(d_g, aux_g, mask_g, ulm, slm, k0, n):
            return jax.shard_map(
                functools.partial(inner, n=n),
                mesh=self.mesh,
                in_specs=(d_specs, aux_specs, mask_specs, st_specs[0],
                          st_specs[1], P()),
                out_specs=(st_specs[0], st_specs[1],
                           None if self.rcv is None else P()),
                check_vma=False,
            )(d_g, aux_g, mask_g, ulm, slm, k0)

        self._go_fn = jax.jit(go, static_argnames=("n",))
        return self._go_fn

    # --- layout conversion (global) ---
    def to_lm_state(self, state: State):
        d = self.d
        perm = jnp.asarray(self._old_of_new)

        def conv(x, rows_pad):
            E, mnodes, C = x.shape
            out = jnp.zeros((C * rows_pad, self.E), dtype=x.dtype)
            xt = x[perm].transpose(2, 1, 0)
            for c in range(C):
                out = out.at[c * rows_pad : c * rows_pad + mnodes].set(xt[c])
            return out

        return conv(state.u, d.npp), conv(state.s, d.npp)

    def from_lm_state(self, ulm, slm) -> State:
        d = self.d
        inv = jnp.asarray(self._new_of_old)

        def conv(y, C):
            parts = [y[c * d.npp : c * d.npp + d.n_p] for c in range(C)]
            return jnp.stack(parts, axis=0).transpose(2, 1, 0)[inv]

        return State(u=conv(ulm, d.dim), s=conv(slm, d.n_sig))

    def run(self, state0: State, n_steps: int, step0: int = 0):
        """``step0``: global first-step index (resume support)."""
        ulm, slm = self.to_lm_state(state0)
        ulm, slm, seis = self._go()(
            self.d, self._aux_global(), self.self_mask, ulm, slm,
            jnp.asarray(step0), n_steps)
        return self.from_lm_state(ulm, slm), (
            None if seis is None else np.asarray(seis))
