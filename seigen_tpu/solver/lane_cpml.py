"""C-PML on the merged lane engine — absorbing layers at lane speed.

VERDICT r4 (next-round #6): the C-PML physics costs +5% but lived on the
einsum path, 9x slower than the merged engine on the same mesh — any PML
production run paid 9x.  This runner closes that hole WITHOUT new Pallas
kernels, exploiting two structural facts:

1. **The stock merged kernels compute exact direction-split operators
   when fed direction-masked tables.**  The split velocity piece
   V_k(sigma) (ops/cpml.apply_vel_op_split) is the full merged velocity
   operator evaluated with (a) geo whose Ginv columns d != k and normal
   sections d != k are zeroed and (b) traction traces contracted with
   only n_k.  Likewise the split strain/stress piece S_k(u) is the
   merged stress operator under the same geo mask (its velocity-trace
   payload is direction-independent; the n_k weighting enters through
   the masked normal sections).  The boundary-flux coefficients
   (beta_t/delta_u via scb/bfs/dfs) ride unchanged — they are
   per-(element, face) scalars that commute with the n_k weighting,
   exactly as in the einsum split (ops/cpml.py docstring).

2. **Memory fields in operator-output units commute with the decay
   ODE.**  The kernels apply material in-kernel (1/rho, Hooke), so the
   natural memory variables here are pv_k = (1/rho) psi_v[k] and
   ps_k = C : sym(psi_s[k]) — per-element material factors commute with
   the per-(node, direction) diagonal decay, so

       udot   = sum_k (V_k + pv_k)
       pvdot_k = -(d_k + a_k) pv_k - d_k V_k      (V_k kernel output)
       sdot   = sum_k (S_k + ps_k)
       psdot_k = -(d_k + a_k) ps_k - d_k S_k

   integrates the SAME dynamics as solver/pml.make_cpml_rhs (equivalence
   asserted to roundoff in tests/test_cpml.py).  ps lives in Voigt
   stress rows (n_sig) rather than raw-gradient rows: the sym embedding
   of a direction-k gradient piece mixes only entries that share the
   same (node, k) decay coefficient, so the Voigt ODE is exact.

Per RHS: dim velocity + dim stress merged ops with per-RHS trace seeding
(the diff-path architecture — no producer-trace carry), classical RK4
method-of-lines (the same scheme as the einsum C-PML path; LF4's cubic
stages have no consistent convolution slot).  Cost ~= 3x a merged LF4
step in 3D vs the 9x einsum penalty; measured rows in BENCH_NOTES r5.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.elastic import ElasticParams, voigt_map
from ..ops.merged_kernels import stress_merged, vel_merged
from ..ops.structured_exchange import StructuredExchange
from .lane_merged import MergedLaneRunner
from .pml import cpml_profiles
from .source import ricker


class CpmlLaneRunner:
    """Merged-engine C-PML RK4 runner (single chip, isotropic)."""

    def __init__(
        self,
        p: ElasticParams,
        dm,
        ex: StructuredExchange,
        dt: float,
        sides,
        width: float,
        vp_max: float,
        f0: float = 2.0,
        src=None,
        receivers=None,
        block: int | None = None,
        interpret: bool = False,
        R0: float = 1e-4,
        p_exp: float = 2.0,
    ):
        # layout/source/receiver machinery from the stock merged runner;
        # its LF4 step is unused (order=4 satisfies its constructor)
        self.r = r = MergedLaneRunner(
            p, ex, dt, order=4, src=src, receivers=receivers,
            block=block, interpret=interpret)
        if r.n_par != 1:
            raise ValueError("C-PML lane runner is unpacked-only")
        self.dtype = r.dtype
        self._dt_f = float(dt)
        d = r.d
        self.dim, self.n_sig, self.npp = d.dim, d.n_sig, d.npp
        o_ginv, o_nrm = d.off[0], d.off[1]

        # direction-masked geo tables: split operators from stock kernels
        geo = np.asarray(d.geo)
        self.d_dir = []
        for k in range(d.dim):
            g = geo.copy()
            for rd in range(d.dim * d.dim):
                if rd % d.dim != k:
                    g[o_ginv + rd] = 0.0
            for dd_ in range(d.dim):
                if dd_ != k:
                    g[o_nrm + 8 * dd_ : o_nrm + 8 * dd_ + 8] = 0.0
            self.d_dir.append(dataclasses.replace(
                d, geo=jnp.asarray(g, self.dtype)))

        # per-node profiles in lane layout: (dim, npp, Ls)
        dprof, aprof = cpml_profiles(dm, sides, width, vp_max, f0=f0,
                                     R0=R0, p_exp=p_exp)

        def lane_prof(P_):
            arr = np.asarray(P_)[r._old_of_new]  # (E, n_p, dim) class-major
            out = np.zeros((d.dim, d.npp, r.plan.Ls))
            for k in range(d.dim):
                rows = np.zeros((d.npp, r.E))
                rows[: d.n_p] = arr[:, :, k].T
                out[k] = r._place(rows)
            return jnp.asarray(out, self.dtype)

        self.dd = lane_prof(dprof)
        self.decay = lane_prof(dprof + aprof)

    # --- trace seeds (per RHS; no producer-trace carry) ----------------
    def _assemble_traces(self, rows):
        """Per-component (ftpp, Ls) own-face rows -> merged per-face TRACE
        layout (nf*rtf, Lt) (the unpacked tail of traction_traces)."""
        r = self.r
        d, plan = r.d, r.plan
        nfp, pad = d.n_fp, plan.rtq - len(rows) * d.n_fp
        blocks = []
        for f in range(plan.nf):
            blocks += [rows[c][f * nfp : (f + 1) * nfp]
                       for c in range(len(rows))]
            if pad:
                blocks.append(jnp.zeros((pad, plan.Ls), rows[0].dtype))
        blk = jnp.concatenate(blocks, axis=0)
        out = jnp.zeros((plan.nf * plan.rtf, plan.Lt), dtype=blk.dtype)
        for t in range(plan.m):
            out = jax.lax.dynamic_update_slice(
                out, blk[:, t * plan.NCs : t * plan.NCs + r.NC],
                (0, t * plan.NCt + plan.h0))
        return out

    def _mul_prof(self, x, prof, C):
        """(C*npp, Ls) * per-(node, lane) profile rows (npp, Ls)."""
        return (x.reshape(C, self.npp, -1) * prof[None]).reshape(x.shape)

    # --- the C-PML RHS -------------------------------------------------
    def rhs(self, carry, t):
        r = self.r
        d, plan, mask, itp = r.d, r.plan, r.mask, r.interpret
        dim, n_sig, npp = self.dim, self.n_sig, self.npp
        V = voigt_map(dim)
        u, s, pv, ps = carry

        tru = self._assemble_traces(
            [r._rmat @ u[c * npp : (c + 1) * npp] for c in range(dim)])
        tr_sig = [r._rmat @ s[c * npp : (c + 1) * npp]
                  for c in range(n_sig)]

        udot = sdot = None
        pvdot, psdot = [], []
        for k in range(dim):
            trt_k = self._assemble_traces(
                [r._nrm_exp[k] * tr_sig[V[c, k]] for c in range(dim)])
            Vk, _ = vel_merged(plan, self.d_dir[k], s, trt_k, mask, itp)
            uk = Vk + pv[k]
            udot = uk if udot is None else udot + uk
            pvdot.append(-self._mul_prof(pv[k], self.decay[k], dim)
                         - self._mul_prof(Vk, self.dd[k], dim))

            Sk, _ = stress_merged(plan, self.d_dir[k], u, tru, mask, itp)
            sk = Sk + ps[k]
            sdot = sk if sdot is None else sdot + sk
            psdot.append(-self._mul_prof(ps[k], self.decay[k], n_sig)
                         - self._mul_prof(Sk, self.dd[k], n_sig))

        if r.src_elems is not None:
            from .timestep import inject_columns

            w = (r.src_amp * ricker(t, r.src_f0, r.src_t0))[None, :]
            w = w.astype(self.dtype)
            udot = inject_columns(udot, r.src_elems, r.src_vu * w,
                                  unique=r._src_unique)
            sdot = inject_columns(sdot, r.src_elems, r.src_vs * w,
                                  unique=r._src_unique)
        return (udot, sdot, jnp.stack(pvdot), jnp.stack(psdot))

    # --- classical RK4 (method of lines, as solver/pml.run_cpml) -------
    def step(self, carry, t):
        dt = self._dt_f

        def ax(st, k, c):
            return jax.tree.map(lambda x, y: x + c * y, st, k)

        k1 = self.rhs(carry, t)
        k2 = self.rhs(ax(carry, k1, 0.5 * dt), t + 0.5 * dt)
        k3 = self.rhs(ax(carry, k2, 0.5 * dt), t + 0.5 * dt)
        k4 = self.rhs(ax(carry, k3, dt), t + dt)
        return jax.tree.map(
            lambda x, a, b, c, e: x + (dt / 6.0) * (a + 2 * b + 2 * c + e),
            carry, k1, k2, k3, k4)

    def init_carry(self, state0):
        r = self.r
        ulm, slm = r.to_lm_state(state0)
        L = r.plan.Ls
        pv = jnp.zeros((self.dim, self.dim * self.npp, L), self.dtype)
        ps = jnp.zeros((self.dim, self.n_sig * self.npp, L), self.dtype)
        return (ulm, slm, pv, ps)

    def _go(self):
        if not hasattr(self, "_go_fn"):

            @functools.partial(jax.jit, static_argnames=("n",))
            def go(carry, n, k0):
                aux = self.r._aux()

                def body(c, k):
                    c = self.step(c, k.astype(self.dtype) * self.r.dt)
                    ys = (self.r._sample(aux, c[0])
                          if self.r.rcv is not None else None)
                    return c, ys

                return jax.lax.scan(body, carry, jnp.arange(n) + k0)

            self._go_fn = go
        return self._go_fn

    def run(self, state0, n_steps: int, step0: int = 0):
        carry, seis = self._go()(self.init_carry(state0), n_steps,
                                 jnp.asarray(step0))
        return (self.r.from_lm_state(carry[0], carry[1]),
                None if seis is None else np.asarray(seis))
