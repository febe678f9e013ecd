"""Fully lane-major LF2/LF4 solver path — the TPU speed-of-light pipeline.

Measurement (BENCH_NOTES.md): the fused lane-major Pallas operator runs in
~0.4 ms at E=83k, but converting (E, n_p, C) <-> (C n_p, E) around every call
costs ~10x that.  This module keeps the ENTIRE scan state in the lane-major
layout — u: (dim*npp, E_pad), sigma: (n_sig*npp, E_pad) — so a timestep is
exactly: roll-exchange (row space) -> fused kernel, 6x, plus source
scatter-add into lane columns and a tiled damping multiply.  Layout
conversions happen once at the start/end of a run.

Requires a structured mesh (ops/structured_exchange.py) and the Pallas
kernels; the general-layout path in solver/timestep.py remains the fallback
and the correctness oracle (tests/test_lane_major.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.elastic import ElasticParams
from ..ops.pallas_kernels import (
    DEFAULT_BLOCK,
    PallasOpData,
    build_pallas_data,
    stress_op_lm,
    vel_op_lm,
)
from ..ops.structured_exchange import StructuredExchange, _class_index
from .receivers import ReceiverData
from .source import SourceData, ricker
from .timestep import State, compose_lf_step


def _rup(x, m):
    return ((x + m - 1) // m) * m


def to_lm(x: jax.Array, rows_pad: int, E_pad: int) -> jax.Array:
    """(E, m, C) -> (C*rows_pad, E_pad)."""
    E, m, C = x.shape
    out = jnp.zeros((C * rows_pad, E_pad), dtype=x.dtype)
    xt = x.transpose(2, 1, 0)
    for c in range(C):
        out = out.at[c * rows_pad : c * rows_pad + m, :E].set(xt[c])
    return out


def from_lm(y: jax.Array, m: int, rows_pad: int, C: int, E: int) -> jax.Array:
    parts = [y[c * rows_pad : c * rows_pad + m, :E] for c in range(C)]
    return jnp.stack(parts, axis=0).transpose(2, 1, 0)


def class_major_perm(ex: StructuredExchange, E: int):
    """Element permutation to class-major lane order.

    Returns (old_of_new, new_of_old): new id = class * n_cells + supercell
    lex index — every class becomes a CONTIGUOUS lane slice, so exchange
    reads/writes are dense (interleaved-lane writes measured ~10x slower).
    """
    base_grid = ex.base_grid
    scale, m0 = ex.scale, ex.m0
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
    supflat = sup[0]
    for g, ci in zip(ex.grid[1:], sup[1:]):
        supflat = supflat * g + ci
    NC = int(np.prod(ex.grid))
    new_of_old = cls * NC + supflat
    old_of_new = np.empty(E, dtype=np.int64)
    old_of_new[new_of_old] = np.arange(E)
    return old_of_new, new_of_old


def make_exchange_lm(ex: StructuredExchange, d: PallasOpData, C: int,
                     E: int, E_pad: int):
    """Lane-major roll-based trace exchange in CLASS-MAJOR element order:
    (C*npp, E_pad) field -> (C*ftpp, E_pad) neighbour traces.

    Lanes factor as (m, G0, G1[, G2]): class slices are contiguous, rolls act
    on the dense supercell grid, and all writes are contiguous lane blocks.
    """
    dim = len(ex.grid)
    NC = int(np.prod(ex.grid))

    rows_src = {}
    rows_own = {}
    for t in range(ex.m):
        for f in range(ex.n_faces):
            rows_src[(t, f)] = np.concatenate(
                [c * d.npp + ex.nodes[t, f] for c in range(C)])
            rows_own[(t, f)] = np.concatenate(
                [c * d.npp + ex.own_nodes[f] for c in range(C)])
    masks = {
        (t, f): jnp.asarray(
            ex.self_mask[t, f].reshape(-1))[None]  # (1, NC)
        for t in range(ex.m) for f in range(ex.n_faces)
    }

    ftp = ex.n_faces * ex.n_fp
    pad_rows = d.ftpp - ftp

    def exchange(f_lm: jax.Array) -> jax.Array:
        # lanes: (m, NC); per-class slices are contiguous
        F = f_lm[:, :E]
        cls_blocks = []  # per class: (C*ftpp, NC)
        for t in range(ex.m):
            face_blocks = []  # each (C, nfp, NC)
            for f in range(ex.n_faces):
                t2 = int(ex.nbr_class[t, f])
                blk = F[:, t2 * NC : (t2 + 1) * NC][rows_src[(t, f)]]
                blk = blk.reshape((len(rows_src[(t, f)]),) + ex.grid)
                for ax in range(dim):
                    s = int(ex.shift[t, f, ax])
                    if s:
                        blk = jnp.roll(blk, -s, axis=1 + ax)
                blk = blk.reshape(len(rows_src[(t, f)]), NC)
                if ex.self_mask[t, f].any():
                    own_blk = F[:, t * NC : (t + 1) * NC][rows_own[(t, f)]]
                    blk = jnp.where(masks[(t, f)], own_blk, blk)
                face_blocks.append(blk.reshape(C, ex.n_fp, NC))
            # faces tile the ftp rows contiguously per component
            cls = jnp.concatenate(face_blocks, axis=1)  # (C, ftp, NC)
            if pad_rows:
                cls = jnp.pad(cls, ((0, 0), (0, pad_rows), (0, 0)))
            cls_blocks.append(cls.reshape(C * d.ftpp, NC))
        out = jnp.concatenate(cls_blocks, axis=1)  # (C*ftpp, E)
        if E_pad != E:
            out = jnp.pad(out, ((0, 0), (0, E_pad - E)))
        return out

    return exchange


@dataclass
class LaneMajorRunner:
    """Build once from concrete data; run entire simulations lane-major."""

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
        block: int = DEFAULT_BLOCK,
        interpret: bool = False,
        stiffness=None,
    ):
        self.record_pressure = record_pressure
        d = build_pallas_data(p)
        self.d = d
        self.p = p
        self.ex = ex
        self.block = block
        self.interpret = interpret
        self.order = order
        E = d.E
        E_pad = _rup(E, block)
        self.E, self.E_pad = E, E_pad
        self.dtype = p.Ginv.dtype
        self.dt = jnp.asarray(dt, self.dtype)

        # element reordering (structured: class-major for contiguous class
        # lane slices; subclasses override, e.g. locality order for
        # unstructured meshes)
        old_of_new, new_of_old = self._element_perm()
        self._old_of_new = old_of_new
        self._new_of_old = new_of_old
        import dataclasses as _dc

        def permute_cols(arr):
            a = np.asarray(arr)
            return jnp.asarray(a[:, old_of_new], a.dtype)

        self.d = d = _dc.replace(
            d,
            ginv=permute_cols(d.ginv),
            nrm=permute_cols(d.nrm),
            fsc=permute_cols(d.fsc),
            beta=permute_cols(d.beta),
            delta=permute_cols(d.delta),
            irho=permute_cols(d.irho),
            lam=permute_cols(d.lam),
            mu=permute_cols(d.mu),
        )

        self.ex_u, self.ex_s = self._make_exchanges()

        # general anisotropic Hooke rows: (n_sig*8, E) lanes, row c*8+k =
        # Voigt C[c, k] (engineering strains, ops/anisotropic.py); rides
        # in aux so every E-sized operand stays a jit argument
        if stiffness is not None:
            n_sig = d.n_sig
            C = np.broadcast_to(
                np.asarray(stiffness, np.float64), (E, n_sig, n_sig))
            cm = np.zeros((n_sig * 8, E), dtype=np.float64)
            for c in range(n_sig):
                cm[c * 8 : c * 8 + n_sig] = C[old_of_new, c, :].T
            self.cmat = jnp.asarray(cm, self.dtype)
        else:
            self.cmat = None

        # tiled damping rows (permuted to new order)
        if damp is not None:
            dn = np.zeros((d.npp, E), dtype=np.float64)
            dn[: d.n_p] = np.asarray(damp)[old_of_new].T
            dn = np.pad(dn, ((0, 0), (0, E_pad - E)))
            self.damp_u = jnp.asarray(np.tile(dn, (d.dim, 1)), self.dtype)
            self.damp_s = jnp.asarray(np.tile(dn, (d.n_sig, 1)), self.dtype)
        else:
            self.damp_u = self.damp_s = None

        # lane-major source vectors (elems remapped to new order)
        if src is not None:
            K = src.elems.shape[0]
            vu = np.zeros((d.dim * d.npp, K), dtype=np.float64)
            vs = np.zeros((d.n_sig * d.npp, K), dtype=np.float64)
            for c in range(d.dim):
                vu[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                    src.vec_u[:, :, c]).T
            for c in range(d.n_sig):
                vs[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                    src.vec_s[:, :, c]).T
            self.src_elems = jnp.asarray(
                new_of_old[np.asarray(src.elems)], jnp.int32)
            self.src_vu = jnp.asarray(vu, self.dtype)
            self.src_vs = jnp.asarray(vs, self.dtype)
            self.src_f0, self.src_t0, self.src_amp = src.f0, src.t0, src.amp
        else:
            self.src_elems = None

        if receivers is not None:
            self.rcv = ReceiverData(
                elems=jnp.asarray(
                    new_of_old[np.asarray(receivers.elems)], jnp.int32),
                weights=receivers.weights,
            )
        else:
            self.rcv = None

    # --- structured-mesh hooks (overridden by UnstructuredLaneRunner) ---
    def _element_perm(self):
        return class_major_perm(self.ex, self.E)

    def _make_exchanges(self):
        d, E, E_pad = self.d, self.E, self.E_pad
        return (make_exchange_lm(self.ex, d, d.dim, E, E_pad),
                make_exchange_lm(self.ex, d, d.n_sig, E, E_pad))

    # --- state conversion (includes the class-major permutation) ---
    def to_lm_state(self, state: State):
        d = self.d
        perm = jnp.asarray(self._old_of_new)
        return (
            to_lm(state.u[perm], d.npp, self.E_pad),
            to_lm(state.s[perm], d.npp, self.E_pad),
        )

    def from_lm_state(self, ulm, slm) -> State:
        d = self.d
        inv = jnp.asarray(self._new_of_old)
        return State(
            u=from_lm(ulm, d.n_p, d.npp, d.dim, self.E)[inv],
            s=from_lm(slm, d.n_p, d.npp, d.n_sig, self.E)[inv],
        )

    # --- step pieces (E-sized arrays passed as jit ARGUMENTS: embedding
    # them as closure constants serializes them into the remote-compile
    # request, which has a hard size limit) ---
    def _vel(self, d, s_lm):
        return vel_op_lm(d, s_lm, self.ex_s(s_lm), self.block,
                         self.interpret)

    def _stress(self, d, u_lm, cmat=None):
        return stress_op_lm(d, u_lm, self.ex_u(u_lm), self.block,
                            self.interpret, cmat=cmat)

    def _inject_u(self, aux, du_lm, t):
        if self.src_elems is None:
            return du_lm
        r = self.src_amp * ricker(t, self.src_f0, self.src_t0)
        return du_lm.at[:, self.src_elems].add(
            aux["src_vu"] * r[None, :].astype(self.dtype))

    def _inject_s(self, aux, ds_lm, t):
        if self.src_elems is None:
            return ds_lm
        r = self.src_amp * ricker(t, self.src_f0, self.src_t0)
        return ds_lm.at[:, self.src_elems].add(
            aux["src_vs"] * r[None, :].astype(self.dtype))

    def step_with(self, d, aux, carry, t):
        def post(u, s):
            if self.damp_u is None:
                return u, s
            return u * aux["damp_u"], s * aux["damp_s"]

        lf = compose_lf_step(
            vel=lambda s_lm: self._vel(d, s_lm),
            stress=lambda u_lm: self._stress(d, u_lm, aux.get("cmat")),
            inject_u=lambda du, t_: self._inject_u(aux, du, t_),
            inject_s=lambda ds, t_: self._inject_s(aux, ds, t_),
            post=post, dt=self.dt, order=self.order,
        )
        return lf(carry[0], carry[1], t)

    def step(self, carry, t):
        return self.step_with(self.d, self._aux(), carry, t)

    def _aux(self):
        aux = {}
        if self.cmat is not None:
            aux["cmat"] = self.cmat
        if self.damp_u is not None:
            aux["damp_u"], aux["damp_s"] = self.damp_u, self.damp_s
        if self.src_elems is not None:
            aux["src_vu"], aux["src_vs"] = self.src_vu, self.src_vs
        if self.rcv is not None:
            aux["rcv_w"] = self.rcv.weights
        return aux

    def _sample(self, aux, u_lm, s_lm=None):
        d = self.d
        g = u_lm[:, self.rcv.elems]  # (dim*npp, R)
        g3 = g.reshape(d.dim, d.npp, -1)[:, : d.n_p]
        rec = jnp.einsum("ri,cir->rc", aux["rcv_w"], g3)
        if self.record_pressure and s_lm is not None:
            gs = s_lm[:, self.rcv.elems].reshape(d.n_sig, d.npp, -1)
            # pressure = -tr(sigma)/dim: first `dim` Voigt components
            pr = -jnp.mean(gs[: d.dim, : d.n_p], axis=0)
            rec_p = jnp.einsum("ri,ir->r", aux["rcv_w"], pr)[:, None]
            rec = jnp.concatenate([rec, rec_p], axis=-1)
        return rec

    def _go(self):
        # One jitted closure per runner instance (cached), so repeated run()
        # calls never re-trace; n_steps is a static argument; all E-sized
        # data flows through arguments (d, aux).
        if not hasattr(self, "_go_fn"):

            @functools.partial(jax.jit, static_argnames=("n",))
            def go(d, aux, ulm, slm, n, k0):
                def body(carry, k):
                    carry = self.step_with(
                        d, aux, carry, k.astype(self.dtype) * self.dt)
                    ys = (
                        self._sample(aux, carry[0], carry[1])
                        if self.rcv is not None
                        else None
                    )
                    return carry, ys

                (ulm, slm), seis = jax.lax.scan(
                    body, (ulm, slm), jnp.arange(n) + k0)
                return ulm, slm, seis

            self._go_fn = go
        return self._go_fn

    def run(self, state0: State, n_steps: int, step0: int = 0):
        """Jitted lane-major scan; returns (final State, seismograms).

        ``step0``: global index of the first step (resume support — keeps
        time-dependent sources in phase; traced, so no retrace per value).
        """
        ulm, slm = self.to_lm_state(state0)
        ulm, slm, seis = self._go()(
            self.d, self._aux(), ulm, slm, n_steps, jnp.asarray(step0))
        return self.from_lm_state(ulm, slm), (
            None if seis is None else np.asarray(seis))

    def run_lm(self, ulm, slm, n_steps: int, step0: int = 0):
        """Same but staying in lane-major layout (no conversions)."""
        return self._go()(
            self.d, self._aux(), ulm, slm, n_steps, jnp.asarray(step0))
