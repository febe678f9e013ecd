"""Classic RK4 time integration for the upwind-flux coupled operator.

Companion to ops/upwind.py: the Godunov flux couples u and sigma traces in
both equations, so the staggered leapfrog of the reference cannot be used;
classic RK4 (4 coupled operator evaluations per step, co-located state in
time) is the standard pairing and keeps 4th-order accuracy with the upwind
flux's dissipation of unresolved modes.  Sources are evaluated at the RK
stage times; receivers/damping/scan structure mirror solver/timestep.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.elastic import ElasticParams
from ..ops.upwind import UpwindData, apply_coupled_upwind
from .receivers import ReceiverData, sample
from .source import SourceData, ricker
from .timestep import State


def _gather(p: ElasticParams, field: jax.Array) -> jax.Array:
    flat = field.reshape((-1,) + field.shape[2:])
    return flat[p.nbr].reshape(field.shape[0], p.n_faces * p.n_fp, -1)


def make_rk4_step(
    p: ElasticParams,
    w: UpwindData,
    dt: float,
    src: SourceData | None = None,
    damp: jax.Array | None = None,
):
    """(State, t) -> State with classic RK4 + upwind fluxes.

    NOTE on State semantics: here sigma is CO-LOCATED with u in time (no
    staggering); initialize both at t = 0.
    """
    dt_ = jnp.asarray(dt, dtype=p.Ginv.dtype)

    def rhs(u, s, t):
        du, ds = apply_coupled_upwind(
            p, w, u, s, _gather(p, u), _gather(p, s))
        if src is not None:
            r = src.amp * ricker(t, src.f0, src.t0)
            du = du.at[src.elems].add(src.vec_u * r[:, None, None])
            ds = ds.at[src.elems].add(src.vec_s * r[:, None, None])
        return du, ds

    def step(state: State, t) -> State:
        u, s = state.u, state.s
        k1u, k1s = rhs(u, s, t)
        k2u, k2s = rhs(u + 0.5 * dt_ * k1u, s + 0.5 * dt_ * k1s,
                       t + 0.5 * dt_)
        k3u, k3s = rhs(u + 0.5 * dt_ * k2u, s + 0.5 * dt_ * k2s,
                       t + 0.5 * dt_)
        k4u, k4s = rhs(u + dt_ * k3u, s + dt_ * k3s, t + dt_)
        u = u + (dt_ / 6.0) * (k1u + 2 * k2u + 2 * k3u + k4u)
        s = s + (dt_ / 6.0) * (k1s + 2 * k2s + 2 * k3s + k4s)
        if damp is not None:
            u = u * damp[:, :, None]
            s = s * damp[:, :, None]
        return State(u=u, s=s)

    return step


def make_rk4_step_visco(
    p: ElasticParams,
    w: UpwindData,
    v,
    dt: float,
    src: SourceData | None = None,
    damp: jax.Array | None = None,
):
    """Viscoelastic RK4 step: carry is (State, xi) with memory variables
    xi (E, n_p, n_sig, L) (ops/viscoelastic.py).  Point sources inject
    into the momentum/stress balance (not the constitutive strain rate),
    so they bypass the anelastic target."""
    from ..ops.viscoelastic import anelastic_rates

    dt_ = jnp.asarray(dt, dtype=p.Ginv.dtype)

    def rhs(u, s, xi, t):
        du, ds_el = apply_coupled_upwind(
            p, w, u, s, _gather(p, u), _gather(p, s))
        dxi, xi_sum = anelastic_rates(v, ds_el, xi, p.dim)
        ds = ds_el - xi_sum
        if src is not None:
            r = src.amp * ricker(t, src.f0, src.t0)
            du = du.at[src.elems].add(src.vec_u * r[:, None, None])
            ds = ds.at[src.elems].add(src.vec_s * r[:, None, None])
        return du, ds, dxi

    def step(state: State, xi, t):
        u, s = state.u, state.s
        k1 = rhs(u, s, xi, t)
        k2 = rhs(u + 0.5 * dt_ * k1[0], s + 0.5 * dt_ * k1[1],
                 xi + 0.5 * dt_ * k1[2], t + 0.5 * dt_)
        k3 = rhs(u + 0.5 * dt_ * k2[0], s + 0.5 * dt_ * k2[1],
                 xi + 0.5 * dt_ * k2[2], t + 0.5 * dt_)
        k4 = rhs(u + dt_ * k3[0], s + dt_ * k3[1], xi + dt_ * k3[2],
                 t + dt_)
        u = u + (dt_ / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        s = s + (dt_ / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        xi = xi + (dt_ / 6.0) * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        if damp is not None:
            u = u * damp[:, :, None]
            s = s * damp[:, :, None]
            xi = xi * damp[:, :, None, None]
        return State(u=u, s=s), xi

    return step


def run_rk4_visco(
    p: ElasticParams,
    w: UpwindData,
    v,
    state0: State,
    dt: float,
    n_steps: int,
    xi0: jax.Array | None = None,
    src: SourceData | None = None,
    damp: jax.Array | None = None,
    receivers: ReceiverData | None = None,
    segment: int | None = None,
):
    """Viscoelastic run; returns (final State, final xi, seismograms).

    ``segment`` (must divide n_steps) rematerializes the scan in
    ``jax.checkpoint``-ed chunks — required for reverse-mode at scale
    because the carry includes the (E, n_p, n_sig, L) memory variables
    (Q-FWI gradients, solver/adjoint.py make_visco_fwi_gradient)."""
    step = make_rk4_step_visco(p, w, v, dt, src=src, damp=damp)
    dt_ = jnp.asarray(dt, dtype=p.Ginv.dtype)
    if xi0 is None:
        E, n_p, n_sig = state0.s.shape
        xi0 = jnp.zeros((E, n_p, n_sig, v.L), dtype=state0.s.dtype)

    def body(carry, n):
        state, xi = carry
        t = n.astype(p.Ginv.dtype) * dt_
        state, xi = step(state, xi, t)
        ys = sample(receivers, state.u) if receivers is not None else None
        return (state, xi), ys

    if not segment or segment >= n_steps:
        (fin, xi), ys = jax.lax.scan(body, (state0, xi0),
                                     jnp.arange(n_steps))
        return fin, xi, ys
    if n_steps % segment:
        raise ValueError(f"segment {segment} must divide n_steps {n_steps}")

    @jax.checkpoint
    def chunk(carry, n0):
        return jax.lax.scan(body, carry, n0 + jnp.arange(segment))

    (fin, xi), ys = jax.lax.scan(chunk, (state0, xi0),
                                 segment * jnp.arange(n_steps // segment))
    if ys is not None:
        ys = ys.reshape((n_steps,) + ys.shape[2:])
    return fin, xi, ys


def run_rk4(
    p: ElasticParams,
    w: UpwindData,
    state0: State,
    dt: float,
    n_steps: int,
    src: SourceData | None = None,
    damp: jax.Array | None = None,
    receivers: ReceiverData | None = None,
):
    """Run n_steps of RK4+upwind; returns (final State, seismograms)."""
    step = make_rk4_step(p, w, dt, src=src, damp=damp)
    dt_ = jnp.asarray(dt, dtype=p.Ginv.dtype)

    def body(state, n):
        t = n.astype(p.Ginv.dtype) * dt_
        state = step(state, t)
        ys = sample(receivers, state.u) if receivers is not None else None
        return state, ys

    return jax.lax.scan(body, state0, jnp.arange(n_steps))
