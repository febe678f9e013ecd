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
