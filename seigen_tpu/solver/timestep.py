"""Explicit staggered leapfrog time stepping (LF2 / LF4) as one jitted scan.

Rebuild of ElasticLF4's 8-solve timestep (SURVEY.md §4.3).  The whole step —
6 operator applications (LF4), source injection, sponge damping, receiver
sampling — is a single function scanned over steps with ``lax.scan``; XLA
fuses across the stage boundaries (the role the SLOPE C++ tiling library
plays in the reference, SURVEY.md §3.1 item 2).

Staggering: u lives at integer steps t = n dt, sigma at half steps
t = (n + 1/2) dt.  Each update evaluates the counterpart field at its
midpoint; the O(dt^3) modified-equation correction makes LF4 4th order:

  uh1   = Au(s)                    # s at t+dt/2
  stemp = As(uh1); uh2 = Au(stemp)
  u'    = u + dt*uh1 + dt^3/24 * uh2
  sh1   = As(u') [+ stress source at t+dt]
  utemp = Au(sh1); sh2 = As(utemp)
  s'    = s + dt*sh1 + dt^3/24 * sh2
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.elastic import ElasticParams, apply_stress_op, apply_vel_op
from .receivers import ReceiverData, sample
from .source import SourceData, inject_stress, inject_velocity


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["u", "s"],
    meta_fields=[],
)
@dataclass(frozen=True)
class State:
    u: jax.Array  # (E, n_p, dim) velocity at t = n dt
    s: jax.Array  # (E, n_p, n_sig) stress at t = (n + 1/2) dt


def make_step(
    p: ElasticParams,
    dt: float,
    order: int = 4,
    src: SourceData | None = None,
    damp: jax.Array | None = None,
    vel_op=apply_vel_op,
    stress_op=apply_stress_op,
):
    """Build the single-timestep function (State, t) -> State."""
    if order not in (2, 4):
        raise ValueError("order must be 2 or 4 (reference parity: LF2/LF4)")
    dt = jnp.asarray(dt, dtype=p.Ginv.dtype)
    c3 = dt**3 / 24.0

    def step(state: State, t) -> State:
        u, s = state.u, state.s
        # --- velocity update: t -> t + dt, using s at t + dt/2 ---
        uh1 = vel_op(p, s)
        uh1 = inject_velocity(src, uh1, t + 0.5 * dt)
        if order == 4:
            uh2 = vel_op(p, stress_op(p, uh1))
            u = u + dt * uh1 + c3 * uh2
        else:
            u = u + dt * uh1
        # --- stress update: t + dt/2 -> t + 3 dt/2, using u at t + dt ---
        sh1 = stress_op(p, u)
        sh1 = inject_stress(src, sh1, t + dt)
        if order == 4:
            sh2 = stress_op(p, vel_op(p, sh1))
            s = s + dt * sh1 + c3 * sh2
        else:
            s = s + dt * sh1
        if damp is not None:
            u = u * damp[:, :, None]
            s = s * damp[:, :, None]
        return State(u=u, s=s)

    return step


def staggered_init(
    p: ElasticParams,
    u0: jax.Array,
    s0: jax.Array,
    dt: float,
    order: int = 4,
    vel_op=apply_vel_op,
    stress_op=apply_stress_op,
) -> State:
    """Build a staggered State from co-located (u, sigma) at t = 0.

    The leapfrog scheme stores sigma at t = dt/2; advancing it there with a
    discrete Taylor series (s' = As u, s'' = As Au s, s''' = As Au As u keeps
    the initialization error at the scheme's own order and — because it uses
    the discrete operators — makes runs with different dt share exactly the
    same t=0 data (pure-temporal-error comparisons, general non-analytic ICs).
    """
    dt = jnp.asarray(dt, dtype=p.Ginv.dtype)
    h = 0.5 * dt
    s1 = stress_op(p, u0)
    s = s0 + h * s1
    if order == 4:
        s2 = stress_op(p, vel_op(p, s0))
        s3 = stress_op(p, vel_op(p, stress_op(p, u0)))
        s = s + (h**2 / 2.0) * s2 + (h**3 / 6.0) * s3
    return State(u=u0, s=s)


def run(
    p: ElasticParams,
    state0: State,
    dt: float,
    n_steps: int,
    order: int = 4,
    src: SourceData | None = None,
    damp: jax.Array | None = None,
    receivers: ReceiverData | None = None,
    record_pressure: bool = False,
    vel_op=apply_vel_op,
    stress_op=apply_stress_op,
):
    """Run n_steps; returns (final State, seismograms or None).

    Seismograms: (n_steps, R, dim [+1]) velocity samples (plus pressure
    -tr(sigma)/dim if requested), sampled after each full step.
    """
    step = make_step(
        p, dt, order=order, src=src, damp=damp, vel_op=vel_op,
        stress_op=stress_op,
    )
    dt_ = jnp.asarray(dt, dtype=p.Ginv.dtype)

    def body(state, n):
        t = n.astype(p.Ginv.dtype) * dt_
        state = step(state, t)
        ys = None
        if receivers is not None:
            rec_u = sample(receivers, state.u)
            if record_pressure:
                pr = -jnp.mean(state.s[..., : p.dim], axis=-1, keepdims=True)
                rec_p = sample(receivers, pr)
                ys = jnp.concatenate([rec_u, rec_p], axis=-1)
            else:
                ys = rec_u
        return state, ys

    final, seis = jax.lax.scan(body, state0, jnp.arange(n_steps))
    return final, seis


@functools.partial(jax.jit, static_argnames=("n_steps", "order",
                                             "record_pressure"))
def run_jit(p, state0, dt, n_steps, order=4, src=None, damp=None,
            receivers=None, record_pressure=False):
    return run(
        p, state0, dt, n_steps, order=order, src=src, damp=damp,
        receivers=receivers, record_pressure=record_pressure,
    )


def cfl_dt(h_min: float, vp_max: float, degree: int, cfl: float = 0.5) -> float:
    """Stability-bound timestep dt = cfl * h_min / (vp_max * (2q + 1)).

    The reference's exact constant is unrecoverable (SURVEY.md §9.3); the
    bound was derived empirically by bisection (results/cfl_study.json):
    in this normalization LF2 is stable to cfl ~0.75-0.85 and LF4 to
    ~2.0-2.6 across P1-P4 in 2D/3D.  The default cfl=0.4 used by the tests
    and CLIs keeps a ~2x (LF2) / ~5x (LF4) margin; production LF4 runs can
    safely use cfl ~1.0-1.5 for fewer steps.
    """
    return cfl * h_min / (vp_max * (2 * degree + 1))
