"""C-PML absorbing layers: profiles + RK4 method-of-lines stepper.

Beyond-parity vs the reference, which absorbed only through first-order
characteristic BCs (SURVEY.md §4.4) — those reflect at oblique incidence
(R ~ O(theta^2)); a graded C-PML absorbs broadband at all angles.  This
framework ships all three treatments: characteristic faces + Cerjan
sponge (solver/damping.py, on every fast engine) and C-PML here.

Formulation (unsplit convolutional PML, kappa = 1): per PML-active
direction d, memory fields augment each DG spatial derivative,

    udot   = (1/rho) sum_d (V_d(sigma) + psi_v[d])
    psidot_v[d] = -(d_d + alpha_d) psi_v[d] - d_d V_d(sigma)
    sdot   = C : gtilde,   gtilde[d, c] = G_d(u)[c] + psi_s[d][c]
    psidot_s[d] = -(d_d + alpha_d) psi_s[d] - d_d G_d(u)

with the EXACT direction-split DG operators V_d / G_d from ops/cpml.py
(in the interior d_d = 0 so psi stays identically zero and the RHS
reduces bit-for-bit to the plain central-flux operators).  The memory
ODEs are plain additions to the state vector, so a classical RK4 over
one jitted lax.scan integrates everything together — same
method-of-lines pattern as the viscoelastic memory variables
(solver/rk4.py).  The staggered LF4 scheme is NOT used here: its cubic
correction stages have no consistent place for the convolution update
(the standard choice in leapfrog FD codes too is a separate scheme
inside the layer).

Profiles (Komatitsch & Martin 2007): polynomial grading
d(x) = d0 (xi)^p_exp with d0 = -(p_exp+1) vp ln(R0) / (2 W), and
alpha(x) = pi f0 (1 - xi) from pi*f0 at the interface to 0 at the outer
boundary (shifts the pole off DC, stabilizing grazing incidence).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.discrete import DiscreteMesh
from ..ops.cpml import apply_grad_op_split, apply_vel_op_split, hooke_pointwise
from ..ops.elastic import ElasticParams
from .receivers import ReceiverData, sample
from .source import SourceData, inject_stress, inject_velocity


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["u", "s", "pv", "ps"],
    meta_fields=[],
)
@dataclass(frozen=True)
class CpmlState:
    """Wavefield + per-direction CPML memory fields."""

    u: jax.Array  # (E, n_p, dim)
    s: jax.Array  # (E, n_p, n_sig)
    pv: jax.Array  # (E, dim, n_p, dim)  memory for V_d(sigma)
    ps: jax.Array  # (E, dim, n_p, dim)  memory for G_d(u)


def cpml_init(p: ElasticParams, u0, s0) -> CpmlState:
    """Zero-memory CPML state from co-located (u, sigma) at t=0."""
    E = u0.shape[0]
    z = jnp.zeros((E, p.dim, p.n_p, p.dim), dtype=u0.dtype)
    return CpmlState(u=jnp.asarray(u0), s=jnp.asarray(s0), pv=z, ps=z)


def cpml_profiles(
    dm: DiscreteMesh,
    sides: list[tuple[int, str]],
    width: float,
    vp_max: float,
    f0: float = 2.0,
    R0: float = 1e-4,
    p_exp: float = 2.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-node damping/shift profiles (d, alpha), each (E, n_p, dim).

    sides: (axis, "lo"|"hi") pairs naming domain sides backed by a PML of
    the given physical width (measured inward from the domain extent).
    Directions never named get d = alpha = 0 everywhere (no memory decay
    forcing — psi stays exactly 0 there).
    """
    coords = dm.coords  # (E, n_p, dim)
    d = np.zeros(coords.shape, dtype=np.float64)
    a = np.zeros(coords.shape, dtype=np.float64)
    d0 = -(p_exp + 1.0) * vp_max * np.log(R0) / (2.0 * width)
    for ax, side in sides:
        lo, hi = dm.topology.extents[ax]
        x = coords[..., ax]
        if side == "lo":
            xi = np.clip((lo + width - x) / width, 0.0, 1.0)
        else:
            xi = np.clip((x - (hi - width)) / width, 0.0, 1.0)
        d[..., ax] = np.maximum(d[..., ax], d0 * xi**p_exp)
        a[..., ax] = np.maximum(a[..., ax], np.pi * f0 * (1.0 - xi) * (xi > 0))
    return d, a


def make_cpml_rhs(
    p: ElasticParams,
    dprof: np.ndarray,
    aprof: np.ndarray,
    src: SourceData | None = None,
):
    """RHS closure (t, CpmlState) -> CpmlState of rates."""
    dtype = p.Ginv.dtype
    # (E, dim, n_p, 1) broadcast layout against the (E, dim, n_p, dim) psi
    dd = jnp.asarray(np.transpose(dprof, (0, 2, 1))[..., None], dtype)
    decay = dd + jnp.asarray(np.transpose(aprof, (0, 2, 1))[..., None], dtype)

    def rhs(t, st: CpmlState) -> CpmlState:
        Vd = apply_vel_op_split(p, st.s)  # (E, dim, n_p, dim)
        Gd = apply_grad_op_split(p, st.u)
        udot = p.inv_rho[:, None, None] * jnp.sum(Vd + st.pv, axis=1)
        sdot = hooke_pointwise(p, Gd + st.ps)
        udot = inject_velocity(src, udot, t)
        sdot = inject_stress(src, sdot, t)
        return CpmlState(
            u=udot,
            s=sdot,
            pv=-decay * st.pv - dd * Vd,
            ps=-decay * st.ps - dd * Gd,
        )

    return rhs


def run_cpml(
    p: ElasticParams,
    state0: CpmlState,
    dt: float,
    n_steps: int,
    rhs,
    receivers: ReceiverData | None = None,
    step0: int = 0,
):
    """Classical RK4 over one jitted lax.scan; returns (final, seis|None)."""
    dt_ = jnp.asarray(dt, dtype=p.Ginv.dtype)

    ax = lambda st, k, c: jax.tree_util.tree_map(
        lambda x, y: x + c * y, st, k
    )

    def body(st, n):
        t = n.astype(p.Ginv.dtype) * dt_
        k1 = rhs(t, st)
        k2 = rhs(t + 0.5 * dt_, ax(st, k1, 0.5 * dt_))
        k3 = rhs(t + 0.5 * dt_, ax(st, k2, 0.5 * dt_))
        k4 = rhs(t + dt_, ax(st, k3, dt_))
        st = jax.tree_util.tree_map(
            lambda x, a, b, c, d: x + (dt_ / 6.0) * (a + 2 * b + 2 * c + d),
            st, k1, k2, k3, k4,
        )
        ys = sample(receivers, st.u) if receivers is not None else None
        return st, ys

    return jax.lax.scan(body, state0, jnp.arange(n_steps) + step0)
