"""SPMD sharded execution: shard_map step with ppermute halo exchange.

Rebuild of the reference's MPI runtime layer (SURVEY.md §7.8): PyOP2 halo
exchange + redundant-compute becomes XLA collectives over ICI — one
``lax.ppermute`` per halo round before each operator application (3 per field
per LF4 step, SURVEY.md §9.3), ``psum`` for receiver reduction.  No host
communication anywhere in the data path.

The device mesh is one axis ("x") of n_devices chips; element blocks are the
shards.  All arrays with a leading element axis are sharded on it; reference
tables are replicated.
"""

from __future__ import annotations

import functools
from dataclasses import replace as dc_replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.elastic import (
    ElasticParams,
    Material,
    apply_stress_op,
    apply_vel_op,
    build_params,
)
from ..solver.receivers import ReceiverData
from ..solver.source import SourceData, ricker
from ..solver.timestep import State, compose_lf_step, damp_post
from .partition import Plan, make_plan

AXIS = "x"


def _permute_pad(arr: np.ndarray, plan: Plan, pad_value=0.0) -> np.ndarray:
    """Apply element permutation and append padding rows."""
    out = arr[plan.perm]
    if plan.E_pad > plan.E:
        pad = np.full((plan.E_pad - plan.E,) + arr.shape[1:], pad_value,
                      dtype=arr.dtype)
        out = np.concatenate([out, pad], axis=0)
    return out


def shard_params(
    dense: ElasticParams, plan: Plan, dtype=None
) -> ElasticParams:
    """Permute + pad the element arrays of a dense ElasticParams; swap nbr
    for the halo-remapped local index array."""
    dtype = dtype or dense.Ginv.dtype

    def pp(x, pad=0.0):
        return jnp.asarray(_permute_pad(np.asarray(x), plan, pad), dtype=dtype)

    return dc_replace(
        dense,
        Ginv=pp(dense.Ginv),
        Fscale=pp(dense.Fscale),
        normals=pp(dense.normals),
        inv_rho=pp(dense.inv_rho),
        lam=pp(dense.lam),
        mu=pp(dense.mu),
        beta_t=pp(dense.beta_t),
        delta_u=pp(dense.delta_u),
        nbr=jnp.asarray(plan.nbr_local, dtype=jnp.int32),
    )


def shard_state(state: State, plan: Plan) -> State:
    u = _permute_pad(np.asarray(state.u), plan)
    s = _permute_pad(np.asarray(state.s), plan)
    return State(u=jnp.asarray(u, state.u.dtype), s=jnp.asarray(s, state.s.dtype))


def unshard_field(arr, plan: Plan) -> np.ndarray:
    """Undo permutation+padding: (E_pad, ...) device array -> (E, ...) host."""
    a = np.asarray(arr)[: plan.E]
    out = np.empty_like(a)
    out[plan.perm] = a
    return out


def shard_sources(src: SourceData | None, plan: Plan) -> SourceData | None:
    """Per-shard padded source arrays, stacked on a leading (P,) axis."""
    if src is None:
        return None
    P_ = plan.n_shards
    inv = np.full(plan.E, -1, dtype=np.int64)
    inv[plan.perm] = np.arange(plan.E)
    new_e = inv[np.asarray(src.elems)]
    shard = new_e // plan.block
    local = new_e % plan.block
    counts = np.bincount(shard, minlength=P_)
    S_max = max(int(counts.max()), 1)

    def pack(vec):
        vec = np.asarray(vec)
        out = np.zeros((P_, S_max) + vec.shape[1:], dtype=vec.dtype)
        fill = np.zeros(P_, dtype=np.int64)
        for k in range(len(new_e)):
            p_ = shard[k]
            out[p_, fill[p_]] = vec[k]
            fill[p_] += 1
        return out

    elems = np.zeros((P_, S_max), dtype=np.int32)
    fill = np.zeros(P_, dtype=np.int64)
    for k in range(len(new_e)):
        p_ = shard[k]
        elems[p_, fill[p_]] = local[k]
        fill[p_] += 1

    return SourceData(
        elems=jnp.asarray(elems),
        vec_u=jnp.asarray(pack(src.vec_u)),
        vec_s=jnp.asarray(pack(src.vec_s)),
        f0=jnp.asarray(pack(np.asarray(src.f0)[:, None])[..., 0]),
        t0=jnp.asarray(pack(np.asarray(src.t0)[:, None])[..., 0]),
        amp=jnp.asarray(pack(np.asarray(src.amp)[:, None])[..., 0]),
    )


def shard_receivers(rcv: ReceiverData | None, plan: Plan):
    """(P, R) local element ids + (P, R, n_p) weights, zeroed off-shard."""
    if rcv is None:
        return None
    P_ = plan.n_shards
    inv = np.full(plan.E, -1, dtype=np.int64)
    inv[plan.perm] = np.arange(plan.E)
    new_e = inv[np.asarray(rcv.elems)]
    shard = new_e // plan.block
    local = new_e % plan.block
    R = len(new_e)
    elems = np.zeros((P_, R), dtype=np.int32)
    w = np.zeros((P_, R) + np.asarray(rcv.weights).shape[1:],
                 dtype=np.asarray(rcv.weights).dtype)
    for r in range(R):
        elems[shard[r], r] = local[r]
        w[shard[r], r] = np.asarray(rcv.weights)[r]
    return ReceiverData(elems=jnp.asarray(elems), weights=jnp.asarray(w))


def _halo_pool(flat, send_idx, plan: Plan):
    """[local flat nodes | ghosts] for one field; K ppermute rounds."""
    if plan.n_rounds == 0:
        return flat
    ghosts = []
    for k in range(plan.n_rounds):
        buf = flat[send_idx[k]]  # (H, C)
        recv = jax.lax.ppermute(buf, AXIS, perm=list(plan.round_perms[k]))
        ghosts.append(recv)
    return jnp.concatenate([flat] + ghosts, axis=0)


def make_sharded_run(
    plan: Plan,
    params: ElasticParams,
    dt: float,
    n_steps: int,
    order: int = 4,
    src: SourceData | None = None,
    damp: jax.Array | None = None,
    receivers: ReceiverData | None = None,
    devices=None,
    step0: int = 0,
):
    """Build (mesh, jitted_run) where jitted_run(params, state, send_idx,
    ...) -> (final_state, seismograms).

    All arguments with a leading element axis must already be shard-layout
    (see shard_params/shard_state); the function places them via
    NamedSharding and runs the whole scan inside one shard_map.

    ``step0``: global index of the first step — resumed runs must continue
    physical time at step0*dt so time-dependent sources stay in phase.
    """
    devices = devices if devices is not None else jax.devices()[: plan.n_shards]
    assert len(devices) == plan.n_shards
    mesh = Mesh(np.array(devices), (AXIS,))
    dtype = params.Ginv.dtype
    dt_ = jnp.asarray(dt, dtype=dtype)

    send_idx = jnp.asarray(plan.send_idx)  # (P, K, H)

    def sharded_body(p, st, send_idx_l, src_l, damp_l, rcv_l):
        n_sig = p.n_sig

        def vel(s_field):
            pool = _halo_pool(s_field.reshape(-1, n_sig), send_idx_l, plan)
            return apply_vel_op(p, s_field, pool=pool)

        def stress(u_field):
            pool = _halo_pool(u_field.reshape(-1, p.dim), send_idx_l, plan)
            return apply_stress_op(p, u_field, pool=pool)

        def inject(vecs):
            if src_l is None:
                return lambda f, t: f
            return lambda f, t: f.at[src_l.elems].add(
                vecs * (src_l.amp * ricker(t, src_l.f0, src_l.t0))
                [:, None, None])

        step = compose_lf_step(
            vel=vel, stress=stress,
            inject_u=inject(None if src_l is None else src_l.vec_u),
            inject_s=inject(None if src_l is None else src_l.vec_s),
            post=damp_post(damp_l), dt=dt_, order=order,
        )

        def body(state, n):
            t = (n + step0).astype(dtype) * dt_
            u, s = step(state.u, state.s, t)
            state = State(u=u, s=s)
            if rcv_l is not None:
                vals = state.u[rcv_l.elems]  # (R, n_p, dim)
                partial = jnp.einsum("ri,ric->rc", rcv_l.weights, vals)
                ys = jax.lax.psum(partial, AXIS)
            else:
                ys = None
            return state, ys

        final, seis = jax.lax.scan(body, st, jnp.arange(n_steps))
        return final, seis

    # partition specs
    def param_specs(p):
        elem = P(AXIS)
        rep = P()
        return dc_replace(
            p,
            Dr=rep, LIFT=rep,
            Ginv=elem, Fscale=elem, normals=elem, nbr=elem,
            inv_rho=elem, lam=elem, mu=elem, beta_t=elem, delta_u=elem,
        )

    p_specs = param_specs(params)
    st_specs = State(u=P(AXIS), s=P(AXIS))
    send_specs = P(AXIS)
    src_specs = (
        None
        if src is None
        else SourceData(
            elems=P(AXIS), vec_u=P(AXIS), vec_s=P(AXIS),
            f0=P(AXIS), t0=P(AXIS), amp=P(AXIS),
        )
    )
    damp_specs = None if damp is None else P(AXIS)
    rcv_specs = (
        None
        if receivers is None
        else ReceiverData(elems=P(AXIS), weights=P(AXIS))
    )

    def run_fn(p, st, send, src_a, damp_a, rcv_a):
        def inner(p, st, send, src_a, damp_a, rcv_a):
            # leading (1,)-sized shard axes on stacked per-shard arrays
            send_l = send[0]
            src_l = (
                None
                if src_a is None
                else jax.tree.map(lambda a: a[0], src_a)
            )
            damp_l = damp_a
            rcv_l = (
                None
                if rcv_a is None
                else jax.tree.map(lambda a: a[0], rcv_a)
            )
            return sharded_body(p, st, send_l, src_l, damp_l, rcv_l)

        return jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(p_specs, st_specs, send_specs, src_specs, damp_specs,
                      rcv_specs),
            out_specs=(st_specs, None if receivers is None else P()),
            check_vma=False,
        )(p, st, send, src_a, damp_a, rcv_a)

    jitted = jax.jit(run_fn)

    def call(state):
        return jitted(params, state, send_idx, src, damp, receivers)

    return mesh, call


def run_distributed(
    dm,
    mat: Material,
    state0: State,
    dt: float,
    n_steps: int,
    n_devices: int | None = None,
    order: int = 4,
    sources: SourceData | None = None,
    damp=None,
    receivers: ReceiverData | None = None,
    dtype=jnp.float32,
    devices=None,
    step0: int = 0,
):
    """High-level entry: partition, shard, run; returns (final dense-layout
    State on host, seismograms, plan).  ``step0``: first global step index
    (resume support — keeps time-dependent sources in phase)."""
    devices = devices if devices is not None else jax.devices()
    P_ = n_devices or len(devices)
    plan = make_plan(dm, P_)
    dense = build_params(dm, mat, dtype=dtype)
    sp = shard_params(dense, plan)
    st = shard_state(state0, plan)
    src_s = shard_sources(sources, plan)
    rcv_s = shard_receivers(receivers, plan)
    damp_s = (
        None
        if damp is None
        else jnp.asarray(_permute_pad(np.asarray(damp), plan, 1.0),
                         dtype=dtype)
    )
    mesh, call = make_sharded_run(
        plan, sp, dt, n_steps, order=order, src=src_s, damp=damp_s,
        receivers=rcv_s, devices=devices[:P_], step0=step0,
    )
    fin, seis = call(st)
    fin_host = State(
        u=jnp.asarray(unshard_field(fin.u, plan)),
        s=jnp.asarray(unshard_field(fin.s, plan)),
    )
    return fin_host, (None if seis is None else np.asarray(seis)), plan
