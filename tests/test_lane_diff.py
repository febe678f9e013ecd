"""Differentiable lane path (solver/lane_diff.py): transpose exactness of
the energy-conjugation custom VJPs and end-to-end FWI-gradient equivalence
against plain AD through the einsum step (interpret mode, f64)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seigen_tpu.mesh import box_mesh, build_discrete, rect_mesh
from seigen_tpu.ops import Material, build_params
from seigen_tpu.ops.structured_exchange import detect_structured
from seigen_tpu.solver import (
    PointSource,
    State,
    absorbing_bc_fn,
    build_receivers,
    build_sources,
    cfl_dt,
    line,
    sponge_mask,
)
from seigen_tpu.solver.adjoint import make_fwi_gradient
from seigen_tpu.solver.lane_diff import LaneDiffFwi
from seigen_tpu.solver.shots import stack_shots


def _setup_2d(n=4, degree=2, het=True, seed=0):
    rng = np.random.default_rng(seed)
    extents = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(
        rect_mesh(n, n), degree,
        bc_fn=absorbing_bc_fn(extents, free_sides=[(1, "hi")]))
    E = dm.num_elements
    if het:
        rho = 1.0 + rng.random(E)
        vp = 2.0 + rng.random(E)
        vs = 0.8 + 0.4 * rng.random(E)
    else:
        rho, vp, vs = np.full(E, 1.2), np.full(E, 2.0), np.full(E, 1.0)
    p = build_params(dm, Material(rho=rho, vp=vp, vs=vs),
                     dtype=jnp.float64)
    ex = detect_structured(dm)
    assert ex is not None
    return dm, p, ex


def test_custom_vjp_transpose_exact_2d():
    """<ubar, A sig> == <A^T ubar, sig> (and B) through jax.vjp on the
    custom ops — the exactness reverse-mode relies on, mixed BCs."""
    rng = np.random.default_rng(3)
    dm, p, ex = _setup_2d()
    ldf = LaneDiffFwi(p, dm, ex, 1e-3, 2,
                      stack_shots([_point_src(dm)]), _rcv(dm), None,
                      block=8, interpret=True)
    r = ldf.runner
    d = r.d
    E, E_pad, npp, n_p = r.E, r.E_pad, d.npp, d.n_p

    def zpad(x, C):
        xr = x.reshape(C, npp, E_pad).copy()
        xr[:, n_p:, :] = 0
        xr[:, :, E:] = 0
        return jnp.asarray(xr.reshape(C * npp, E_pad))

    sig = zpad(rng.random((3 * npp, E_pad)), 3)
    u = zpad(rng.random((2 * npp, E_pad)), 2)
    ubar = zpad(rng.random((2 * npp, E_pad)), 2)
    ebar = zpad(rng.random((3 * npp, E_pad)), 3)

    out, vjp = jax.vjp(lambda s: ldf.A(d, ldf.w, s), sig)
    lhs = jnp.vdot(ubar, out)
    rhs = jnp.vdot(vjp(ubar)[0], sig)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-11)

    out, vjp = jax.vjp(lambda uu: ldf.B(d, ldf.w, uu), u)
    lhs = jnp.vdot(ebar, out)
    rhs = jnp.vdot(vjp(ebar)[0], u)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-11)


def _point_src(dm, pos=None, f0=10.0, t0=0.04):
    dim = dm.dim
    if pos is None:
        pos = (0.45, 0.6) if dim == 2 else (0.45, 0.5, 0.6)
    return build_sources(
        dm, [PointSource(position=pos, f0=f0, t0=t0, amplitude=100.0,
                         radius=2.5 * float(dm.h.max()))],
        dtype=jnp.float64)


def _rcv(dm, R=3):
    if dm.dim == 2:
        pts = line((0.2, 0.85), (0.8, 0.85), R)
    else:
        pts = line((0.2, 0.5, 0.85), (0.8, 0.5, 0.85), R)
    return build_receivers(dm, pts, dtype=jnp.float64)


@pytest.mark.parametrize("order", [2, 4])
def test_fwi_gradient_matches_einsum_ad(order):
    """Full lane-path value_and_grad == plain reverse-mode AD through the
    einsum step: heterogeneous material, source, receivers, damping."""
    dm, p0, ex = _setup_2d(het=True, seed=1)
    E, n_p = dm.num_elements, dm.re.n_p
    dt = cfl_dt(float(dm.h.min()), 3.0, 2, 0.3)
    n_steps = 12
    src = _point_src(dm)
    rcv = _rcv(dm)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")], width=0.25),
        jnp.float64)

    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                      None, order=order, damp=damp, block=8,
                      interpret=True)
    # observed from a perturbed model so residuals correlate with the field
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.07)})
    ldf.observed = observed

    st0 = State(u=jnp.zeros((E, n_p, 2), jnp.float64),
                s=jnp.zeros((E, n_p, 3), jnp.float64))
    vg_ref, init_theta = make_fwi_gradient(
        p0, st0, dt, n_steps, src, rcv, jnp.asarray(observed[0]),
        fields=("vp", "vs", "rho"), order=order, damp=damp)
    theta = init_theta()
    v_ref, g_ref = vg_ref(theta)

    v_lane, g_lane = ldf.vg_factory(None)(theta)
    assert v_ref > 1e-10  # non-degenerate misfit
    # the two paths re-associate fp arithmetic; the residual (seis - obs)
    # amplifies the ~1e-13 field-level difference relatively
    np.testing.assert_allclose(float(v_ref), v_lane, rtol=1e-6)
    for k in ("vp", "vs", "rho"):
        scale = np.abs(np.asarray(g_ref[k])).max()
        assert scale > 0
        np.testing.assert_allclose(
            np.asarray(g_lane[k]), np.asarray(g_ref[k]),
            rtol=1e-5, atol=1e-8 * scale, err_msg=k)


def test_segment_checkpointing_invariant():
    """Checkpointed segments change memory, not the gradient."""
    dm, p0, ex = _setup_2d(het=False, seed=2)
    dt = cfl_dt(float(dm.h.min()), 2.5, 2, 0.3)
    n_steps = 12
    src, rcv = _point_src(dm), _rcv(dm)
    theta = None
    grads = []
    for seg in (None, 3):
        ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]),
                          rcv, None, segment=seg, block=8, interpret=True)
        vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
        ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.05)})
        if theta is None:
            theta = {"vp": jnp.asarray(vp0)}
        grads.append(ldf.vg_factory(None)(theta))
    np.testing.assert_allclose(grads[0][0], grads[1][0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grads[0][1]["vp"]),
                               np.asarray(grads[1][1]["vp"]), rtol=1e-9)


def test_fwi_gradient_3d():
    """3D: lane-path gradient == einsum AD (tiny box, P1)."""
    dm = build_discrete(
        box_mesh(2, 2, 2), 1,
        bc_fn=absorbing_bc_fn(((0.0, 1.0),) * 3, free_sides=[(2, "hi")]))
    E, n_p = dm.num_elements, dm.re.n_p
    rng = np.random.default_rng(4)
    rho = 1.0 + rng.random(E)
    vp = 2.0 + rng.random(E)
    vs = 0.8 + 0.4 * rng.random(E)
    p0 = build_params(dm, Material(rho=rho, vp=vp, vs=vs),
                      dtype=jnp.float64)
    ex = detect_structured(dm)
    assert ex is not None
    dt = cfl_dt(float(dm.h.min()), 3.0, 1, 0.3)
    n_steps = 8
    src, rcv = _point_src(dm, f0=6.0, t0=0.1), _rcv(dm)

    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                      None, block=8, interpret=True)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.07)})

    st0 = State(u=jnp.zeros((E, n_p, 3), jnp.float64),
                s=jnp.zeros((E, n_p, 6), jnp.float64))
    vg_ref, init_theta = make_fwi_gradient(
        p0, st0, dt, n_steps, src, rcv, jnp.asarray(ldf.observed[0]),
        fields=("vp",), order=4)
    theta = init_theta()
    v_ref, g_ref = vg_ref(theta)
    v_lane, g_lane = ldf.vg_factory(None)(theta)
    np.testing.assert_allclose(float(v_ref), v_lane, rtol=1e-6)
    scale = np.abs(np.asarray(g_ref["vp"])).max()
    assert scale > 0
    np.testing.assert_allclose(
        np.asarray(g_lane["vp"]), np.asarray(g_ref["vp"]),
        rtol=1e-5, atol=1e-8 * scale)


def test_invert_with_lane_vg_reduces_misfit():
    """solver.fwi.invert plugged with the lane vg_factory descends."""
    from seigen_tpu.solver.fwi import invert

    dm, p0, ex = _setup_2d(het=False, seed=5)
    E, n_p = dm.num_elements, dm.re.n_p
    dt = cfl_dt(float(dm.h.min()), 2.5, 2, 0.3)
    n_steps = 16
    src, rcv = _point_src(dm), _rcv(dm, R=4)
    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                      None, block=8, interpret=True)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    cent = np.asarray(dm.coords.mean(axis=1))
    anom = -0.25 * np.exp(
        -np.sum((cent - 0.5) ** 2, axis=1) / (2 * 0.2**2))
    ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 + anom)})

    st0 = State(u=jnp.zeros((E, n_p, 2), jnp.float64),
                s=jnp.zeros((E, n_p, 3), jnp.float64))
    res = invert(
        p0, st0, dt, n_steps, stack_shots([src]), rcv,
        jnp.asarray(ldf.observed), fields=("vp",), optimizer="adam",
        lr=0.02, iters=6, smooth_iters=1, vg_factory=ldf.vg_factory)
    assert res.misfits[-1] < res.misfits[0]


@pytest.mark.parametrize("engine", ["lane", "merged"])
def test_vg_sharded_matches_host(engine):
    """Shot-DP gradient over an 8-device mesh == host-accumulated vg."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    dm, p0, ex = _setup_2d(het=False, seed=7)
    dt = cfl_dt(float(dm.h.min()), 2.5, 2, 0.3)
    n_steps = 8
    srcs = [_point_src(dm, pos=(0.15 + 0.1 * k, 0.6)) for k in range(8)]
    rcv = _rcv(dm)
    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots(srcs), rcv,
                      None, block=8, interpret=True, engine=engine)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.05)})
    theta = {"vp": jnp.asarray(vp0)}

    v_host, g_host = ldf.vg_factory(None)(theta)
    mesh = Mesh(np.array(jax.devices()[:8]), ("shot",))
    v_sh, g_sh = ldf.vg_factory_sharded(mesh)(None)(theta)
    np.testing.assert_allclose(v_sh, v_host, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_sh["vp"]),
                               np.asarray(g_host["vp"]), rtol=1e-8)


def test_taps_gradient_finite_difference():
    """Low-passed misfit gradient (frequency-continuation path) checked
    against a central finite difference of the same lane loss."""
    from seigen_tpu.solver.fwi import lowpass, lowpass_taps

    dm, p0, ex = _setup_2d(het=False, seed=9)
    dt = cfl_dt(float(dm.h.min()), 2.5, 2, 0.3)
    n_steps = 12
    src, rcv = _point_src(dm), _rcv(dm)
    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                      None, block=8, interpret=True)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.06)})
    taps = lowpass_taps(dt, 8.0, dtype=jnp.float64)

    theta = {"vp": jnp.asarray(vp0)}
    vg = ldf.vg_factory(taps)
    v0, g = vg(theta)

    # value must equal the filtered misfit computed from synth directly
    syn = ldf.synth(theta)
    d = (np.asarray(lowpass(jnp.asarray(syn[0]), taps, axis=0))
         - np.asarray(lowpass(jnp.asarray(ldf.observed[0]), taps, axis=0)))
    np.testing.assert_allclose(v0, 0.5 * np.sum(d * d), rtol=1e-9)

    # directional FD through the full filtered scan
    rng = np.random.default_rng(0)
    dvec = rng.standard_normal(dm.num_elements)
    dvec /= np.abs(dvec).max()
    eps = 1e-5
    vp_p = {"vp": jnp.asarray(vp0 + eps * dvec)}
    vp_m = {"vp": jnp.asarray(vp0 - eps * dvec)}
    fd = (vg(vp_p)[0] - vg(vp_m)[0]) / (2 * eps)
    ad = float(np.dot(np.asarray(g["vp"]), dvec))
    np.testing.assert_allclose(ad, fd, rtol=1e-6)


def test_aniso_vti_gradient_matches_einsum_ad():
    """aniso='vti': lane-path Thomsen-parameter gradients == einsum AD
    through make_aniso_stress_op, plus a directional FD check."""
    from seigen_tpu.ops.anisotropic import (make_aniso_stress_op,
                                            vti_stiffness_jnp)
    from seigen_tpu.solver.adjoint import run_segmented, with_material

    dm = build_discrete(
        box_mesh(2, 2, 2), 1,
        bc_fn=absorbing_bc_fn(((0.0, 1.0),) * 3, free_sides=[(2, "hi")]))
    E, n_p = dm.num_elements, dm.re.n_p
    rng = np.random.default_rng(11)
    rho = 1.0 + rng.random(E)
    vp = 2.0 + rng.random(E)
    vs = 0.8 + 0.3 * rng.random(E)
    p0 = build_params(dm, Material(rho=rho, vp=vp, vs=vs),
                      dtype=jnp.float64)
    ex = detect_structured(dm)
    dt = cfl_dt(float(dm.h.min()), 3.5, 1, 0.25)
    n_steps = 8
    src, rcv = _point_src(dm, f0=6.0, t0=0.1), _rcv(dm)

    eps0 = jnp.asarray(0.10 + 0.05 * rng.random(E))
    del0 = jnp.asarray(0.04 + 0.02 * rng.random(E))
    gam0 = jnp.asarray(0.08 + 0.04 * rng.random(E))
    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                      None, block=8, interpret=True, aniso="vti",
                      theta_defaults={"epsilon": eps0, "delta": del0,
                                      "gamma": gam0})
    ldf.observed = ldf.synth({"epsilon": eps0 * 1.5})
    theta = {"vp": jnp.asarray(vp), "epsilon": eps0, "delta": del0}
    v_lane, g_lane = ldf.vg_factory(None)(theta)

    st0 = State(u=jnp.zeros((E, n_p, 3), jnp.float64),
                s=jnp.zeros((E, n_p, 6), jnp.float64))
    obs = jnp.asarray(ldf.observed[0])

    def loss_ref(theta):
        full = {"vs": jnp.asarray(vs), "rho": jnp.asarray(rho),
                "gamma": gam0, **theta}
        C = vti_stiffness_jnp(full["vp"], full["vs"], full["rho"],
                              full["epsilon"], full["delta"],
                              full["gamma"])
        so = make_aniso_stress_op(C)
        p = with_material(p0, vp=full["vp"], vs=full["vs"],
                          rho=full["rho"])
        _, seis = run_segmented(p, st0, dt, n_steps, order=4, src=src,
                                receivers=rcv, stress_op=so)
        r = seis - obs
        return 0.5 * jnp.sum(r * r)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(theta)
    assert float(v_ref) > 1e-12
    np.testing.assert_allclose(float(v_ref), v_lane, rtol=1e-6)
    for k in theta:
        scale = np.abs(np.asarray(g_ref[k])).max()
        assert scale > 0, k
        np.testing.assert_allclose(
            np.asarray(g_lane[k]), np.asarray(g_ref[k]),
            rtol=1e-5, atol=1e-8 * scale, err_msg=k)

    # directional FD on epsilon through the lane loss
    dvec = rng.standard_normal(E)
    dvec /= np.abs(dvec).max()
    h = 1e-6
    vg = ldf.vg_factory(None)
    vpl = dict(theta); vpl["epsilon"] = eps0 + h * dvec
    vmi = dict(theta); vmi["epsilon"] = eps0 - h * dvec
    fd = (vg(vpl)[0] - vg(vmi)[0]) / (2 * h)
    ad = float(np.dot(np.asarray(g_lane["epsilon"]), dvec))
    np.testing.assert_allclose(ad, fd, rtol=1e-5)


@pytest.mark.parametrize("dim", [2, 3])
def test_merged_engine_gradient_matches_lane(dim):
    """engine='merged' (v3 exchange-in-kernel ops + per-op trace seeding)
    reproduces the lane-engine gradient to roundoff."""
    if dim == 2:
        dm, p0, ex = _setup_2d(het=True, seed=21)
        damp = jnp.asarray(
            sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")], width=0.25),
            jnp.float64)
    else:
        rng = np.random.default_rng(22)
        dm = build_discrete(
            box_mesh(2, 2, 2), 1,
            bc_fn=absorbing_bc_fn(((0.0, 1.0),) * 3,
                                  free_sides=[(2, "hi")]))
        E = dm.num_elements
        p0 = build_params(
            dm, Material(rho=1.0 + rng.random(E), vp=2.0 + rng.random(E),
                         vs=0.8 + 0.3 * rng.random(E)), dtype=jnp.float64)
        ex = detect_structured(dm)
        damp = None
    dt = cfl_dt(float(dm.h.min()), 3.5, 2, 0.25)
    n_steps = 10
    src, rcv = _point_src(dm), _rcv(dm)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    theta = {"vp": jnp.asarray(vp0)}
    res = {}
    for engine in ("lane", "merged"):
        ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                          None, damp=damp, block=8, interpret=True,
                          engine=engine)
        ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.06)})
        res[engine] = ldf.vg_factory(None)(theta) + (ldf.observed,)
    v1, g1, o1 = res["lane"]
    v2, g2, o2 = res["merged"]
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), rtol=1e-11,
                               atol=1e-14)
    np.testing.assert_allclose(v2, v1, rtol=1e-10)
    scale = np.abs(np.asarray(g1["vp"])).max()
    assert scale > 0
    np.testing.assert_allclose(np.asarray(g2["vp"]), np.asarray(g1["vp"]),
                               rtol=1e-9, atol=1e-13 * scale)


def test_source_wavelet_gradient_finite_difference():
    """Source estimation: per-shot (amp, f0, t0) gradients FD-checked
    through the full lane scan; joint mode returns the same theta grad
    as vg_factory."""
    dm, p0, ex = _setup_2d(het=False, seed=11)
    dt = cfl_dt(float(dm.h.min()), 2.5, 2, 0.3)
    n_steps = 12
    srcs = [_point_src(dm, pos=(0.35, 0.55)),
            _point_src(dm, pos=(0.6, 0.45), f0=8.0, t0=0.05)]
    rcv = _rcv(dm)
    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots(srcs), rcv,
                      None, block=8, interpret=True)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    theta = {"vp": jnp.asarray(vp0)}
    # observed from the TRUE wavelets; invert from perturbed ones
    ldf.observed = ldf.synth(theta)
    wav0 = {kk: np.asarray(ldf.src[kk]) for kk in ("amp", "f0", "t0")}
    wav = {"amp": wav0["amp"] * 1.15, "f0": wav0["f0"] * 0.95,
           "t0": wav0["t0"] + 0.003}

    vg = ldf.source_vg_factory()
    v0, gw = vg(wav, theta)
    assert v0 > 1e-12
    for kk in ("amp", "f0", "t0"):
        # per-shot, per-source-point gradients (S, K) like the wavelet
        assert gw[kk].shape == wav0[kk].shape

    # central FD on each wavelet parameter of each shot
    for kk, eps in (("amp", 1e-4), ("f0", 1e-4), ("t0", 1e-6)):
        for s in range(2):
            wp = {k2: v.copy() for k2, v in wav.items()}
            wm = {k2: v.copy() for k2, v in wav.items()}
            wp[kk][s] += eps
            wm[kk][s] -= eps
            fd = (vg(wp, theta)[0] - vg(wm, theta)[0]) / (2 * eps)
            np.testing.assert_allclose(np.sum(gw[kk][s]), fd, rtol=2e-5,
                                       err_msg=f"{kk}[{s}]")

    # joint mode: theta gradient from the same sweeps == vg_factory's
    # at the same wavelets
    for kk in ("amp", "f0", "t0"):
        ldf.src[kk] = jnp.asarray(wav[kk], ldf.dtype)
    v2, gw2, gt = ldf.source_vg_factory(with_theta=True)(wav, theta)
    np.testing.assert_allclose(v2, v0, rtol=1e-12)
    v3, gt_ref = ldf.vg_factory(None)(theta)
    np.testing.assert_allclose(v3, v0, rtol=1e-10)
    scale = np.abs(np.asarray(gt_ref["vp"])).max()
    np.testing.assert_allclose(np.asarray(gt["vp"]),
                               np.asarray(gt_ref["vp"]),
                               rtol=1e-9, atol=1e-13 * scale)


def test_moment_tensor_gradient_and_recovery():
    """CMT inversion: per-shot Voigt moment gradients FD-checked through
    the full lane scan; Adam from a perturbed mechanism recovers the
    true one (misfit down, moment vector closer in direction)."""
    import optax

    dm, p0, ex = _setup_2d(het=False, seed=13)
    dt = cfl_dt(float(dm.h.min()), 2.5, 2, 0.3)
    n_steps = 14
    h = float(dm.h.max())
    m_true = (0.3, -0.2, 1.0)  # oblique double-couple-ish mechanism
    src = build_sources(
        dm, [PointSource(position=(0.45, 0.55), f0=10.0, t0=0.04,
                         amplitude=100.0, radius=2.5 * h, kind="moment",
                         moment=m_true)],
        dtype=jnp.float64)
    rcv = _rcv(dm, R=5)
    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                      None, block=8, interpret=True)
    ldf.observed = ldf.synth({})  # observed with the TRUE mechanism

    vg = ldf.moment_vg_factory()
    m_init = vg.m_init  # factorization of the constructed (true) shots
    np.testing.assert_allclose(m_init[0] / m_init[0, 2], m_true,
                               rtol=1e-10)

    rng = np.random.default_rng(1)
    m = m_init + 0.5 * np.abs(m_init).max() * rng.standard_normal(
        m_init.shape)
    v0, g = vg(m, {})
    assert v0 > 1e-12 and g.shape == m.shape

    # FD on each Voigt component
    for c in range(3):
        eps = 1e-5
        mp, mm = m.copy(), m.copy()
        mp[0, c] += eps
        mm[0, c] -= eps
        fd = (vg(mp, {})[0] - vg(mm, {})[0]) / (2 * eps)
        np.testing.assert_allclose(g[0, c], fd, rtol=2e-6,
                                   err_msg=f"Voigt {c}")

    # mechanism recovery by Adam
    def cosang(a, b):
        return float(np.dot(a.ravel(), b.ravel())
                     / (np.linalg.norm(a) * np.linalg.norm(b)))

    cos0 = cosang(m, m_init)
    opt = optax.adam(0.05 * float(np.abs(m_init).max()))
    x = jnp.asarray(m)
    ost = opt.init(x)
    v_last = v0
    for _ in range(30):
        v_last, g = vg(np.asarray(x), {})
        upd, ost = opt.update(jnp.asarray(g), ost, x)
        x = optax.apply_updates(x, upd)
    assert v_last < 0.05 * v0
    assert cosang(np.asarray(x), m_init) > max(cos0, 0.99)


def test_unstructured_gradient_matches_einsum_ad():
    """engine='lane_u': FWI gradients through the face-bijection
    unstructured lane runner == plain AD through the einsum step, on a
    scrambled (structure-free) mesh with heterogeneous material and
    mixed BCs — the conjugation identity is mesh-agnostic."""
    import dataclasses as _dc

    rng = np.random.default_rng(17)
    topo = rect_mesh(4, 4)
    topo = _dc.replace(topo, cells=topo.cells[rng.permutation(
        topo.num_cells)], structure=None)
    extents = ((0.0, 1.0), (0.0, 1.0))
    dm = build_discrete(topo, 2, bc_fn=absorbing_bc_fn(
        extents, free_sides=[(1, "hi")]))
    E, n_p = dm.num_elements, dm.re.n_p
    rho = 1.0 + rng.random(E)
    vp = 2.0 + rng.random(E)
    vs = 0.8 + 0.4 * rng.random(E)
    p0 = build_params(dm, Material(rho=rho, vp=vp, vs=vs),
                      dtype=jnp.float64)
    assert detect_structured(dm) is None  # genuinely unstructured
    dt = cfl_dt(float(dm.h.min()), 3.0, 2, 0.3)
    n_steps = 12
    src, rcv = _point_src(dm), _rcv(dm)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")], width=0.25),
        jnp.float64)

    ldf = LaneDiffFwi(p0, dm, None, dt, n_steps, stack_shots([src]), rcv,
                      None, damp=damp, block=8, interpret=True,
                      engine="lane_u")
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.07)})

    st0 = State(u=jnp.zeros((E, n_p, 2), jnp.float64),
                s=jnp.zeros((E, n_p, 3), jnp.float64))
    vg_ref, init_theta = make_fwi_gradient(
        p0, st0, dt, n_steps, src, rcv, jnp.asarray(ldf.observed[0]),
        fields=("vp", "vs", "rho"), order=4, damp=damp)
    theta = init_theta()
    v_ref, g_ref = vg_ref(theta)
    v_lane, g_lane = ldf.vg_factory(None)(theta)
    assert float(v_ref) > 1e-10
    np.testing.assert_allclose(float(v_ref), v_lane, rtol=1e-6)
    for k in ("vp", "vs", "rho"):
        scale = np.abs(np.asarray(g_ref[k])).max()
        assert scale > 0
        np.testing.assert_allclose(
            np.asarray(g_lane[k]), np.asarray(g_ref[k]),
            rtol=1e-5, atol=1e-8 * scale, err_msg=k)

    # transpose exactness of the unstructured custom ops themselves
    d = ldf.runner.d
    r = ldf.runner
    E_pad, npp = r.E_pad, d.npp

    def zpad(x, C):
        xr = x.reshape(C, npp, E_pad).copy()
        xr[:, d.n_p:, :] = 0
        xr[:, :, r.E:] = 0
        return jnp.asarray(xr.reshape(C * npp, E_pad))

    sig = zpad(rng.random((3 * npp, E_pad)), 3)
    ubar = zpad(rng.random((2 * npp, E_pad)), 2)
    out, vjp = jax.vjp(lambda s: ldf.A(d, ldf.w, s), sig)
    lhs = jnp.vdot(ubar, out)
    rhs = jnp.vdot(vjp(ubar)[0], sig)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-11)


@pytest.mark.parametrize("engine", ["lane", "merged"])
def test_illumination_matches_einsum_scan(engine):
    """LaneDiffFwi.illumination (per-lane energy accumulated INSIDE the
    lane scan) == a plain einsum-step scan accumulating sum_t sum_nodes
    u^2 per element — the pseudo-Hessian proxy is exact, not a model."""
    from seigen_tpu.solver.timestep import make_step

    dm, p0, ex = _setup_2d(het=True, seed=4)
    E, n_p = dm.num_elements, dm.re.n_p
    dt = cfl_dt(float(dm.h.min()), 3.0, 2, 0.3)
    n_steps = 10
    src, rcv = _point_src(dm), _rcv(dm)
    damp = jnp.asarray(
        sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")], width=0.25),
        jnp.float64)

    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                      None, damp=damp, block=8, interpret=True,
                      engine=engine)
    illum = ldf.illumination()

    step = make_step(p0, dt, order=4, src=src, damp=damp)
    st = State(u=jnp.zeros((E, n_p, 2), jnp.float64),
               s=jnp.zeros((E, n_p, 3), jnp.float64))
    acc = np.zeros(E)
    for k in range(n_steps):
        st = step(st, k * dt)
        acc += np.sum(np.asarray(st.u) ** 2, axis=(1, 2))
    assert acc.max() > 0
    np.testing.assert_allclose(illum, acc, rtol=1e-9,
                               atol=1e-12 * acc.max())

    # the einsum-path twin used by scripts/rtm.py --grad-path einsum
    from seigen_tpu.solver.imaging import source_illumination

    st0 = State(u=jnp.zeros((E, n_p, 2), jnp.float64),
                s=jnp.zeros((E, n_p, 3), jnp.float64))
    tw = source_illumination(p0, st0, dt, n_steps, stack_shots([src]),
                             damp=damp)
    np.testing.assert_allclose(tw, acc, rtol=1e-9,
                               atol=1e-12 * acc.max())


def test_invert_precond_changes_gd_not_adam_direction():
    """invert(precond=w): the weights reach the 'gd' update (depth
    compensation) and the plumbing is a no-op for w == 1."""
    from seigen_tpu.solver.fwi import invert

    dm, p0, ex = _setup_2d(het=False, seed=5)
    E, n_p = dm.num_elements, dm.re.n_p
    dt = cfl_dt(float(dm.h.min()), 2.5, 2, 0.3)
    n_steps = 8
    src, rcv = _point_src(dm), _rcv(dm)
    ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                      None, block=8, interpret=True)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.06)})
    st0 = State(u=jnp.zeros((E, n_p, 2), jnp.float64),
                s=jnp.zeros((E, n_p, 3), jnp.float64))
    kw = dict(fields=("vp",), optimizer="gd", lr=0.05, iters=1,
              smooth_iters=0, vg_factory=ldf.vg_factory)
    base = invert(p0, st0, dt, n_steps, stack_shots([src]), rcv,
                  ldf.observed, **kw)
    ones = invert(p0, st0, dt, n_steps, stack_shots([src]), rcv,
                  ldf.observed, precond=np.ones(E), **kw)
    np.testing.assert_allclose(np.asarray(ones.theta["vp"]),
                               np.asarray(base.theta["vp"]), rtol=1e-12)
    w = 1.0 + np.linspace(0.0, 3.0, E)  # strongly uneven weights
    wrun = invert(p0, st0, dt, n_steps, stack_shots([src]), rcv,
                  ldf.observed, precond=w, **kw)
    assert not np.allclose(np.asarray(wrun.theta["vp"]),
                           np.asarray(base.theta["vp"]))


@pytest.mark.parametrize("dim", [2, 3])
def test_packed_merged_gradient_matches_lane(dim):
    """engine='merged', packed=True (P1 two-elements-per-lane adjoint:
    block-diag mass embedding, per-ROW detJ/material rows, parity source
    placement) reproduces the lane-engine gradient, seismograms, and
    illumination to roundoff."""
    if dim == 2:
        rng = np.random.default_rng(31)
        dm = build_discrete(
            rect_mesh(4, 4), 1,
            bc_fn=absorbing_bc_fn(((0.0, 1.0), (0.0, 1.0)),
                                  free_sides=[(1, "hi")]))
        E = dm.num_elements
        p0 = build_params(
            dm, Material(rho=1.0 + rng.random(E), vp=2.0 + rng.random(E),
                         vs=0.8 + 0.4 * rng.random(E)), dtype=jnp.float64)
        ex = detect_structured(dm)
        damp = jnp.asarray(
            sponge_mask(dm, [(0, "lo"), (0, "hi"), (1, "lo")], width=0.25),
            jnp.float64)
    else:
        rng = np.random.default_rng(32)
        dm = build_discrete(
            box_mesh(2, 2, 2), 1,
            bc_fn=absorbing_bc_fn(((0.0, 1.0),) * 3,
                                  free_sides=[(2, "hi")]))
        E = dm.num_elements
        p0 = build_params(
            dm, Material(rho=1.0 + rng.random(E), vp=2.0 + rng.random(E),
                         vs=0.8 + 0.3 * rng.random(E)), dtype=jnp.float64)
        ex = detect_structured(dm)
        damp = None
    dt = cfl_dt(float(dm.h.min()), 3.5, 1, 0.25)
    n_steps = 10
    src, rcv = _point_src(dm), _rcv(dm)
    vp0 = np.asarray(jnp.sqrt((p0.lam + 2 * p0.mu) * p0.inv_rho))
    theta = {"vp": jnp.asarray(vp0)}
    res = {}
    for key, kw in (("lane", dict(engine="lane")),
                    ("merged_pk", dict(engine="merged", packed=True))):
        ldf = LaneDiffFwi(p0, dm, ex, dt, n_steps, stack_shots([src]), rcv,
                          None, damp=damp, block=8, interpret=True, **kw)
        if key == "merged_pk":
            assert ldf.runner.n_par == 2, "packed layout did not engage"
        ldf.observed = ldf.synth({"vp": jnp.asarray(vp0 * 1.06)})
        res[key] = (ldf.vg_factory(None)(theta) + (ldf.observed,)
                    + (ldf.illumination(),))
    v1, g1, o1, i1 = res["lane"]
    v2, g2, o2, i2 = res["merged_pk"]
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), rtol=1e-11,
                               atol=1e-14)
    np.testing.assert_allclose(v2, v1, rtol=1e-10)
    scale = np.abs(np.asarray(g1["vp"])).max()
    assert scale > 0
    np.testing.assert_allclose(np.asarray(g2["vp"]), np.asarray(g1["vp"]),
                               rtol=1e-9, atol=1e-13 * scale)
    np.testing.assert_allclose(i2, i1, rtol=1e-9, atol=1e-12 * i1.max())
