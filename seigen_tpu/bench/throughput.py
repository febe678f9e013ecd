"""Throughput benchmark: DOF-updates/sec/chip on the 3D explosive source.

The north-star metric per BASELINE.json [D].  A "DOF update" is one field
coefficient advanced one full LF timestep; for the velocity-stress system the
per-step DOF count is E * n_p * (dim + n_sig).  The baseline denominator is
this same solver's CPU path (the Firedrake reference cannot run here — see
BASELINE.md caveat).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import box_mesh, build_discrete
from ..ops import Material, build_params, n_sig_for
from ..solver import (
    PointSource,
    State,
    absorbing_bc_fn,
    build_sources,
    cfl_dt,
    run,
    sponge_mask,
)


# ONE material for the whole bench surface: setup_case's elastic params
# and measure()'s Godunov impedances must stay physically consistent
BENCH_MAT = Material(rho=1.0, vp=2.0, vs=1.0)


@dataclass
class BenchResult:
    dof_updates_per_sec: float
    steps_per_sec: float
    n_elements: int
    n_dof: int
    degree: int
    n_steps: int
    seconds: float


def setup_case(
    n: int = 24,
    degree: int = 3,
    dtype=jnp.float32,
    dim: int = 3,
    scramble: bool = False,
):
    """3D explosive-source case: unit box, free top, absorbing elsewhere.

    ``scramble`` randomly permutes cell order and drops the structure
    metadata — the honest stand-in for a Gmsh unstructured import
    (benchmarks the unstructured path on identical geometry/physics).
    """
    extents = ((0.0, 1.0),) * dim
    if dim == 3:
        topo = box_mesh(n, n, n)
        free = [(2, "hi")]
        absorb = [(0, "lo"), (0, "hi"), (1, "lo"), (1, "hi"), (2, "lo")]
        src_pos = (0.5, 0.5, 0.8)
    else:
        from ..mesh import rect_mesh

        topo = rect_mesh(n, n)
        free = [(1, "hi")]
        absorb = [(0, "lo"), (0, "hi"), (1, "lo")]
        src_pos = (0.5, 0.8)
    if scramble:
        import dataclasses

        rng = np.random.default_rng(0)
        topo = dataclasses.replace(
            topo, cells=topo.cells[rng.permutation(topo.num_cells)],
            structure=None)
    bc_fn = absorbing_bc_fn(extents, free_sides=free)
    dm = build_discrete(topo, degree, bc_fn=bc_fn)
    p = build_params(dm, BENCH_MAT, dtype=dtype)
    h_elem = float(dm.h.min())
    src = build_sources(
        dm,
        [PointSource(position=src_pos, f0=0.25 / h_elem, radius=2 * h_elem)],
        dtype=dtype,
    )
    damp = jnp.asarray(sponge_mask(dm, absorb, width=0.15), dtype=dtype)
    dt = cfl_dt(h_elem, 2.0, degree, cfl=0.4)
    E, n_p = dm.num_elements, dm.re.n_p
    state0 = State(
        u=jnp.zeros((E, n_p, dim), dtype=dtype),
        s=jnp.zeros((E, n_p, n_sig_for(dim)), dtype=dtype),
    )
    return dm, p, src, damp, dt, state0


def measure(
    p, src, damp, dt, state0, n_steps: int = 50, order: int = 4,
    warmup: bool = True, impl: str = "einsum", dm=None,
    vti: bool = False, overlap: bool = True, fill_mode: str = "auto",
    block: int | None = None,
) -> BenchResult:
    """impl: einsum | xla_roll | pallas | pallas_roll (roll variants need
    the DiscreteMesh ``dm`` for structure detection) | lane/fused/merged/
    lane_u/*_sharded lane-major runners | upwind_lane / upwind_lane_u
    (Godunov RK4).  ``vti``: per-element Voigt stiffness through the
    runner's anisotropic Hooke path (lane/lane_u/fused/merged).
    ``overlap``: fused_sharded only — interior/boundary kernel split so
    the halo ppermute hides under interior compute (A/B knob for the
    1-shard hardware cost of the split).  ``fill_mode``: fused_sharded
    only — halo-fill strategy / 1-shard split probes (see
    ShardedFusedRunner)."""
    dim = p.dim
    dm_for_ex = dm
    stiffness = None
    if vti:
        if impl not in ("lane", "fused", "merged", "lane_u"):
            # refuse rather than silently time isotropic physics under a
            # row labeled vti=true
            raise ValueError(f"vti=True is wired for lane/fused/merged/"
                             f"lane_u runners, not impl={impl!r}")
        from ..ops.anisotropic import vti_stiffness

        E_ = p.Ginv.shape[0]
        stiffness = np.broadcast_to(
            vti_stiffness(2.0, 1.0, 1.0, epsilon=0.15, delta=0.05,
                          gamma=0.1), (E_, 6, 6))

    if impl in ("upwind_lane", "upwind_lane_u"):
        from ..ops.upwind import build_upwind_data

        w = build_upwind_data(dm, BENCH_MAT, dtype=p.Ginv.dtype)
        itp = jax.devices()[0].platform == "cpu"
        if impl == "upwind_lane":
            from ..ops.structured_exchange import detect_structured
            from ..solver.lane_upwind import UpwindLaneRunner

            ex = detect_structured(dm)
            if ex is None:
                raise ValueError("upwind_lane requires a structured mesh")
            runner = UpwindLaneRunner(p, ex, w, dt, src=src, damp=damp,
                                      interpret=itp)
        else:
            from ..solver.lane_upwind_u import UnstructuredUpwindRunner

            runner = UnstructuredUpwindRunner(
                p, w, dt, src=src, damp=damp, interpret=itp,
                centroids=np.asarray(dm.coords.mean(axis=1)))
        ulm, slm = runner.to_lm_state(state0)
        if warmup:
            u1, _, _ = runner.run_lm(ulm, slm, n_steps)
            np.asarray(u1[0, 0])
        dt_wall = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            u1, _, _ = runner.run_lm(ulm, slm, n_steps)
            np.asarray(u1[0, 0])
            dt_wall = min(dt_wall, time.perf_counter() - t0)
        E = state0.u.shape[0]
        n_p = state0.u.shape[1]
        n_dof = E * n_p * (dim + n_sig_for(dim))
        return BenchResult(
            dof_updates_per_sec=n_dof * n_steps / dt_wall,
            steps_per_sec=n_steps / dt_wall,
            n_elements=E, n_dof=n_dof, degree=p.degree,
            n_steps=n_steps, seconds=dt_wall,
        )
    if impl in ("lane", "fused", "merged", "merged_pk", "lane_u",
                "lane_u_sharded", "lane_sharded", "fused_sharded",
                "fused_sharded_pk"):
        if impl in ("fused_sharded", "fused_sharded_pk"):
            # v3 multi-chip pipeline (config 5): merged kernels + compact
            # trace-plane ppermute; at one local device this is the 1-shard
            # hardware validation, on a pod the strong-scaling measurement
            from ..ops.structured_exchange import detect_structured
            from ..parallel.fused_sharded import ShardedFusedRunner

            ex = detect_structured(dm)
            if ex is None:
                raise ValueError("fused_sharded requires a structured mesh")
            n_shards = len(jax.devices())
            while ex.grid[0] % n_shards:
                n_shards -= 1
            runner = ShardedFusedRunner(p, ex, dt, n_shards, order=order,
                                        src=src, damp=damp,
                                        overlap=overlap,
                                        fill_mode=fill_mode,
                                        packed=(impl == "fused_sharded_pk"))
        elif impl == "lane_sharded":
            # production config-5 pipeline through the bench surface; with
            # one local device this is the 1-shard hardware validation of
            # the sharded machinery (docs/VALIDATION.md), with a pod it is
            # the real strong-scaling measurement
            from ..ops.structured_exchange import detect_structured
            from ..parallel.lane_sharded import ShardedLaneRunner

            ex = detect_structured(dm)
            if ex is None:
                raise ValueError("lane_sharded requires a structured mesh")
            n_shards = len(jax.devices())
            while ex.grid[0] % n_shards:
                n_shards -= 1
            runner = ShardedLaneRunner(p, ex, dt, n_shards, order=order,
                                       src=src, damp=damp)
            if warmup:
                fin, _ = runner.run(state0, n_steps)
                np.asarray(fin.u[0, 0, 0])
            dt_wall = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fin, _ = runner.run(state0, n_steps)
                np.asarray(fin.u[0, 0, 0])
                dt_wall = min(dt_wall, time.perf_counter() - t0)
            E = state0.u.shape[0]
            n_p = state0.u.shape[1]
            n_dof = E * n_p * (dim + n_sig_for(dim))
            return BenchResult(
                dof_updates_per_sec=n_dof * n_steps / dt_wall,
                steps_per_sec=n_steps / dt_wall,
                n_elements=E, n_dof=n_dof, degree=p.degree,
                n_steps=n_steps, seconds=dt_wall,
            )
        if impl == "lane_u_sharded":
            # Morton-block sharded unstructured fast path; with one local
            # device this is the 1-shard hardware validation, on a pod the
            # unstructured strong-scaling measurement
            from ..parallel.unstructured_sharded import (
                ShardedUnstructuredRunner,
            )

            runner = ShardedUnstructuredRunner(
                p, dt, len(jax.devices()), order=order, src=src, damp=damp,
                centroids=np.asarray(dm.coords.mean(axis=1)))
            ex = None
        elif impl == "lane_u":
            from ..solver.lane_unstructured import UnstructuredLaneRunner

            runner = UnstructuredLaneRunner(
                p, dt, order=order, src=src, damp=damp,
                centroids=np.asarray(dm.coords.mean(axis=1)),
                stiffness=stiffness)
            ex = None
        else:
            from ..ops.structured_exchange import detect_structured

            ex = detect_structured(dm)
            if ex is None:
                raise ValueError(f"{impl} impl requires a structured mesh")
        if impl == "fused":
            from ..solver.lane_fused import FusedLaneRunner

            runner = FusedLaneRunner(p, ex, dt, order=order, src=src,
                                     damp=damp, stiffness=stiffness)
        elif impl in ("merged", "merged_pk"):
            from ..solver.lane_merged import MergedLaneRunner

            # merged_pk: force the P1 two-elements-per-lane layout (A/B
            # surface); plain "merged" stays unpacked so the per-degree
            # split is measurable
            runner = MergedLaneRunner(p, ex, dt, order=order, src=src,
                                      damp=damp, stiffness=stiffness,
                                      packed=(impl == "merged_pk"),
                                      block=block)
        elif impl == "lane":
            from ..solver.lane_major import LaneMajorRunner

            runner = LaneMajorRunner(p, ex, dt, order=order, src=src,
                                     damp=damp, stiffness=stiffness)
        # layout conversion happens once per simulation, not per chunk:
        # time the steady-state lane-major loop
        ulm, slm = runner.to_lm_state(state0)
        if warmup:
            u1, s1, _ = runner.run_lm(ulm, slm, n_steps)
            np.asarray(u1[0, 0])
        # best-of-3: the tunnelled readback adds run-to-run jitter of
        # 10-20% to a ~0.4 s measurement (BENCH_NOTES.md)
        dt_wall = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            u1, s1, _ = runner.run_lm(ulm, slm, n_steps)
            np.asarray(u1[0, 0])  # forced readback (see BENCH_NOTES.md)
            dt_wall = min(dt_wall, time.perf_counter() - t0)
        E = state0.u.shape[0]
        n_p = state0.u.shape[1]
        n_dof = E * n_p * (dim + n_sig_for(dim))
        return BenchResult(
            dof_updates_per_sec=n_dof * n_steps / dt_wall,
            steps_per_sec=n_steps / dt_wall,
            n_elements=E,
            n_dof=n_dof,
            degree=p.degree,
            n_steps=n_steps,
            seconds=dt_wall,
        )
    if impl in ("pallas", "pallas_roll"):
        from ..ops.pallas_kernels import make_pallas_ops

        ex = None
        if impl == "pallas_roll" and dm_for_ex is not None:
            from ..ops.structured_exchange import detect_structured

            ex = detect_structured(dm_for_ex)
        vel_op, stress_op = make_pallas_ops(p, exchange=ex)
    elif impl == "xla_roll":
        from ..ops.structured_exchange import (
            detect_structured, make_structured_ops)

        ex = detect_structured(dm_for_ex) if dm_for_ex is not None else None
        if ex is None:
            raise ValueError("xla_roll requires a structured mesh")
        vel_op, stress_op = make_structured_ops(p, ex)
    else:
        from ..ops import apply_stress_op, apply_vel_op

        vel_op, stress_op = apply_vel_op, apply_stress_op

    @jax.jit
    def go(p, st):
        fin, _ = run(p, st, dt, n_steps, order=order, src=src, damp=damp,
                     vel_op=vel_op, stress_op=stress_op)
        return fin

    if warmup:
        go(p, state0).u.block_until_ready()
    t0 = time.perf_counter()
    fin = go(p, state0)
    fin.u.block_until_ready()
    dt_wall = time.perf_counter() - t0

    E = state0.u.shape[0]
    n_p = state0.u.shape[1]
    n_dof = E * n_p * (dim + n_sig_for(dim))
    return BenchResult(
        dof_updates_per_sec=n_dof * n_steps / dt_wall,
        steps_per_sec=n_steps / dt_wall,
        n_elements=E,
        n_dof=n_dof,
        degree=p.degree,
        n_steps=n_steps,
        seconds=dt_wall,
    )


def main(n: int = 24, degree: int = 3, n_steps: int = 50,
         baseline_dof_rate: float | None = None, impl: str = "auto") -> dict:
    dm, p, src, damp, dt, state0 = setup_case(n=n, degree=degree)
    if impl == "auto":
        # best-known path on TPU; robust fallback if the pallas/roll path
        # regresses on a new runtime
        errors = {}
        res = None
        for candidate in ("merged", "fused", "lane", "pallas_roll",
                          "xla_roll", "einsum"):
            try:
                res = measure(p, src, damp, dt, state0, n_steps=n_steps,
                              impl=candidate, dm=dm)
                impl = candidate
                break
            except Exception as e:  # noqa: BLE001 — surfaced below
                errors[candidate] = repr(e)
        if res is None:
            raise RuntimeError(f"every backend candidate failed: {errors}")
    else:
        res = measure(p, src, damp, dt, state0, n_steps=n_steps, impl=impl,
                      dm=dm)
    out = {
        "metric": "dof_updates_per_sec_per_chip_3d_explosive",
        "value": res.dof_updates_per_sec,
        "unit": "DOF-updates/s/chip",
        "vs_baseline": (
            res.dof_updates_per_sec / baseline_dof_rate
            if baseline_dof_rate
            else None
        ),
        "detail": {
            "elements": res.n_elements,
            "dof": res.n_dof,
            "degree": res.degree,
            "steps": res.n_steps,
            "seconds": res.seconds,
            "steps_per_sec": res.steps_per_sec,
            "backend": jax.devices()[0].platform,
            "impl": impl,
        },
    }
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
