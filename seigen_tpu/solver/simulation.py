"""High-level simulation facade — API parity with the reference's ElasticLF4.

The reference exposes ``ElasticLF4(mesh, family, degree, dim, explicit=...)``
with material attributes and a ``run(T)`` loop (SURVEY.md §2 layer 2).  The
TPU-native equivalent is a frozen config + a facade object wiring mesh,
material, sources, receivers, boundaries, damping, and the jitted scan
together, with checkpoint/VTK hooks.  All state is explicit; nothing global.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import MeshTopology, build_discrete
from ..ops import Material, build_params, n_sig_for
from .damping import absorbing_bc_fn, sponge_mask
from .receivers import build_receivers, sample
from .source import PointSource, build_sources
from .timestep import State, cfl_dt, make_step, run, staggered_init


@dataclass(frozen=True)
class SimConfig:
    """Frozen run configuration (SURVEY.md §7.6: one dataclass per run)."""

    degree: int = 2
    order: int = 4  # LF2 | LF4
    cfl: float = 0.4
    dtype: str = "float32"
    impl: str = "auto"  # auto|einsum|xla_roll|pallas|pallas_roll|lane|lane_u
    free_sides: tuple = ()  # ((axis, "lo"|"hi"), ...)
    absorbing_sides: tuple = ()  # rest default to free surface
    sponge_width: float = 0.0
    sponge_alpha: float = 2.0
    scheme: str = "lf"  # lf (central flux + leapfrog) | upwind-rk4
    # viscoelastic attenuation (upwind-rk4 scheme only); None = elastic
    q_kappa: float | None = None
    q_mu: float | None = None
    q_band: tuple | None = None  # (f_min, f_max); required with q_*


class ElasticSimulation:
    """Facade: build once, then step/run/sample.

    Reference-parity surface:
      sim = ElasticSimulation(topo, material, config, sources=[...],
                              receiver_points=...)
      final_state, seismograms = sim.run(T)
    """

    def __init__(
        self,
        topology: MeshTopology,
        material: Material,
        config: SimConfig = SimConfig(),
        sources: list[PointSource] | None = None,
        receiver_points: np.ndarray | None = None,
        stiffness: np.ndarray | None = None,
    ):
        """``stiffness``: optional per-element Voigt stiffness
        (n_sig, n_sig) or (E, n_sig, n_sig) for anisotropic media
        (ops/anisotropic.py); forces the einsum operator path
        (central-flux LF schemes only)."""
        if topology.structure is None and not topology.periodic:
            from ..mesh.recover import recover_structure

            topology = recover_structure(topology)
        self.config = config
        self.topology = topology
        self.material = material
        dtype = jnp.dtype(config.dtype)

        bc_fn = None
        if config.absorbing_sides:
            bc_fn = absorbing_bc_fn(
                topology.extents, free_sides=list(config.free_sides)
            )
        self.dm = build_discrete(topology, config.degree, bc_fn=bc_fn)
        self.params = build_params(self.dm, material, dtype=dtype)
        self.sources = build_sources(
            self.dm, sources or [], dtype=dtype, mat=material
        )
        self.receivers = (
            build_receivers(self.dm, receiver_points, dtype=dtype)
            if receiver_points is not None
            else None
        )
        self.damp = None
        if config.sponge_width > 0 and config.absorbing_sides:
            self.damp = jnp.asarray(
                sponge_mask(
                    self.dm,
                    list(config.absorbing_sides),
                    config.sponge_width,
                    config.sponge_alpha,
                ),
                dtype=dtype,
            )
        self._stiffness = None
        if stiffness is not None:
            if config.scheme != "lf":
                raise ValueError("anisotropy supports scheme='lf' only")
            n_sig = n_sig_for(self.dm.dim)
            E = self.dm.num_elements
            C = np.broadcast_to(np.asarray(stiffness),
                                (E, n_sig, n_sig))
            self._stiffness = jnp.asarray(C, dtype)
        vp_max = float(np.asarray(material.vp).max())
        if self._stiffness is not None:
            # CFL bound: phase speeds are bounded by sqrt(||C||_2/rho)
            # <= sqrt(||C||_F/rho); cheap per-element Frobenius bound
            Cf = np.asarray(self._stiffness, np.float64)
            fro = np.sqrt((Cf * Cf).sum(axis=(1, 2))).max()
            rho_min = float(np.asarray(material.rho).min())
            vp_max = max(vp_max, float(np.sqrt(fro / rho_min)))
        self.dt = cfl_dt(
            float(self.dm.h.min()), vp_max, config.degree, config.cfl
        )
        self._dtype = dtype
        self._wdata = self._visco = None
        if config.scheme == "upwind-rk4":
            from ..ops.upwind import build_upwind_data

            self._wdata = build_upwind_data(self.dm, material, dtype=dtype)
            if config.q_kappa or config.q_mu:
                if not config.q_band:
                    raise ValueError("q_band=(f_min, f_max) is required "
                                     "with q_kappa/q_mu")
                from ..ops.viscoelastic import build_visco

                self._visco = build_visco(
                    self.params, config.q_kappa or np.inf,
                    config.q_mu or np.inf, *config.q_band)
        elif config.q_kappa or config.q_mu:
            raise ValueError("attenuation requires scheme='upwind-rk4'")
        elif config.scheme != "lf":
            raise ValueError(f"unknown scheme {config.scheme!r}")

        self._vel_op, self._stress_op = self._select_ops(config.impl)

    def _select_ops(self, impl: str):
        """Pick the operator backend.

        "auto": structured roll exchange when the mesh supports it, fused
        Pallas kernels on TPU backends, einsum otherwise.
        """
        from ..ops import apply_stress_op, apply_vel_op
        from ..ops.structured_exchange import (
            detect_structured,
            make_structured_ops,
        )

        if self._stiffness is not None:
            if impl not in ("auto", "einsum"):
                raise ValueError("anisotropic stiffness runs the einsum "
                                 f"path; impl {impl!r} unsupported")
            from ..ops.anisotropic import make_aniso_stress_op

            self._impl = "einsum"
            return apply_vel_op, make_aniso_stress_op(self._stiffness)
        ex = None
        if impl in ("auto", "xla_roll", "pallas_roll", "lane"):
            ex = detect_structured(self.dm)
        # Pallas Mosaic kernels lower only on TPU; any other accelerator
        # (gpu, ...) must take the XLA paths.
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        if impl == "auto":
            impl = (
                ("lane" if ex is not None else "lane_u")
                if on_tpu
                else ("xla_roll" if ex is not None else "einsum")
            )
        self._impl = impl
        if impl == "lane":
            if ex is None:
                raise ValueError("lane impl requires a structured mesh")
            self._ex = ex
            # ops unused in lane mode, but step_fn() still works via them
            from ..ops.pallas_kernels import make_pallas_ops

            return make_pallas_ops(self.params, exchange=ex)
        if impl == "lane_u":
            # unstructured lane-major fast path; ops for step_fn() parity
            from ..ops.pallas_kernels import make_pallas_ops

            return make_pallas_ops(self.params)
        if impl == "einsum":
            return apply_vel_op, apply_stress_op
        if impl == "xla_roll":
            if ex is None:
                raise ValueError("xla_roll requires a structured mesh")
            return make_structured_ops(self.params, ex)
        if impl in ("pallas", "pallas_roll"):
            from ..ops.pallas_kernels import make_pallas_ops

            return make_pallas_ops(
                self.params, exchange=ex if impl == "pallas_roll" else None
            )
        raise ValueError(f"unknown impl {impl!r}")

    def zero_state(self) -> State:
        E, n_p = self.dm.num_elements, self.dm.re.n_p
        dim = self.dm.dim
        return State(
            u=jnp.zeros((E, n_p, dim), dtype=self._dtype),
            s=jnp.zeros((E, n_p, n_sig_for(dim)), dtype=self._dtype),
        )

    def state_from(self, u_fn, s_fn, t: float = 0.0) -> State:
        """Staggered-consistent state from co-located analytic/callable ICs."""
        from .errors import interpolate

        u0 = jnp.asarray(interpolate(self.dm, u_fn, t), dtype=self._dtype)
        s0 = jnp.asarray(interpolate(self.dm, s_fn, t), dtype=self._dtype)
        return staggered_init(
            self.params, u0, s0, self.dt, order=self.config.order
        )

    def run(self, T: float, state: State | None = None):
        """Run to time T; returns (final State, seismograms or None)."""
        n_steps = max(int(np.ceil(T / self.dt)), 1)
        state = state if state is not None else self.zero_state()
        if self._wdata is not None:
            from .rk4 import run_rk4, run_rk4_visco

            if self._visco is not None:
                fin, _, seis = jax.jit(
                    lambda p, w, v, st: run_rk4_visco(
                        p, w, v, st, self.dt, n_steps, src=self.sources,
                        damp=self.damp, receivers=self.receivers)
                )(self.params, self._wdata, self._visco, state)
            else:
                fin, seis = jax.jit(
                    lambda p, w, st: run_rk4(
                        p, w, st, self.dt, n_steps, src=self.sources,
                        damp=self.damp, receivers=self.receivers)
                )(self.params, self._wdata, state)
            return fin, (None if seis is None else np.asarray(seis))
        if getattr(self, "_impl", None) == "lane":
            from .lane_major import LaneMajorRunner

            if not hasattr(self, "_lane_runner"):
                self._lane_runner = LaneMajorRunner(
                    self.params, self._ex, self.dt,
                    order=self.config.order, src=self.sources,
                    damp=self.damp, receivers=self.receivers,
                    interpret=jax.devices()[0].platform
                    not in ("tpu", "axon"),
                )
            return self._lane_runner.run(state, n_steps)
        if getattr(self, "_impl", None) == "lane_u":
            from .lane_unstructured import UnstructuredLaneRunner

            if not hasattr(self, "_lane_runner"):
                self._lane_runner = UnstructuredLaneRunner(
                    self.params, self.dt, order=self.config.order,
                    src=self.sources, damp=self.damp,
                    receivers=self.receivers,
                    centroids=np.asarray(self.dm.coords.mean(axis=1)),
                    interpret=jax.devices()[0].platform
                    not in ("tpu", "axon"),
                )
            return self._lane_runner.run(state, n_steps)
        runner = jax.jit(
            lambda p, st: run(
                p,
                st,
                self.dt,
                n_steps,
                order=self.config.order,
                src=self.sources,
                damp=self.damp,
                receivers=self.receivers,
                vel_op=self._vel_op,
                stress_op=self._stress_op,
            )
        )
        fin, seis = runner(self.params, state)
        return fin, (None if seis is None else np.asarray(seis))

    def step_fn(self):
        """The raw jittable (State, t) -> State single-step function."""
        return make_step(
            self.params,
            self.dt,
            order=self.config.order,
            src=self.sources,
            damp=self.damp,
            vel_op=self._vel_op,
            stress_op=self._stress_op,
        )

    def sample(self, state: State) -> np.ndarray | None:
        if self.receivers is None:
            return None
        return np.asarray(sample(self.receivers, state.u))
