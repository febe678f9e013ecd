"""Domain-decomposed FWI gradients at the v3 (merged-kernel) rate.

parallel/lane_diff_sharded.py gave the inversion a domain-decomposition
axis, but its forward+adjoint sweeps run the v1 lane operators — the
sharded analog of LaneDiffFwi(engine="lane"), a generation behind the
merged engine the production forward path uses.  This module is the
sharded analog of LaneDiffFwi(engine="merged"): the energy-conjugation
custom VJPs (solver/lane_diff.make_conjugated_vjp) wrap the SLAB-SHARDED
exchange-in-kernel merged operators (parallel/fused_sharded.py).

Per-op trace seeding, as in the single-chip merged diff ops
(solver/lane_diff.make_merged_diff_ops): each application recomputes its
input's own-face traces (cheap row restriction, + producer normal
contraction for tractions), ships the compact first/last supercell trace
planes to the slab neighbours (ShardedFusedRunner._fill_halo — ONE
ppermute pair), and runs the merged kernel whose windowed BlockSpecs do
the exchange in-register.  The transpose of each sharded operator is ONE
application of the other — including the halo ppermute, because the
sharded operators compute exactly the GLOBAL material-free operators
(partition invariance tested) and the conjugation weights are
per-element.  Gradient equivalence vs the single-chip merged engine is
verified at 2/4 virtual shards in tests/test_merged_diff_sharded.py.
The FWI scaffold lives once in parallel/dd_diff_base.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.merged_kernels import stress_merged, vel_merged
from ..solver.lane_diff import (_mass_weights, _material_free,
                                make_conjugated_vjp)
from .dd_diff_base import DomainDecomposedFwi
from .fused_sharded import AXIS, ShardedFusedRunner


class ShardedMergedDiffFwi(DomainDecomposedFwi):
    """Slab-sharded FWI value-and-gradient on the merged (v3) operators
    (LF4-only, structured meshes)."""

    def __init__(
        self,
        p0,
        dm,
        ex,
        dt: float,
        n_steps: int,
        shots,
        receivers,
        observed,
        n_shards: int,
        *,
        damp=None,
        segment: int | None = None,
        block: int | None = None,
        interpret: bool | None = None,
        devices=None,
        packed: bool | str = False,
    ):
        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        if receivers is None:
            raise ValueError("ShardedMergedDiffFwi needs receivers")
        self.runner = r = ShardedFusedRunner(
            _material_free(p0), ex, dt, n_shards, order=4, src=None,
            damp=damp, receivers=receivers, block=block,
            interpret=interpret, devices=devices, packed=packed)
        self.order = 4
        self._lanes = r._lane(np.arange(r.E))
        self._L = r.Ls
        # conjugation weights at the global state lanes (detj placed at
        # real lanes, dead class-padding lanes 1; packed: per-ROW (npp,
        # Ls) detj + block-diagonal parity mass embedding); the boundary
        # mask and trace-seed tables ride in w so every operand is a jit
        # argument
        self.w = _mass_weights(
            dm, r, lanes=self._lanes, L=r.Ls,
            pars=(r._epar(np.arange(r.E)) if r.n_par > 1 else None))
        self.w.update(mask=r.mask, nrm=r._nrm_exp, rmat=r._rmat)
        # stress damp rows (production folds them into stress_axpy; the
        # diff path damps via compose_lf_step's post)
        d = r.d
        self._damp_s = (None if d.damp is None
                        else jnp.tile(d.damp, (d.n_sig, 1)))
        self._finish_init(p0, n_steps, shots, observed, segment)

    # --- hooks ----------------------------------------------------------
    def _pack_shot(self, src):
        # the diff step is (state -> state): STATE-lane packing only,
        # no trace patches (parallel/fused_sharded._pack_state_sources)
        return self.runner._pack_state_sources(src)

    def _make_ops(self):
        if hasattr(self, "_ops"):
            return self._ops
        r = self.runner
        d, plan, itp = r.d, r.plan, r.interpret

        def a_prim(dd, ww, sig_lm):
            trs = r._traction_traces_loc(sig_lm, ww["nrm"], ww["rmat"])
            return vel_merged(plan, dd, sig_lm, r._fill_halo(trs),
                              ww["mask"], itp)[0]

        def b_prim(dd, ww, u_lm):
            trs = r._field_traces_loc(u_lm, ww["rmat"], d.dim)
            return stress_merged(plan, dd, u_lm, r._fill_halo(trs),
                                 ww["mask"], itp)[0]

        self._ops = make_conjugated_vjp(a_prim, b_prim, d.dim, d.n_sig,
                                        d.npp, self.dtype)
        return self._ops

    def _d_specs(self):
        d = self.runner.d
        lane = P(None, AXIS)
        return dataclasses.replace(
            d, drr=P(), lift=P(), erep=P(), geo=lane,
            damp=None if d.damp is None else lane,
            gexp=None if d.gexp is None else P())

    def _w_specs(self):
        lane = P(None, AXIS)
        return {"Mn": P(), "Mninv": P(), "detj": lane, "idetj": lane,
                "mask": lane, "nrm": P(None, None, AXIS), "rmat": P()}

    def _loc_width(self):
        return self.runner.plan.Ls

    def _aux(self):
        r = self.runner
        aux = {}
        if r.damp_u is not None:
            # the forward runner stores damp UNtiled (npp, Ls) and
            # broadcasts in post_u; dd_diff_base's shared post multiplies
            # full (C*npp, L) fields, so tile here
            import jax.numpy as jnp

            aux["damp_u"] = jnp.tile(r.damp_u, (r.d.dim, 1))
            aux["damp_s"] = self._damp_s
        if r.rcv is not None:
            aux["rcv_elems"] = r.rcv["elems"]
            aux["rcv_w"] = r.rcv["w"]
        return aux
