"""Domain-decomposed FWI gradients on UNSTRUCTURED meshes: the
energy-conjugation custom VJPs of solver/lane_diff.py applied to the
Morton-block sharded in-kernel-select operators.

This is the last cell of the inversion parallel-axis matrix — the
reference's flagship combination (unstructured AND distributed,
SURVEY.md §3/§9.3) made differentiable:

    structured mesh  | single chip: LaneDiffFwi(engine="lane"/"merged")
                     | domain-dec.: parallel/lane_diff_sharded.py and
                     |              parallel/merged_diff_sharded.py
    unstructured mesh| single chip: LaneDiffFwi(engine="lane_u")
                     | domain-dec.: THIS MODULE

Why the conjugation identities survive sharding unchanged: the sharded
unstructured operators (parallel/unstructured_sharded.py: shard-local
Pallas (f2, pi)-select kernels + one all-gathered boundary trace panel)
compute exactly the GLOBAL material-free operators — partition
invariance is tested — and the conjugation weights (reference mass
matrix x per-element detJ) are block-diagonal per element, hence
shard-local.  The transpose of each sharded operator is therefore ONE
application of the OTHER sharded operator, halo all_gather included, so
the adjoint sweep's cross-chip traffic is the same compact trace panel
as the forward's.  Exactness vs the single-chip lane_u engine is
asserted in tests/test_unstructured_diff_sharded.py.

The exchange index plans (lane takes, halo gather columns, select
combos) ride as integer leaves of the conjugation-weight tree ``w``
(structural float0 cotangents, solver/lane_diff._ct_zeros), so every
E-sized operand stays a jit ARGUMENT (the axon remote-compile size
rule, solver/lane_major.py).  The FWI scaffold (forward/misfit/synth/
vg loop) lives once in parallel/dd_diff_base.py.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.pallas_kernels import stress_op_lm_sel, vel_op_lm_trac_sel
from ..solver.lane_diff import (_mass_weights, _material_free,
                                make_conjugated_vjp)
from .dd_diff_base import DomainDecomposedFwi
from .unstructured_sharded import AXIS, ShardedUnstructuredRunner

# w leaves that are shard-stacked along a leading P axis (un-stacked
# inside the shard_map body before reaching the custom-vjp ops)
_W_STACKED = ("take", "gather", "combo", "sign")


class ShardedUnstructuredDiffFwi(DomainDecomposedFwi):
    """Morton-block-sharded FWI value-and-gradient on arbitrary
    conforming meshes."""

    def __init__(
        self,
        p0,
        dm,
        dt: float,
        n_steps: int,
        shots,
        receivers,
        observed,
        n_shards: int,
        *,
        order: int = 4,
        damp=None,
        segment: int | None = None,
        block: int = 256,
        interpret: bool | None = None,
        devices=None,
    ):
        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        if receivers is None:
            raise ValueError("ShardedUnstructuredDiffFwi needs receivers")
        self.runner = r = ShardedUnstructuredRunner(
            _material_free(p0), dt, n_shards,
            centroids=np.asarray(dm.coords.mean(axis=1)),
            order=order, src=None, damp=damp, receivers=receivers,
            block=block, interpret=interpret, devices=devices)
        self.order = order
        # mass-conjugation weights on the first E lanes of E_pad (dead
        # tail lanes are inert self-paired elements), plus the exchange
        # plan: rmat replicated, takes/gathers/combos/signs shard-stacked
        self.w = _mass_weights(dm, r)
        self.w.update(rmat=r._rmat, take=r._take, gather=r._gather,
                      combo=r._combo, sign=r._sign)
        self._lanes = np.arange(r.E)
        self._L = r.E_pad
        self._finish_init(p0, n_steps, shots, observed, segment)

    # --- hooks ----------------------------------------------------------
    def _pack_shot(self, src):
        return self.runner._pack_sources(src, self.runner._new_of_old)

    def _make_ops(self):
        if hasattr(self, "_ops"):
            return self._ops
        r = self.runner
        d = r.d
        blk, itp = r.block, r.interpret

        # ww doubles as the runner's exchange aux (rmat/gather/take keys)
        def a_prim(dd, ww, sf):
            return vel_op_lm_trac_sel(
                dd, sf, r._panels_t(dd, ww, sf), ww["combo"], ww["sign"],
                r._selcfg, blk, itp)

        def b_prim(dd, ww, uf):
            return stress_op_lm_sel(
                dd, uf, r._panels_u(dd, ww, uf), ww["combo"],
                r._selcfg, blk, itp)

        self._ops = make_conjugated_vjp(a_prim, b_prim, d.dim, d.n_sig,
                                        d.npp, self.dtype)
        return self._ops

    def _d_specs(self):
        lane = P(None, AXIS)
        return dataclasses.replace(
            self.runner.d, dr=P(), lift=P(), rmat=P(), drr=P(),
            ginv=lane, nrm=lane, fsc=lane, beta=lane, delta=lane,
            irho=lane, lam=lane, mu=lane)

    def _w_specs(self):
        lane = P(None, AXIS)
        return {"Mn": P(), "Mninv": P(), "detj": lane, "idetj": lane,
                "rmat": P(), "take": P(AXIS), "gather": P(AXIS),
                "combo": P(AXIS), "sign": P(AXIS)}

    def _unstack_w(self, wwg):
        ww = dict(wwg)
        for k in _W_STACKED:
            ww[k] = ww[k][0]
        return ww

    def _loc_width(self):
        return self.runner.E_loc

    def _aux(self):
        r = self.runner
        aux = {}
        if r.damp_u is not None:
            aux["damp_u"], aux["damp_s"] = r.damp_u, r.damp_s
        if r.rcv is not None:
            aux["rcv_elems"] = r.rcv["elems"]
            aux["rcv_w"] = r.rcv["w"]
        return aux
