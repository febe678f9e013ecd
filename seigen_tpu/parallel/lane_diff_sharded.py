"""Domain-decomposed FWI gradients: the energy-conjugation custom VJPs of
solver/lane_diff.py applied to the SLAB-SHARDED lane operators.

Why this works unchanged: the conjugation identities

    A^T  = -detJ (M x K^-1)  B'  detJ^-1 (M^-1 x I)
    B'^T = -detJ (M x I)     A   detJ^-1 (M^-1 x K)

hold for the GLOBAL material-free operators, and the sharded operators
(parallel/lane_sharded.py: shard-local Pallas kernels + halo-plane
ppermute exchange) compute exactly the global operators (partition
invariance is tested).  The mass weights are block-diagonal PER ELEMENT,
so they apply shard-locally; the transpose of each sharded operator is
therefore ONE application of the OTHER sharded operator — halo exchange
included — conjugated by local weights.  No collective ever needs
hand-transposing: the adjoint sweep's halo traffic is just the forward
exchange of the conjugate field.

This completes the parallel-axis matrix for inversion: shots scale by
data parallelism (solver/lane_diff.vg_factory_sharded, psum'd grads) and
a single too-big-for-one-chip shot scales by domain decomposition (this
module, v1 lane ops; parallel/merged_diff_sharded.py runs the same
identities on the v3 merged ops; parallel/unstructured_diff_sharded.py
on the Morton-block unstructured ops).  Gradient equivalence vs the
single-chip lane path is verified on virtual devices in
tests/test_lane_diff_sharded.py.  The FWI scaffold lives once in
parallel/dd_diff_base.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.pallas_kernels import stress_op_lm, vel_op_lm
from ..solver.lane_diff import (_mass_weights, _material_free,
                                make_conjugated_vjp)
from .dd_diff_base import DomainDecomposedFwi
from .lane_sharded import AXIS, ShardedLaneRunner


class ShardedLaneDiffFwi(DomainDecomposedFwi):
    """Mesh-sharded FWI value-and-gradient on the v1 lane operators."""

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
            raise ValueError("ShardedLaneDiffFwi needs receivers")
        self.runner = r = ShardedLaneRunner(
            _material_free(p0), ex, dt, n_shards, order=order, src=None,
            damp=damp, receivers=receivers, block=block,
            interpret=interpret, devices=devices)
        self.order = order
        self._lanes = np.arange(r.E)
        self._L = r.E
        # mass-conjugation weights, global lane rows (sharded by lanes);
        # the boundary mask travels in w as float rows so the shared
        # conjugation factory sees all-float cotangent structure
        self.w = _mass_weights(dm, r, lanes=self._lanes, L=r.E)
        self.w["mask"] = r.self_mask.astype(r.dtype)
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

        def a_prim(dd, ww, sf):
            tr = r._exchange_loc(sf, ww["mask"] != 0, "s", d.n_sig)
            return vel_op_lm(dd, sf, tr, blk, itp)

        def b_prim(dd, ww, uf):
            tr = r._exchange_loc(uf, ww["mask"] != 0, "u", d.dim)
            return stress_op_lm(dd, uf, tr, blk, itp)

        self._ops = make_conjugated_vjp(a_prim, b_prim, d.dim, d.n_sig,
                                        d.npp, self.dtype)
        return self._ops

    def _d_specs(self):
        d = self.runner.d
        lane = P(None, AXIS)
        return type(d)(
            dr=P(), lift=P(), rmat=P(), drr=P(),
            ginv=lane, nrm=lane, fsc=lane, beta=lane, delta=lane,
            irho=lane, lam=lane, mu=lane,
            dim=d.dim, n_p=d.n_p, npp=d.npp, ftp=d.ftp, ftpp=d.ftpp,
            n_sig=d.n_sig, E=d.E)

    def _w_specs(self):
        lane = P(None, AXIS)
        return {"Mn": P(), "Mninv": P(), "detj": lane, "idetj": lane,
                "mask": lane}

    def _loc_width(self):
        return self.runner.E_loc

    def _aux(self):
        r = self.runner
        aux = r._aux_global()
        return {k: v for k, v in aux.items()
                if k.startswith("rcv") or k.startswith("damp")}
