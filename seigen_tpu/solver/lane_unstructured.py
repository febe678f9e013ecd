"""Lane-major LF2/LF4 runner for GENERAL (unstructured) meshes.

Same fully lane-major scan state and fused Pallas operator kernels as
solver/lane_major.py — only the trace exchange differs: the roll-based
structured exchange is replaced by the face-bijection row-take exchange
(ops/unstructured_exchange.py), and the class-major element ordering by a
Morton locality ordering.  This closes round-1's 22x structured/unstructured
cliff (VERDICT.md missing item 2): the reference's production
explosive-source runs used Gmsh unstructured triangles (SURVEY.md §3).

Correctness oracle: the general einsum path (tests/test_unstructured.py).
"""

from __future__ import annotations

import numpy as np

from ..ops.elastic import ElasticParams, voigt_map
from ..ops.pallas_kernels import (
    stress_op_lm_sel,
    vel_op_lm_trac,
    vel_op_lm_trac_sel,
)
from ..ops.unstructured_exchange import (
    derive_face_pairing,
    make_panel_gather,
    make_unstructured_exchange_lm,
    make_unstructured_traction_exchange,
    permute_pairing,
)
from .lane_major import LaneMajorRunner


class UnstructuredLaneRunner(LaneMajorRunner):
    """Lane-major runner for arbitrary conforming simplicial meshes.

    ``centroids`` (E, dim), when given, drives a Morton locality ordering
    (neighbour gather rows become mostly short-range); identity otherwise.
    """

    def __init__(self, p: ElasticParams, dt: float, *, centroids=None,
                 fused_select: bool = True, **kw):
        self._centroids = None if centroids is None else np.asarray(centroids)
        # fused_select: run the consumer-side (f2, pi)-select inside the
        # Pallas operator kernels (panels path) instead of as XLA passes
        self._fused_select = fused_select
        super().__init__(p, None, dt, **kw)

    def _element_perm(self):
        E = self.E
        if self._centroids is None:
            ident = np.arange(E, dtype=np.int64)
            return ident, ident.copy()
        from ..parallel.partition import morton_order

        old_of_new = np.asarray(morton_order(self._centroids),
                                dtype=np.int64)
        new_of_old = np.empty(E, dtype=np.int64)
        new_of_old[old_of_new] = np.arange(E)
        return old_of_new, new_of_old

    def _make_exchanges(self):
        p, d, E, E_pad = self.p, self.d, self.E, self.E_pad
        pr = derive_face_pairing(np.asarray(p.nbr), p.n_p, p.fnodes)
        pr = permute_pairing(pr, self._old_of_new, self._new_of_old)
        self.pairing = pr
        if self._fused_select:
            self._pg_u = make_panel_gather(
                pr, d.npp, d.ftpp, d.dim, E, E_pad, p.fnodes)
            self._pg_t = make_panel_gather(
                pr, d.npp, d.ftpp, d.dim, E, E_pad, p.fnodes,
                nrm_lm=d.nrm, voigt=voigt_map(d.dim), n_sig=d.n_sig)
            return (lambda x: x), (lambda x: x)  # unused in this mode
        ex_u = make_unstructured_exchange_lm(
            pr, d.npp, d.ftpp, d.dim, E, E_pad, p.fnodes)
        # sigma traces ride as pre-contracted tractions (dim rows instead
        # of n_sig): consumed by vel_op_lm_trac via the _vel override
        ex_t = make_unstructured_traction_exchange(
            pr, d.npp, d.ftpp, d.dim, d.n_sig, E, E_pad, p.fnodes,
            d.nrm, voigt_map(d.dim))
        return ex_u, ex_t

    def _vel(self, d, s_lm):
        if self._fused_select:
            fn, combo, sign, selcfg = self._pg_t
            return vel_op_lm_trac_sel(d, s_lm, fn(s_lm), combo, sign,
                                      selcfg, self.block, self.interpret)
        return vel_op_lm_trac(d, s_lm, self.ex_s(s_lm), self.block,
                              self.interpret)

    def _stress(self, d, u_lm, cmat=None):
        if self._fused_select:
            fn, combo, _, selcfg = self._pg_u
            return stress_op_lm_sel(d, u_lm, fn(u_lm), combo, selcfg,
                                    self.block, self.interpret, cmat=cmat)
        from ..ops.pallas_kernels import stress_op_lm

        return stress_op_lm(d, u_lm, self.ex_u(u_lm), self.block,
                            self.interpret, cmat=cmat)
