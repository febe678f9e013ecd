"""Unstructured lane-major trace exchange — the general-mesh fast path.

Round-1's general path gathered neighbour traces from the FULL field array
at face-node granularity (ops/pallas_kernels.py _gather_traces: E*ftp rows),
measured row-count-bound at ~4 GB/s — the 22x unstructured cliff
(VERDICT.md missing item 2).  This module rebuilds the exchange on three
observations:

1. **Conforming DG face pairing is a bijection on faces.**  Every interior
   face (e, f) has exactly one partner (e2, f2) plus a node permutation
   k2 in a SMALL orientation set (<= 2 in 2D, <= 6 in 3D: the symmetries of
   the facet simplex); boundary faces self-pair with the identity.

2. **Lane takes are the fast gather on TPU** (measured cost model,
   bench/gather_probe.py + BENCH_NOTES): row-granularity takes are
   ROW-COUNT-bound (~4.9 ms for E*nf rows at any width), while lane-axis
   takes are INDEX-bound (~1.1 ms per E indices, FLAT in row count).  So
   the exchange moves whole trace-row panels with ONE lane take per
   consumer face, then resolves (f2, k2) with a short where-chain over
   statically permuted views (the orientation set is tiny), and extracts
   own traces with a one-hot MXU matmul.

3. **Compact payloads.**  Panels hold extracted traces, not fields; for
   the sigma exchange, producer-side traction contraction shrinks the
   panel from n_sig to dim rows per face node
   (make_unstructured_traction_exchange + pallas vel_op_lm_trac).

4. **Locality ordering.**  Elements are pre-permuted along a Morton curve
   (parallel/partition.py) so neighbour lanes are mostly nearby — gather
   locality and future slab-sharding both benefit.

The consumer-side API matches solver/lane_major.make_exchange_lm:
(C*npp, E_pad) lane-major field -> (C*ftpp, E_pad) neighbour traces in
consumer order; ghost/BC semantics stay in the flux coefficients
(ops/elastic.py beta/delta), so no masks are needed here.

Equivalence oracle: ops.pallas_kernels._gather_traces einsum twin
(tests/test_unstructured.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def _rup(x, m):
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class FacePairing:
    """Face-bijection form of a mesh's trace connectivity.

    e2/f2: producer element/face per consumer face (E, nf); k2 (E, nf, nfp):
    consumer node k reads producer face node k2.  Boundary faces self-pair
    (e2 = e, f2 = f, k2 = identity).
    """

    e2: np.ndarray
    f2: np.ndarray
    k2: np.ndarray
    n_p: int
    n_faces: int
    n_fp: int


def derive_face_pairing(nbr: np.ndarray, n_p: int, fnodes) -> FacePairing:
    """Decode (E, nf, nfp) neighbour NODE ids into the face bijection.

    ``nbr`` indexes the flat (E*n_p) node space (ops/elastic.py
    ElasticParams.nbr); every node of a consumer face must come from one
    producer element and one producer face (conforming mesh).
    """
    nbr = np.asarray(nbr)
    E, nf, nfp = nbr.shape
    fn = np.asarray(fnodes)  # (nf, nfp)
    e2 = nbr[:, :, 0] // n_p
    assert (nbr // n_p == e2[:, :, None]).all(), "face spans elements"
    ln = nbr % n_p  # producer-local node ids (E, nf, nfp)

    # f2: the unique producer face whose node set matches
    key = np.sort(ln, axis=2)  # (E, nf, nfp)
    fkey = np.sort(fn, axis=1)  # (nf, nfp)
    match = (key[:, :, None, :] == fkey[None, None, :, :]).all(axis=3)
    assert (match.sum(axis=2) == 1).all(), "no unique producer face"
    f2 = match.argmax(axis=2).astype(np.int64)

    # k2: position of each consumer-slot node within fnodes[f2]
    pos = np.full((nf, n_p), -1, dtype=np.int64)
    for f in range(nf):
        pos[f, fn[f]] = np.arange(nfp)
    k2 = pos[f2[:, :, None], ln]
    assert (k2 >= 0).all()
    return FacePairing(e2=e2, f2=f2, k2=k2, n_p=n_p, n_faces=nf, n_fp=nfp)


def permute_pairing(pr: FacePairing, old_of_new: np.ndarray,
                    new_of_old: np.ndarray) -> FacePairing:
    """Re-express a pairing under an element permutation."""
    return FacePairing(
        e2=new_of_old[pr.e2[old_of_new]],
        f2=pr.f2[old_of_new],
        k2=pr.k2[old_of_new],
        n_p=pr.n_p, n_faces=pr.n_faces, n_fp=pr.n_fp,
    )


def orientation_groups(pr: FacePairing):
    """Group consumer faces by their node permutation k2.

    Returns (gid (E, nf) int group ids, perms (G, nfp)): k2[e, f] ==
    perms[gid[e, f]].  G is bounded by the facet symmetry count (+identity).
    """
    E, nf, nfp = pr.k2.shape
    flat = pr.k2.reshape(E * nf, nfp)
    perms, gid = np.unique(flat, axis=0, return_inverse=True)
    return gid.reshape(E, nf), perms


def _exchange_plan(pr: FacePairing):
    """Static take/select plan shared by both exchange flavours."""
    gid, perms = orientation_groups(pr)
    combo = pr.f2 * perms.shape[0] + gid  # (E, nf)
    return {
        "take_e2": jnp.asarray(pr.e2.T.copy(), jnp.int32),  # (nf, E)
        "combo_sel": jnp.asarray(combo.T.copy(), jnp.int32),
        "face_combos": [np.unique(combo[:, f]) for f in range(pr.n_faces)],
        "perms": perms,
    }


def _take_select(plan, T, C, nf, nfp, E):
    """(C*ftp, E) producer panel -> (C, ftp, E) consumer traces."""
    perms = plan["perms"]
    face_blocks = []
    for f in range(nf):
        tmp = jnp.take(T, plan["take_e2"][f], axis=1)  # (C*ftp, E)
        t4 = tmp.reshape(C, nf, nfp, E)
        acc = None
        for code in plan["face_combos"][f]:
            g, p = divmod(int(code), perms.shape[0])
            view = t4[:, g][:, perms[p], :]  # static row permutation
            if acc is None:
                acc = view
            else:
                acc = jnp.where(
                    (plan["combo_sel"][f] == code)[None, None, :],
                    view, acc)
        face_blocks.append(acc)  # (C, nfp, E)
    return jnp.stack(face_blocks, axis=1).reshape(C, nf * nfp, E)


def make_unstructured_exchange_lm(pr: FacePairing, npp: int, ftpp: int,
                                  C: int, E: int, E_pad: int, fnodes):
    """(C*npp, E_pad) field -> (C*ftpp, E_pad) consumer traces.

    Lane-take formulation, from the measured TPU cost model
    (bench/gather_probe.py at E=83k): row-granularity takes are ROW-COUNT
    bound (~4.9 ms for E*nf rows at any width — unusable), while lane-axis
    takes are INDEX bound (~1.1 ms for E indices, FLAT in row count).  So
    the exchange moves whole trace-row panels with one lane take per
    consumer face:

      1. static own-trace extraction T0 (C, nf, nfp, E), then per-face
         node pre-permutation into each face's CONSUMER order (the pairing
         bijection gives every producer face exactly one consumer) via a
         one-hot einsum — per-lane row permutations cannot ride a static
         matmul, but an (nfp, nfp, E) int8 one-hot contracts on the VPU in
         one pass;
      2. per consumer face f: one lane take tmp = T'[:, :, :, e2[:, f]]
         (flat in rows), then an nf-way where-select over the producer
         face axis (f2 varies per lane).

    Boundary faces self-pair with identity, so ghost/BC semantics stay in
    the flux coefficients exactly as in the einsum path.
    """
    nf, nfp = pr.n_faces, pr.n_fp
    ftp = nf * nfp
    fn = np.asarray(fnodes)

    # own-trace extraction as a one-hot MXU matmul (a static row GATHER
    # measured 1.5 ms at E=83k; the (ftp, n_p) matmul is ~10x cheaper and
    # exact at 'highest' precision since R is one-hot)
    R = np.zeros((ftp, npp), dtype=np.float32)
    R[np.arange(ftp), fn.reshape(-1)] = 1.0
    Rj = jnp.asarray(R)

    # combined (producer face, node permutation) selection per consumer
    # face: group lanes by (f2, pi) — the orientation set is tiny, so the
    # whole consumer-side reorder is a short where-chain over statically
    # permuted views.  (The alternative producer-side one-hot einsum
    # 'cfje,fkje->cfke' lowers to per-lane micro-matmuls: 5.4 ms at E=83k.)
    plan = _exchange_plan(pr)

    def exchange(f_lm: jax.Array) -> jax.Array:
        Fp = f_lm.reshape(C, npp, E_pad)[:, :, :E]
        T = jax.lax.dot_general(
            Rj.astype(f_lm.dtype), Fp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (ftp, C, E)
        T = T.transpose(1, 0, 2).reshape(C * ftp, E)
        out = _take_select(plan, T, C, nf, nfp, E)
        out = jnp.pad(out, ((0, 0), (0, ftpp - ftp), (0, E_pad - E)))
        return out.reshape(C * ftpp, E_pad)

    return exchange


def make_panel_gather(
        pr: FacePairing, npp: int, ftpp: int, C: int, E: int, E_pad: int,
        fnodes, nrm_lm: jax.Array | None = None,
        voigt: np.ndarray | None = None, n_sig: int | None = None):
    """Raw per-face lane-take panels + static plan for the IN-KERNEL
    select (ops/pallas_kernels.py vel_op_lm_trac_sel / stress_op_lm_sel).

    Splits the exchange: XLA does extraction (+ traction contraction when
    ``nrm_lm`` is given) and the nf lane takes; the consumer-side
    (f2, pi)-select, sign flip, and trace assembly move INTO the operator
    kernel (VMEM) — removing the select passes and the assembled-trace HBM
    round-trip.

    Returns (panels_fn: field_lm -> (nf*rows_pad, E_pad), combo (8, E_pad)
    int32, sign (8, E_pad) or None, selcfg).
    """
    nf, nfp = pr.n_faces, pr.n_fp
    ftp = nf * nfp
    fn = np.asarray(fnodes)
    Cin = n_sig if nrm_lm is not None else C
    R = np.zeros((ftp, npp), dtype=np.float32)
    R[np.arange(ftp), fn.reshape(-1)] = 1.0
    Rj = jnp.asarray(R)
    rows_pad = _rup(C * ftp, 8)

    gid, perms_np = orientation_groups(pr)
    combo_np = pr.f2 * perms_np.shape[0] + gid  # (E, nf)
    take_e2 = jnp.asarray(pr.e2.T.copy(), jnp.int32)
    combo = np.zeros((8, E_pad), dtype=np.int32)
    combo[:nf, :E] = combo_np.T
    combo = jnp.asarray(combo)
    face_combos = tuple(
        tuple(int(x) for x in np.unique(combo_np[:, f]))
        for f in range(nf))
    perms = tuple(tuple(int(x) for x in row) for row in perms_np)
    selcfg = (C, nf, nfp, ftp, ftpp, rows_pad, face_combos, perms)

    sign = None
    if nrm_lm is not None:
        boundary = (pr.e2 == np.arange(E)[:, None]) & (
            pr.f2 == np.arange(nf)[None, :])
        s = np.zeros((8, E_pad), dtype=np.float32)
        s[:nf, :E] = np.where(boundary, 1.0, -1.0).T
        sign = jnp.asarray(s)

    def own_rows_fn(f_lm: jax.Array) -> jax.Array:
        """Stage 1: own-face rows (rows_pad, E) — the one-hot restriction
        (+ traction contraction on the sigma side).  This is the part a
        producer-side kernel epilogue could emit for free; the takes
        below are the irreducible neighbour gather."""
        Fp = f_lm.reshape(Cin, npp, E_pad)[:, :, :E]
        T = jax.lax.dot_general(
            Rj.astype(f_lm.dtype), Fp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (ftp, Cin, E)
        if nrm_lm is not None:
            trac = []
            for c in range(C):
                acc = None
                for dd in range(C):
                    nd = nrm_lm[dd * ftpp : dd * ftpp + ftp, :E]
                    term = nd * T[:, voigt[c, dd], :]
                    acc = term if acc is None else acc + term
                trac.append(acc)
            T = jnp.stack(trac, axis=0).reshape(C * ftp, E)
        else:
            T = T.transpose(1, 0, 2).reshape(C * ftp, E)
        if rows_pad != C * ftp:
            T = jnp.pad(T, ((0, rows_pad - C * ftp), (0, 0)))
        return T

    def takes_fn(T: jax.Array) -> jax.Array:
        """Stage 2: the nf neighbour lane-takes in consumer order."""
        panels = jnp.concatenate(
            [jnp.take(T, take_e2[f], axis=1) for f in range(nf)], axis=0)
        if E_pad != E:
            panels = jnp.pad(panels, ((0, 0), (0, E_pad - E)))
        return panels

    def panels_fn(f_lm: jax.Array) -> jax.Array:
        return takes_fn(own_rows_fn(f_lm))

    panels_fn.own_rows_fn = own_rows_fn
    panels_fn.takes_fn = takes_fn
    return panels_fn, combo, sign, selcfg


def make_unstructured_traction_exchange(
        pr: FacePairing, npp: int, ftpp: int, dim: int, n_sig: int,
        E: int, E_pad: int, fnodes, nrm_lm: jax.Array, voigt: np.ndarray):
    """(n_sig*npp, E_pad) sigma field -> (dim*ftpp, E_pad) NEIGHBOUR
    TRACTIONS t_c = n_consumer . sigma_nbr in consumer order.

    The contraction happens on the PRODUCER side with its own normals
    (n_consumer = -n_producer on conforming faces, so interior lanes flip
    sign; boundary self-pairs keep +).  This halves the sigma-exchange
    panel from n_sig to dim rows per face node — the same traffic trick as
    the fused v2 kernels — and pairs with
    ops.pallas_kernels.vel_op_lm_trac.

    ``nrm_lm``: (dim*ftpp, E{,_pad}) lane-major face-node-expanded normals
    (PallasOpData.nrm, already element-permuted by the runner).
    """
    nf, nfp = pr.n_faces, pr.n_fp
    ftp = nf * nfp
    fn = np.asarray(fnodes)
    R = np.zeros((ftp, npp), dtype=np.float32)
    R[np.arange(ftp), fn.reshape(-1)] = 1.0
    Rj = jnp.asarray(R)
    plan = _exchange_plan(pr)

    # per consumer (face, lane) sign: -1 interior (normal flip), +1 self
    boundary = (pr.e2 == np.arange(E)[:, None]) & (
        pr.f2 == np.arange(nf)[None, :])  # (E, nf)
    sign = np.where(boundary, 1.0, -1.0).astype(np.float32)  # (E, nf)
    sign_rows = jnp.asarray(np.repeat(sign.T, nfp, axis=0))  # (ftp, E)

    def exchange(sig_lm: jax.Array) -> jax.Array:
        Fp = sig_lm.reshape(n_sig, npp, E_pad)[:, :, :E]
        T6 = jax.lax.dot_general(
            Rj.astype(sig_lm.dtype), Fp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (ftp, n_sig, E)
        # producer-normal contraction -> (dim, ftp, E) tractions
        trac = []
        for c in range(dim):
            acc = None
            for d in range(dim):
                nd = nrm_lm[d * ftpp : d * ftpp + ftp, :E]
                term = nd * T6[:, voigt[c, d], :]
                acc = term if acc is None else acc + term
            trac.append(acc)
        T = jnp.stack(trac, axis=0).reshape(dim * ftp, E)
        out = _take_select(plan, T, dim, nf, nfp, E)
        out = out * sign_rows[None]
        out = jnp.pad(out, ((0, 0), (0, ftpp - ftp), (0, E_pad - E)))
        return out.reshape(dim * ftpp, E_pad)

    return exchange
