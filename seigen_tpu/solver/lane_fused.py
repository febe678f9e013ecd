"""Exchange-fused lane-major LF4 solver — the v2 TPU pipeline.

Builds on solver/lane_major.py (v1) with the round-2 traffic redesign
(ops/fused_kernels.py): every operator kernel emits the face traces of its
output (tractions for stress fields), so the exchange is a pure permutation
of compact (dim*ftpp, E) trace arrays — per (class, face) one contiguous
row block from the neighbour class's lanes, grid-rolled, sign-flipped
(tractions: consumer normal = -producer normal), boundary-masked.  No
field-array gathers, no separate axpy passes (folded into the final kernel
of each half-step, with sponge damping), and the stress traces ride the
scan carry across steps.

LF4 only (the axpy fusion encodes the dt^3/24 correction); order-2 runs use
the v1 path.  Equivalence oracle: LaneMajorRunner / general run()
(tests/test_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.elastic import ElasticParams, voigt_map
from ..ops.fused_kernels import (
    DEFAULT_BLOCK,
    FusedOpData,
    _dot,
    build_fused_data,
    stress2_op,
    vel2_op,
)
from ..ops.structured_exchange import StructuredExchange
from .lane_major import class_major_perm, from_lm, to_lm
from .receivers import ReceiverData
from .source import SourceData, ricker
from .timestep import State


def _rup(x, m):
    return ((x + m - 1) // m) * m


def derive_pairing(ex: StructuredExchange):
    """Producer-side face index f2 and node permutation pi per (t, f).

    ex.nodes[t, f] holds the neighbour's local node ids in CONSUMER order;
    the producer emits its own-face traces in fnodes order, so the exchange
    re-reads rows (f2, pi).  f2 is the unique neighbour face whose node set
    matches; pi[j] locates nodes[t, f][j] within fnodes[f2].
    """
    nf, nfp = ex.n_faces, ex.n_fp
    fsets = [frozenset(ex.own_nodes[f].tolist()) for f in range(nf)]
    f2 = np.zeros((ex.m, nf), dtype=np.int64)
    pi = np.zeros((ex.m, nf, nfp), dtype=np.int64)
    for t in range(ex.m):
        for f in range(nf):
            s = frozenset(ex.nodes[t, f].tolist())
            matches = [g for g in range(nf) if fsets[g] == s]
            assert len(matches) == 1, (t, f, s)
            g = matches[0]
            f2[t, f] = g
            pos = {int(n): j for j, n in enumerate(ex.own_nodes[g])}
            for j in range(nfp):
                pi[t, f, j] = pos[int(ex.nodes[t, f, j])]
    return f2, pi


def make_trace_exchange_take(ex: StructuredExchange, d: FusedOpData,
                             C: int, E: int, E_pad: int, negate: bool):
    """(C*ftpp, E_pad) producer-emitted traces -> consumer-ordered traces.

    NEGATIVE RESULT (kept for reference): measured SLOWER than the
    per-(class, face) loop below on TPU at E=83k (x_t3 1.66 -> 2.41 ms/3):
    the row take (5760 x 6.9KB rows) + grouped roll scatters beat the
    many-small-copies loop on op count but lose on copy efficiency.

    Vectorized over classes: the (row, class) source permutation is ONE
    take on the (R*m, NC) row-major view (the per-(class, face) loop of the
    v1 exchange was XLA-op-launch-bound: ~500 small slice ops per
    application); the residual one-axis +-1 supercell rolls are applied to
    the six (axis, dir) row groups; boundary faces select the consumer's
    own rows (an identity view) via one masked where.

    negate=True for traction traces (conforming faces have opposite
    normals: consumer t_nbr = -producer t_own); boundary faces always take
    the consumer's own rows unnegated (ops/elastic.py ghost convention).
    """
    dim = len(ex.grid)
    NC = int(np.prod(ex.grid))
    m = ex.m
    nf, nfp = ex.n_faces, ex.n_fp
    f2, pi = derive_pairing(ex)
    ftp = nf * nfp
    R_real = C * ftp

    # source index for output (row=(c,f,k), class=t):
    #   IDX[r*m + t] = (c*ftpp + f2*nfp + pi) * m + t2
    IDX = np.zeros((R_real, m), dtype=np.int32)
    grp = np.zeros((R_real, m), dtype=np.int64)  # 0 = no roll
    g_id = {}
    for ax in range(dim):
        for s in (-1, 1):
            g_id[(ax, s)] = len(g_id) + 1
    for t in range(m):
        for f in range(nf):
            t2 = int(ex.nbr_class[t, f])
            g = int(f2[t, f])
            sh = ex.shift[t, f]
            # conforming simplicial faces cross at most one supercell plane
            assert int(np.count_nonzero(sh)) <= 1, (t, f, sh)
            gg = 0
            for ax in range(dim):
                if sh[ax]:
                    gg = g_id[(ax, int(sh[ax]))]
            for c in range(C):
                rows = c * ftp + f * nfp + np.arange(nfp)
                IDX[rows, t] = (c * d.ftpp + g * nfp + pi[t, f]) * m + t2
                grp[rows, t] = gg
    IDX_j = jnp.asarray(IDX.reshape(-1))

    groups = []  # (axis, dir, row-index array into the (R_real*m) space)
    for (ax, s), gid in g_id.items():
        rows = np.nonzero(grp.reshape(-1) == gid)[0]
        if len(rows):
            groups.append((ax, s, jnp.asarray(rows.astype(np.int32))))

    any_mask = bool(ex.self_mask.any())
    if any_mask:
        # (nf, m, NC) -> broadcast over (C, ., nfp, ., .)
        mk = np.zeros((nf, m, NC), dtype=bool)
        for t in range(m):
            for f in range(nf):
                mk[f, t] = ex.self_mask[t, f].reshape(-1)
        mask_j = jnp.asarray(mk)[None, :, None]  # (1, nf, 1, m, NC)

    pad_rows = d.ftpp - ftp
    if any_mask and pad_rows:
        # own rows: OWN_IDX[r*m + t] = (c*ftpp + f*nfp + k)*m + t
        rows_real = np.concatenate(
            [c * d.ftpp + np.arange(ftp) for c in range(C)])  # (R_real,)
        OWN_IDX = (rows_real[:, None] * m + np.arange(m)[None, :])
        OWN_IDX_j = jnp.asarray(OWN_IDX.reshape(-1).astype(np.int32))

    def exchange(tr_lm: jax.Array) -> jax.Array:
        # (C*ftpp, E) -> (R*m, NC) row-major (row, class) view
        flat = tr_lm[:, : m * NC].reshape(C * d.ftpp * m, NC)
        out = jnp.take(flat, IDX_j, axis=0)  # (R_real*m, NC)
        for ax, s, rows in groups:
            sub = out[rows].reshape((len(rows),) + ex.grid)
            sub = jnp.roll(sub, -s, axis=1 + ax)
            out = out.at[rows].set(sub.reshape(len(rows), NC))
        if negate:
            out = -out
        if any_mask:
            own = (flat[: R_real * m] if pad_rows == 0
                   else jnp.take(flat, OWN_IDX_j, axis=0))
            o5 = own.reshape(C, nf, nfp, m, NC)
            x5 = out.reshape(C, nf, nfp, m, NC)
            out = jnp.where(mask_j, o5, x5).reshape(R_real * m, NC)
        # back to (C*ftpp, E_pad) lane-major, re-inserting row padding
        out = out.reshape(C, ftp, m * NC)
        if pad_rows:
            out = jnp.pad(out, ((0, 0), (0, pad_rows), (0, 0)))
        out = out.reshape(C * d.ftpp, m * NC)
        if E_pad != m * NC:
            out = jnp.pad(out, ((0, 0), (0, E_pad - m * NC)))
        return out

    return exchange


def _exchange_block_size(ex: StructuredExchange) -> int | None:
    """Lane-block size for the Pallas exchange kernel, or None if the mesh
    doesn't satisfy its constraints (small/periodic/odd-shaped meshes fall
    back to the XLA loop exchange)."""
    NC = int(np.prod(ex.grid))
    if ex.self_mask.size and not ex.self_mask.any():
        # periodic mesh: flat-roll wrap planes are NOT boundary-masked, so
        # the windowed kernel would read wrapped junk — use the loop path
        return None
    if ex.m > 16:
        return None
    # Any block size works regardless of shift magnitude: a face with shift
    # s reads blocks (j + s//bx, j + s//bx + 1); blocks clipped out of
    # [0, NB) are only read by lanes whose element+shift leaves [0, NC),
    # and on a bounded mesh those faces are boundary faces, replaced by own
    # traces via the mask (see make_pallas_exchange docstring).  Measured
    # preference (BENCH_NOTES round 2): larger blocks amortize the per-face
    # window bookkeeping — n=24: bx 768 = 2.43 G vs 256 = 2.23 G; n=40:
    # 512 = 1.87 G vs 256 = 1.73 G.  Order: best-measured first, need
    # bx | NC and 128 | bx.
    for bx in (768, 1024, 512, 1536, 384, 256, 2048, 2304, 3072, 4096,
               128):
        if NC % bx == 0:
            return bx
    return None


def _flat_strides(grid):
    strides = []
    s = 1
    for g in reversed(grid):
        strides.append(s)
        s *= g
    return tuple(reversed(strides))


def _canonical_shift(ex: StructuredExchange, t: int, f: int):
    """True (unwrapped) per-axis neighbour offset for face (t, f), or None.

    ``ex.shift`` is only defined MODULO the grid — the loop exchange rolls
    per axis, so -1 and +1 coincide on a period-2 axis and either
    representative works there.  The windowed Pallas kernel reads flat
    windows WITHOUT the per-axis mod, so it needs the true offset: the one
    whose out-of-range consumer set exactly equals the boundary mask
    (self_mask).  Returns the offset tuple, or None when no unique
    candidate matches (caller falls back to the loop exchange).
    """
    import itertools

    grid = ex.grid
    dim = len(grid)
    base = [int(ex.shift[t, f, a]) for a in range(dim)]
    mask = np.asarray(ex.self_mask[t, f]).reshape(grid)
    options = []
    for s, g in zip(base, grid):
        if s == 0:
            options.append([0])
        else:
            alt = s - g * (1 if s > 0 else -1)
            options.append(sorted({s, alt}, key=abs))
    idx = np.indices(grid)
    matches = []
    for choice in itertools.product(*options):
        out = np.zeros(grid, dtype=bool)
        for a in range(dim):
            c = idx[a] + choice[a]
            out |= (c < 0) | (c >= grid[a])
        if np.array_equal(out, mask):
            matches.append(choice)
    return matches[0] if len(matches) == 1 else None


def make_pallas_exchange(ex: StructuredExchange, d: FusedOpData, C: int,
                         E: int, E_pad: int, negate: bool,
                         interpret: bool = False):
    """Pallas TPU trace exchange: the XLA loop formulation is op-bound
    (~500 small slice/roll ops, ~123-145 GB/s effective; the vectorized
    take variant measured even slower).  This kernel does the whole
    permutation per class in one pass: per face, a lane-shifted window of
    the neighbour class's trace block (two lane-adjacent input blocks,
    static offsets), a one-hot row-permutation matmul (f2 + pi), sign flip,
    and a boundary-mask select against the own-trace block.

    BOUNDED meshes only: flat-roll wrap planes coincide with boundary
    faces, which the mask replaces with own traces, so windowed junk is
    never read (ops/elastic.py ghost convention).  Classes are chained
    through one shared output buffer via input_output_aliases (each call
    writes only its class's lane blocks, in place).

    Returns None when constraints are unmet (caller falls back to the
    XLA loop exchange).
    """
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bx = _exchange_block_size(ex)
    NC = int(np.prod(ex.grid))
    m = ex.m
    if bx is None or E != m * NC or E_pad != E:
        return None
    NB = NC // bx
    nf, nfp = ex.n_faces, ex.n_fp
    rows_tr = C * d.ftpp
    ftp = nf * nfp
    f2, pi = derive_pairing(ex)
    strides = _flat_strides(ex.grid)
    nsel = _rup(C * nfp, 8)

    # per-class static tables
    plans = []
    for t in range(m):
        faces = []
        P_t = np.zeros((nf, nsel, rows_tr), dtype=np.float32)
        for f in range(nf):
            t2 = int(ex.nbr_class[t, f])
            off = _canonical_shift(ex, t, f)
            if off is None:
                # ambiguous wrap representative (e.g. several period-2
                # axes): the flat-window read cannot be proven safe
                return None
            s = int(np.dot(off, strides))
            g = int(f2[t, f])
            for c in range(C):
                P_t[f, c * nfp + np.arange(nfp),
                    c * d.ftpp + g * nfp + pi[t, f]] = 1.0
            faces.append((t2, s))
        mask = np.zeros((8, NC), dtype=np.float32)
        for f in range(nf):
            mask[f] = ex.self_mask[t, f].reshape(-1).astype(np.float32)
        plans.append((faces, jnp.asarray(P_t.reshape(nf * nsel, rows_tr)),
                      jnp.asarray(mask)))

    sign = -1.0 if negate else 1.0

    def kernel(nf_, windows, *refs):
        # refs: [buf(ANY), own, mask, P, face blocks..., out]
        own_ref, mask_ref, p_ref = refs[1], refs[2], refs[3]
        blocks = refs[4:-1]
        out_ref = refs[-1]
        k = 0
        sels = []
        for f in range(nf_):
            kind, s = windows[f]
            if kind == 1:
                win = blocks[k][:]
                k += 1
            else:
                A, Bb = blocks[k][:], blocks[k + 1][:]
                k += 2
                win = jnp.concatenate([A[:, s:], Bb[:, : s]], axis=1)
            # one-hot row permutation; 2-pass onehot scheme (consistent
            # with the operator kernels' x3 precision, ~2^-16 rel)
            sel = _dot(p_ref[f * nsel : (f + 1) * nsel, :], win,
                       onehot=True)
            sels.append(sel)
        for c in range(C):
            parts = []
            for f in range(nf_):
                own = own_ref[c * d.ftpp + f * nfp
                              : c * d.ftpp + f * nfp + nfp, :]
                nbr = sign * sels[f][c * nfp : (c + 1) * nfp, :]
                mk = mask_ref[f : f + 1, :] != 0.0
                parts.append(jnp.where(mk, own, nbr))
            blk = jnp.concatenate(parts, axis=0)
            if d.ftpp != ftp:
                blk = jnp.pad(blk, ((0, d.ftpp - ftp), (0, 0)))
            out_ref[c * d.ftpp : (c + 1) * d.ftpp, :] = blk

    def class_call(buf, tr, t, alias):
        faces, P_t, mask_t = plans[t]
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # aliased buffer
            pl.BlockSpec((rows_tr, bx), lambda j, t=t: (0, t * NB + j),
                         memory_space=pltpu.VMEM),  # own
            pl.BlockSpec((8, bx), lambda j: (0, j),
                         memory_space=pltpu.VMEM),  # mask (per-class array)
            pl.BlockSpec((nf * nsel, rows_tr), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),  # P
        ]
        args = [buf, tr, mask_t, P_t]
        windows = []
        for t2, s in faces:
            base = t2 * NB
            if s % bx == 0:
                o = s // bx
                windows.append((1, 0))
                in_specs.append(pl.BlockSpec(
                    (rows_tr, bx),
                    lambda j, base=base, o=o: (
                        0, base + jnp.clip(j + o, 0, NB - 1)),
                    memory_space=pltpu.VMEM))
                args.append(tr)
            else:
                oA = s // bx  # floor division: s<0 -> -1, 0<s<bx -> 0
                sm = s - oA * bx  # in (0, bx)
                windows.append((2, sm))
                for o in (oA, oA + 1):
                    in_specs.append(pl.BlockSpec(
                        (rows_tr, bx),
                        lambda j, base=base, o=o: (
                            0, base + jnp.clip(j + o, 0, NB - 1)),
                        memory_space=pltpu.VMEM))
                    args.append(tr)
        return pl.pallas_call(
            _ft.partial(kernel, nf, tuple(windows)),
            grid=(NB,),
            out_shape=jax.ShapeDtypeStruct((rows_tr, E), tr.dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (rows_tr, bx), lambda j, t=t: (0, t * NB + j),
                memory_space=pltpu.VMEM),
            input_output_aliases={0: 0} if alias else {},
            interpret=interpret,
        )(*args)

    def exchange(tr_lm: jax.Array) -> jax.Array:
        # the first call allocates the buffer WITHOUT aliasing (its other
        # class blocks hold junk until their calls write them — every
        # block is written exactly once, and junk blocks are never read);
        # subsequent calls write their class's blocks in place
        buf = class_call(tr_lm, tr_lm, 0, alias=False)
        for t in range(1, m):
            buf = class_call(buf, tr_lm, t, alias=True)
        return buf

    return exchange


def make_trace_exchange(ex: StructuredExchange, d: FusedOpData, C: int,
                        E: int, E_pad: int, negate: bool):
    """(C*ftpp, E_pad) producer-emitted traces -> consumer-ordered traces:
    per (class, face) one contiguous row block from the neighbour class's
    lanes, grid-rolled, sign-flipped (tractions), boundary-masked."""
    dim = len(ex.grid)
    NC = int(np.prod(ex.grid))
    f2, pi = derive_pairing(ex)

    rows_src = {}
    rows_own = {}
    for t in range(ex.m):
        for f in range(ex.n_faces):
            g = int(f2[t, f])
            rows_src[(t, f)] = np.concatenate(
                [c * d.ftpp + g * ex.n_fp + pi[t, f] for c in range(C)])
            rows_own[(t, f)] = np.concatenate(
                [c * d.ftpp + f * ex.n_fp + np.arange(ex.n_fp)
                 for c in range(C)])
    masks = {
        (t, f): jnp.asarray(ex.self_mask[t, f].reshape(-1))[None]
        for t in range(ex.m) for f in range(ex.n_faces)
    }

    ftp = ex.n_faces * ex.n_fp
    pad_rows = d.ftpp - ftp

    def exchange(tr_lm: jax.Array) -> jax.Array:
        F = tr_lm[:, :E]
        cls_blocks = []
        for t in range(ex.m):
            face_blocks = []
            for f in range(ex.n_faces):
                t2 = int(ex.nbr_class[t, f])
                blk = F[:, t2 * NC : (t2 + 1) * NC][rows_src[(t, f)]]
                blk = blk.reshape((len(rows_src[(t, f)]),) + ex.grid)
                for ax in range(dim):
                    s = int(ex.shift[t, f, ax])
                    if s:
                        blk = jnp.roll(blk, -s, axis=1 + ax)
                blk = blk.reshape(len(rows_src[(t, f)]), NC)
                if negate:
                    blk = -blk
                if ex.self_mask[t, f].any():
                    own_blk = F[:, t * NC : (t + 1) * NC][rows_own[(t, f)]]
                    blk = jnp.where(masks[(t, f)], own_blk, blk)
                face_blocks.append(blk.reshape(C, ex.n_fp, NC))
            cls = jnp.concatenate(face_blocks, axis=1)  # (C, ftp, NC)
            if pad_rows:
                cls = jnp.pad(cls, ((0, 0), (0, pad_rows), (0, 0)))
            cls_blocks.append(cls.reshape(C * d.ftpp, NC))
        out = jnp.concatenate(cls_blocks, axis=1)
        if E_pad != E:
            out = jnp.pad(out, ((0, 0), (0, E_pad - E)))
        return out

    return exchange


class FusedLaneRunner:
    """v2 exchange-fused lane-major runner (LF4, structured meshes)."""

    def __init__(
        self,
        p: ElasticParams,
        ex: StructuredExchange,
        dt: float,
        order: int = 4,
        src: SourceData | None = None,
        damp: jax.Array | None = None,
        receivers: ReceiverData | None = None,
        record_pressure: bool = False,
        block: int = DEFAULT_BLOCK,
        interpret: bool = False,
        exchange_impl: str = "auto",
        stiffness=None,
    ):
        if order != 4:
            raise ValueError("FusedLaneRunner is LF4-only (use the v1 lane "
                             "path for order=2)")
        self.record_pressure = record_pressure
        self.p = p
        self.ex = ex
        self.interpret = interpret
        self.dtype = p.Ginv.dtype
        self.dt = jnp.asarray(dt, self.dtype)
        # static scalars for the kernels (compiled-in constants)
        self._dt_f = float(dt)
        self._c3_f = float(dt) ** 3 / 24.0

        # class-major element reordering shared with v1
        E_old = p.Ginv.shape[0]
        old_of_new, new_of_old = class_major_perm(ex, E_old)
        self._old_of_new, self._new_of_old = old_of_new, new_of_old

        damp_perm = (
            None if damp is None else np.asarray(damp)[old_of_new])
        d = build_fused_data(p, damp=damp_perm, stiffness=stiffness)
        E = d.E
        E_pad = _rup(E, block)
        self.E, self.E_pad = E, E_pad
        if E_pad % block:
            raise AssertionError
        self.block = block

        import dataclasses as _dc

        def permute_pad(arr):
            a = np.asarray(arr)
            out = a[:, old_of_new]
            if E_pad != E:
                out = np.pad(out, ((0, 0), (0, E_pad - E)))
            return jnp.asarray(out, a.dtype)

        # geo was built in OLD element order; damp was pre-permuted above
        self.d = d = _dc.replace(
            d,
            geo=permute_pad(d.geo),
            damp=None if d.damp is None else jnp.asarray(
                np.pad(np.asarray(d.damp), ((0, 0), (0, E_pad - E))),
                self.dtype),
        )

        # exchange backend: Pallas kernel when the mesh satisfies its
        # constraints (bounded, class-block-divisible lanes), XLA loop
        # otherwise; exchange_impl forces one ('pallas' | 'loop' | 'auto')
        self.ex_t = self.ex_u = None
        if exchange_impl in ("auto", "pallas"):
            self.ex_t = make_pallas_exchange(
                ex, d, d.dim, E, E_pad, negate=True, interpret=interpret)
            self.ex_u = make_pallas_exchange(
                ex, d, d.dim, E, E_pad, negate=False, interpret=interpret)
        if exchange_impl == "pallas" and self.ex_t is None:
            raise ValueError("mesh does not satisfy the pallas-exchange "
                             "constraints (see make_pallas_exchange)")
        self.exchange_impl = "pallas" if self.ex_t is not None else "loop"
        if self.ex_t is None:
            self.ex_t = make_trace_exchange(ex, d, d.dim, E, E_pad,
                                            negate=True)
            self.ex_u = make_trace_exchange(ex, d, d.dim, E, E_pad,
                                            negate=False)

        # XLA damp multiply for u (s-damp is folded into the final stress
        # kernel; u' must be damped AFTER its traces feed the sh1 stage,
        # matching the v1 end-of-step damp ordering)
        if damp is not None:
            dn = np.zeros((d.npp, E), dtype=np.float32)
            dn[: d.n_p] = damp_perm.T
            dn = np.pad(dn, ((0, 0), (0, E_pad - E)))
            self.damp_u = jnp.asarray(np.tile(dn, (d.dim, 1)), self.dtype)
        else:
            self.damp_u = None

        self._build_sources(src, new_of_old)
        if receivers is not None:
            self.rcv = ReceiverData(
                elems=jnp.asarray(
                    new_of_old[np.asarray(receivers.elems)], jnp.int32),
                weights=receivers.weights,
            )
        else:
            self.rcv = None

        # face-node-expanded normals for the initial traction extraction
        nrm = np.asarray(p.normals)[old_of_new]  # (E, nf, dim)
        rep = np.repeat(np.arange(d.nf), d.n_fp)
        nrm_exp = np.zeros((d.dim, d.ftpp, E_pad), dtype=np.float32)
        for dd in range(d.dim):
            nrm_exp[dd, : d.ftp, :E] = nrm[:, rep, dd].T
        self._nrm_exp = jnp.asarray(nrm_exp, self.dtype)
        rmat = np.zeros((d.ftpp, d.npp), dtype=np.float32)
        fn = np.array(p.fnodes).reshape(-1)
        rmat[np.arange(d.ftp), fn] = 1.0
        self._rmat = jnp.asarray(rmat, self.dtype)

    # ------------------------------------------------------------------
    def _build_sources(self, src, new_of_old):
        d, p = self.d, self.p
        if src is None:
            self.src_elems = None
            return
        K = src.elems.shape[0]
        V = voigt_map(d.dim)
        vu = np.zeros((d.dim * d.npp, K), dtype=np.float32)
        vs = np.zeros((d.n_sig * d.npp, K), dtype=np.float32)
        for c in range(d.dim):
            vu[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                src.vec_u[:, :, c]).T
        for c in range(d.n_sig):
            vs[c * d.npp : c * d.npp + d.n_p] = np.asarray(
                src.vec_s[:, :, c]).T
        # face-trace patches (consumer-order rows c*ftpp + f*nfp + j)
        fnodes = np.array(p.fnodes)  # (nf, nfp)
        normals = np.asarray(p.normals)  # (E, nf, dim) OLD order
        elems_old = np.asarray(src.elems)
        vec_u = np.asarray(src.vec_u)  # (K, n_p, dim)
        vec_s = np.asarray(src.vec_s)  # (K, n_p, n_sig)
        tru = np.zeros((d.dim * d.ftpp, K), dtype=np.float32)
        trt = np.zeros((d.dim * d.ftpp, K), dtype=np.float32)
        for c in range(d.dim):
            for f in range(d.nf):
                rows = c * d.ftpp + f * d.n_fp + np.arange(d.n_fp)
                tru[rows] = vec_u[:, fnodes[f], c].T
                acc = np.zeros((K, d.n_fp))
                for dd in range(d.dim):
                    acc += (normals[elems_old, f, dd][:, None]
                            * vec_s[:, fnodes[f], V[c, dd]])
                trt[rows] = acc.T
        lanes = new_of_old[elems_old]
        self.src_elems = jnp.asarray(lanes, jnp.int32)
        self._src_unique = bool(
            np.unique(elems_old).size == elems_old.size)
        self.src_vu = jnp.asarray(vu, self.dtype)
        self.src_vs = jnp.asarray(vs, self.dtype)
        self.src_tru = jnp.asarray(tru, self.dtype)
        self.src_trt = jnp.asarray(trt, self.dtype)
        self.src_f0, self.src_t0, self.src_amp = src.f0, src.t0, src.amp

    def _aux(self):
        aux = {}
        if self.damp_u is not None:
            aux["damp_u"] = self.damp_u
        if self.src_elems is not None:
            aux["src_vu"], aux["src_vs"] = self.src_vu, self.src_vs
            aux["src_tru"], aux["src_trt"] = self.src_tru, self.src_trt
        if self.rcv is not None:
            aux["rcv_w"] = self.rcv.weights
        return aux

    # --- state conversion ---
    def to_lm_state(self, state: State):
        d = self.d
        perm = jnp.asarray(self._old_of_new)
        ulm = to_lm(state.u[perm], d.npp, self.E_pad)
        slm = to_lm(state.s[perm], d.npp, self.E_pad)
        return ulm, slm

    def from_lm_state(self, ulm, slm) -> State:
        d = self.d
        inv = jnp.asarray(self._new_of_old)
        return State(
            u=from_lm(ulm, d.n_p, d.npp, d.dim, self.E)[inv],
            s=from_lm(slm, d.n_p, d.npp, d.n_sig, self.E)[inv],
        )

    def traction_traces(self, slm):
        """Own-face traction traces of a lane-major stress field (XLA) —
        used once per run to seed the scan carry."""
        d = self.d
        V = voigt_map(d.dim)
        tr_sig = [
            self._rmat @ slm[c * d.npp : (c + 1) * d.npp]
            for c in range(d.n_sig)
        ]
        rows = []
        for c in range(d.dim):
            t = sum(self._nrm_exp[dd] * tr_sig[V[c, dd]]
                    for dd in range(d.dim))
            rows.append(t)
        return jnp.concatenate(rows, axis=0)  # (dim*ftpp, E_pad)

    # --- step ---
    def _inject(self, aux, field, tr, vecs, tr_vecs, t):
        if self.src_elems is None:
            return field, tr
        r = (self.src_amp * ricker(t, self.src_f0, self.src_t0))[None, :]
        r = r.astype(self.dtype)
        from .timestep import inject_columns

        field = inject_columns(field, self.src_elems, vecs * r,
                               unique=self._src_unique)
        tr = inject_columns(tr, self.src_elems, tr_vecs * r,
                            unique=self._src_unique)
        return field, tr

    def step_with(self, d, aux, carry, t):
        ulm, slm, trs = carry
        dt, c3 = self._dt_f, self._c3_f
        blk, itp = self.block, self.interpret
        from .timestep import compose_lf_step_traced

        lf = compose_lf_step_traced(
            vel=lambda s, tr: vel2_op(d, s, self.ex_t(tr), blk, itp),
            stress=lambda u, tr: stress2_op(d, u, self.ex_u(tr), blk, itp),
            vel_axpy=lambda s, tr, u, uh1: vel2_op(
                d, s, self.ex_t(tr), blk, itp, axpy=(u, uh1), dt=dt, c3=c3),
            stress_axpy=lambda u, tr, s, sh1: stress2_op(
                d, u, self.ex_u(tr), blk, itp, axpy=(s, sh1), dt=dt, c3=c3),
            inject_u=lambda f, tr, t_: self._inject(
                aux, f, tr, aux.get("src_vu"), aux.get("src_tru"), t_),
            inject_s=lambda f, tr, t_: self._inject(
                aux, f, tr, aux.get("src_vs"), aux.get("src_trt"), t_),
            post_u=lambda u: (
                u if self.damp_u is None else u * aux["damp_u"]),
        )
        return lf(ulm, slm, trs, t, dt)

    def _sample(self, aux, u_lm, s_lm=None):
        d = self.d
        g = u_lm[:, self.rcv.elems]
        g3 = g.reshape(d.dim, d.npp, -1)[:, : d.n_p]
        rec = jnp.einsum("ri,cir->rc", aux["rcv_w"], g3)
        if self.record_pressure and s_lm is not None:
            gs = s_lm[:, self.rcv.elems].reshape(d.n_sig, d.npp, -1)
            pr = -jnp.mean(gs[: d.dim, : d.n_p], axis=0)
            rec_p = jnp.einsum("ri,ir->r", aux["rcv_w"], pr)[:, None]
            rec = jnp.concatenate([rec, rec_p], axis=-1)
        return rec

    def _go(self):
        if not hasattr(self, "_go_fn"):

            @functools.partial(jax.jit, static_argnames=("n",))
            def go(d, aux, ulm, slm, n, k0):
                # trace seed INSIDE the jit: eager per-op dispatch through
                # the TPU tunnel costs ~1 s round-trip (BENCH_NOTES), so
                # the small ops of traction_traces must not run un-jitted
                # once per run chunk
                trs = self.traction_traces(slm)

                def body(carry, k):
                    carry = self.step_with(
                        d, aux, carry, k.astype(self.dtype) * self.dt)
                    ys = (
                        self._sample(aux, carry[0], carry[1])
                        if self.rcv is not None
                        else None
                    )
                    return carry, ys

                (ulm, slm, trs), seis = jax.lax.scan(
                    body, (ulm, slm, trs), jnp.arange(n) + k0)
                return ulm, slm, trs, seis

            self._go_fn = go
        return self._go_fn

    def run(self, state0: State, n_steps: int, step0: int = 0):
        ulm, slm = self.to_lm_state(state0)
        ulm, slm, _, seis = self._go()(
            self.d, self._aux(), ulm, slm, n_steps, jnp.asarray(step0))
        return self.from_lm_state(ulm, slm), (
            None if seis is None else np.asarray(seis))

    def run_lm(self, ulm, slm, n_steps: int, step0: int = 0):
        ulm, slm, trs, seis = self._go()(
            self.d, self._aux(), ulm, slm, n_steps, jnp.asarray(step0))
        return ulm, slm, seis
