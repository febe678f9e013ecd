"""TPU row-gather cost model probe (unstructured exchange design input).

The unstructured trace exchange must move neighbour traces through some
dynamic indexing primitive; this probe measures the candidates at realistic
shapes so the design rides measurement, not folklore (BENCH_NOTES.md:
per-call dispatch ~1 s through the tunnel, so everything is timed as a
jitted scan).

Candidates, for E elements / nf faces / nfp face nodes / C components:
  rowtake_face   take rows of (E*nf, nfp*C_pad)   -- face-granularity
  rowtake_node   take rows of (E*ftp, C_pad)      -- node-granularity
  lanetake       take lanes of (rows, E)          -- lane-axis gather
  transpose      (C*ftpp, E) <-> (E*nf, nfp*C)    -- relayout cost
  roll_mask      per-face roll+where on (C*ftpp, E) x nf*m -- structured ref

Usage: python -m seigen_tpu.bench.gather_probe --E 82944
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def _timed(fn, args, n=30, reps=2):
    import jax
    import numpy as np

    @functools.partial(jax.jit, static_argnames=("n",))
    def go(args, n):
        def body(c, _):
            return fn(c, args), None

        out, _ = jax.lax.scan(body, args[0], length=n)
        return out

    out = go(args, n)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = go(args, n)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--E", type=int, default=82944)
    ap.add_argument("--nf", type=int, default=4)
    ap.add_argument("--nfp", type=int, default=10)
    ap.add_argument("--C", type=int, default=3)
    ap.add_argument("--n", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    E, nf, nfp, C = args.E, args.nf, args.nfp, args.C
    ftp = nf * nfp
    rng = np.random.default_rng(0)
    out = {}

    def report(name, sec, nbytes):
        out[name] = {"ms": sec * 1e3, "GBps": nbytes / sec / 1e9}
        print(f"{name:16s} {sec*1e3:8.3f} ms  {nbytes/sec/1e9:8.1f} GB/s",
              flush=True)

    # face-granularity row take
    for W in (32, 64, 128):
        A = jnp.asarray(rng.standard_normal((E * nf, W)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, E * nf, size=E * nf), jnp.int32)

        def f(c, a):
            return jnp.take(c, a[1], axis=0)

        sec = _timed(f, (A, idx), n=args.n)
        report(f"rowtake_{E*nf}x{W}", sec, 2 * A.nbytes)

    # node-granularity row take
    for W in (8, 32):
        A = jnp.asarray(rng.standard_normal((E * ftp, W)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, E * ftp, size=E * ftp), jnp.int32)

        def f(c, a):
            return jnp.take(c, a[1], axis=0)

        sec = _timed(f, (A, idx), n=args.n)
        report(f"rowtake_{E*ftp}x{W}", sec, 2 * A.nbytes)

    # lane-axis take at trace shape
    rows = C * ((ftp + 7) // 8 * 8)
    A = jnp.asarray(rng.standard_normal((rows, E)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, E, size=E), jnp.int32)

    def f(c, a):
        return jnp.take(c, a[1], axis=1)

    sec = _timed(f, (A, idx), n=args.n)
    report(f"lanetake_{rows}x{E}", sec, 2 * A.nbytes)

    # relayout (C*ftpp, E) -> (E, nf, nfp*C) -> back
    ftpp = (ftp + 7) // 8 * 8
    A = jnp.asarray(rng.standard_normal((C * ftpp, E)), jnp.float32)

    def f(c, a):
        x = c.reshape(C, ftpp, E)[:, :ftp]
        y = x.reshape(C, nf, nfp, E).transpose(3, 1, 2, 0)
        z = y.transpose(3, 1, 2, 0).reshape(C, ftp, E)
        z = jnp.pad(z, ((0, 0), (0, ftpp - ftp), (0, 0)))
        return z.reshape(C * ftpp, E)

    sec = _timed(f, (A,), n=args.n)
    report(f"transpose_rt_{C*ftpp}x{E}", sec, 4 * A.nbytes)

    # structured reference: per-(class,face) roll+mask on trace array
    m = 6

    def f(c, a):
        y = c
        for t in range(m):
            for ff in range(nf):
                y = y.at[:, t : t + 1].set(
                    jnp.roll(c, t + ff, axis=1)[:, t : t + 1])
        return 0.5 * y + 0.5 * jnp.roll(c, 1, axis=1)

    sec = _timed(f, (A,), n=args.n)
    report(f"rollmask_ref", sec, 2 * A.nbytes)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
