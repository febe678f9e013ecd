"""HBM-traffic itemization of the v3 merged LF4 step (host-side).

Round-4 redo of the v2-era roofline accounting (VERDICT r3, next-round
#6): the v2 numbers modeled standalone-exchange traffic that the merged
engine no longer generates.  This module derives the per-step HBM bytes
of the CURRENT pipeline exactly from the runner's plan + table shapes:

  per op: field read, geo/mask stream, deduped windowed trace reads,
          output + producer-trace writes, axpy operand reads, constant
          tables (refetched per lane block), kernel-fused source
          patterns, and the end-of-step XLA damp multiply.

The LF4 step is 6 merged ops (2 vel + 2 stress + vel_axpy + stress_axpy,
solver/timestep.compose_lf_step_traced).  Dividing by the measured HBM
bandwidth gives the bandwidth-bound step time; comparing with a measured
scan-level step (bench/ab.py --impl merged) yields the fraction of the
step that is NOT explainable by HBM traffic (= compute/occupancy bound).

Host-side only (builds the runner on CPU; no TPU needed):
  python -m seigen_tpu.bench.roofline --n 24 --degree 3 \
      [--measured-ms 3.53] [--bw 819e9]
"""

from __future__ import annotations

import argparse
import json


def itemize(n=24, degree=3, dim=3, src=True, damp=True, packed=False):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ..ops.structured_exchange import detect_structured
    from ..solver.lane_merged import MergedLaneRunner
    from .throughput import setup_case

    dm, p, src_d, damp_a, dt, state0 = setup_case(
        n=n, degree=degree, dim=dim)
    ex = detect_structured(dm)
    r = MergedLaneRunner(p, ex, dt, order=4, src=src_d if src else None,
                         damp=damp_a if damp else None, interpret=True,
                         packed=packed)
    d, plan = r.d, r.plan
    B = 4  # f32 bytes
    Ls, Lt = plan.Ls, plan.Lt
    m, nf, rtf, rtq = plan.m, plan.nf, plan.rtf, plan.rtq
    NCs = plan.NCs
    NBs = plan.NBs
    nslot = sum(len(s) for s in plan.slots)
    G = d.geo.shape[0]

    def lane(rows):
        return rows * Ls * B

    # per-op common streams
    win = nslot * rtq * NCs * B  # deduped windowed trace reads
    trace_w = nf * rtf * Ls * B  # producer-trace write (NBs blocks/class)
    tbl_per_block = (d.drr.size + d.lift.size + d.erep.size
                     + (d.gexp.size if d.gexp is not None else 0)) * B
    tbl = (tbl_per_block * NBs * m
           + sum(P.size for P in plan.P) * NBs * B)
    geo_mask = lane(G + 8)

    n_groups = len(r._src_groups) if (src and r.src_dense) else 0
    C_u, C_s = d.dim * d.npp, d.n_sig * d.npp

    ops = {}
    # vel_src (kernel-fused injection) or plain vel — x1 at step head
    ops["vel1(+src)"] = (lane(C_s) + geo_mask + win + lane(C_u) + trace_w
                         + tbl + n_groups * (lane(C_u) + lane(8)))
    ops["stress1"] = (lane(C_u) + geo_mask + win + lane(C_s) + trace_w
                      + tbl)
    ops["vel_axpy"] = (lane(C_s) + geo_mask + win + 2 * lane(C_u)
                       + lane(C_u) + trace_w + tbl)
    ops["stress_src"] = (lane(C_u) + geo_mask + win + lane(C_s) + trace_w
                         + tbl + n_groups * (lane(C_s) + lane(8)))
    ops["vel2"] = lane(C_s) + geo_mask + win + lane(C_u) + trace_w + tbl
    ops["stress_axpy"] = (lane(C_u) + geo_mask + win + 2 * lane(C_s)
                          + (lane(d.npp) if damp else 0) + lane(C_s)
                          + trace_w + tbl)
    # end-of-step u damp (XLA elementwise): read u, write u, plus ONE
    # (npp, Ls) damp row block broadcast across the dim components
    # (stored untiled since the round-4 lever-2 trim; was 3*lane(C_u))
    ops["damp_u"] = (2 * lane(C_u) + lane(d.npp)) if damp else 0

    total = sum(ops.values())
    return {
        "config": {"n": n, "degree": degree, "dim": dim, "E": r.E,
                   "packed": packed, "block": plan.bx, "m": m,
                   "npp": d.npp, "rtf": rtf, "nslot": nslot,
                   "src_groups": n_groups},
        "per_op_MB": {k: v / 1e6 for k, v in ops.items()},
        "streams_MB_per_step": {
            "state_rw": sum(
                v - (geo_mask + win + trace_w + tbl)
                for k, v in ops.items() if k != "damp_u") / 1e6,
            "geo_mask": 6 * geo_mask / 1e6,
            "windows": 6 * win / 1e6,
            "trace_writes": 6 * trace_w / 1e6,
            "tables": 6 * tbl / 1e6,
            "damp_u": ops["damp_u"] / 1e6,
        },
        "bytes_per_step": total,
        "MB_per_step": total / 1e6,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--degree", type=int, default=3)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--bw", type=float, default=819e9,
                    help="HBM bandwidth B/s (measured v5e-class default)")
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured scan-level step time (bench/ab.py)")
    args = ap.parse_args()
    out = itemize(n=args.n, degree=args.degree, dim=args.dim,
                  packed=args.packed)
    out["bw_GBs"] = args.bw / 1e9
    out["roofline_ms"] = out["bytes_per_step"] / args.bw * 1e3
    if args.measured_ms is not None:
        out["measured_ms"] = args.measured_ms
        out["hbm_bound_fraction"] = out["roofline_ms"] / args.measured_ms
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
