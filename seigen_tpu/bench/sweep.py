"""Parameter-sweep benchmark harness — pybench parity (SURVEY.md §3
"Benchmark harness": sweeps over degree q in 1..4 and mesh size, per-region
timings, JSON result dumps).

Usage:
  python -m seigen_tpu.bench.sweep --degrees 1,2,3 --sizes 8,16 --dim 3 \
      --steps 20 --out results/sweep.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run_sweep(dim, degrees, sizes, n_steps, order, dtype_name, out_path=None,
              impl="auto", scramble=False, vti=False, overlap=True,
              fill_mode="auto", block=None):
    import jax
    import jax.numpy as jnp

    from ..utils.profiling import RegionTimer
    from .throughput import measure, setup_case

    dtype = jnp.dtype(dtype_name)
    rows = []
    for degree in degrees:
        for n in sizes:
            timer = RegionTimer()
            with timer.region("setup"):
                dm, p, src, damp, dt, state0 = setup_case(
                    n=n, degree=degree, dtype=dtype, dim=dim,
                    scramble=scramble,
                )
            with timer.region("run"):
                impl_used = impl
                if impl == "auto":
                    for cand in ("merged", "fused", "lane", "pallas_roll",
                                 "xla_roll", "einsum"):
                        try:
                            res = measure(p, src, damp, dt, state0,
                                          n_steps=n_steps, order=order,
                                          impl=cand, dm=dm, vti=vti)
                            impl_used = cand
                            break
                        except Exception:
                            continue
                else:
                    res = measure(p, src, damp, dt, state0,
                                  n_steps=n_steps, order=order, impl=impl,
                                  dm=dm, vti=vti, overlap=overlap,
                                  fill_mode=fill_mode, block=block)
            row = {
                "dim": dim,
                "degree": degree,
                "n": n,
                "elements": res.n_elements,
                "dof": res.n_dof,
                "steps": res.n_steps,
                "seconds": res.seconds,
                "steps_per_sec": res.steps_per_sec,
                "dof_updates_per_sec": res.dof_updates_per_sec,
                "timings": timer.report(),
                "backend": jax.devices()[0].platform,
                "dtype": dtype_name,
                "impl": impl_used,
                "scramble": scramble,
                "vti": vti,
                "fill_mode": fill_mode,
            }
            rows.append(row)
            print(json.dumps(row))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=2)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=3, choices=[2, 3])
    ap.add_argument("--degrees", type=str, default="1,2,3")
    ap.add_argument("--sizes", type=str, default="8,16")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--impl", type=str, default="auto")
    ap.add_argument("--scramble", action="store_true",
                    help="permute cells + drop structure metadata (the "
                         "honest stand-in for a Gmsh unstructured import)")
    ap.add_argument("--no-overlap", action="store_true",
                    help="fused_sharded: disable the interior/boundary "
                         "overlap split (A/B of its 1-shard cost)")
    ap.add_argument("--fill-mode", type=str, default="auto",
                    choices=["auto", "off", "ppermute", "local", "skip"],
                    help="fused_sharded halo-fill strategy (1-shard "
                         "split probes; see ShardedFusedRunner)")
    ap.add_argument("--block", type=int, default=None,
                    help="lane-block override for the merged runners "
                         "(block-size probes)")
    ap.add_argument("--vti", action="store_true",
                    help="per-element VTI Voigt stiffness through the "
                         "runner's anisotropic Hooke path")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    run_sweep(
        args.dim,
        [int(d) for d in args.degrees.split(",")],
        [int(s) for s in args.sizes.split(",")],
        args.steps,
        args.order,
        args.dtype,
        args.out,
        impl=args.impl,
        scramble=args.scramble,
        vti=args.vti,
        overlap=not args.no_overlap,
        fill_mode=args.fill_mode,
        block=args.block,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
