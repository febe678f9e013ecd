"""Benchmark driver: prints ONE JSON line with the north-star metric.

Metric: DOF-updates/sec/chip on the 3D explosive-source benchmark
(BASELINE.json [D]).  vs_baseline is the speedup over this solver's own CPU
path on the same (smaller) problem — the Firedrake reference cannot run in
this environment (see BASELINE.md); the CPU denominator is measured per-DOF
so problem-size differences cancel to first order.
"""

import json
import sys


def main():
    import jax

    backend = jax.devices()[0].platform
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from seigen_tpu.bench.throughput import main as bench_main

    # CPU baseline proxy: small problem, same numerics, CPU backend.
    # Run in a subprocess to keep backends clean? CPU devices are always
    # available alongside; measure via jax.default_device.
    cpu = jax.local_devices(backend="cpu")[0] if backend != "cpu" else None
    baseline_rate = None
    if cpu is not None:
        with jax.default_device(cpu):
            from seigen_tpu.bench.throughput import measure, setup_case

            dm, p, src, damp, dt, state0 = setup_case(n=8, degree=3)
            # best-of-3: the CPU denominator otherwise jitters 2-3x with
            # host load and pollutes the reported speedup
            baseline_rate = max(
                measure(p, src, damp, dt, state0, n_steps=10)
                .dof_updates_per_sec
                for _ in range(3)
            )

    out = bench_main(n=24, degree=3, n_steps=50,
                     baseline_dof_rate=baseline_rate)
    out["detail"]["cpu_baseline_dof_rate"] = baseline_rate
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
