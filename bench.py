"""Benchmark driver: prints ONE JSON line with the north-star metric.

Metric: DOF-updates/sec/chip on the 3D explosive-source benchmark
(BASELINE.json [D]).  vs_baseline is the speedup over this solver's own CPU
path on the same (smaller) problem — the Firedrake reference cannot run in
this environment (see BASELINE.md); the CPU denominator is measured per-DOF
so problem-size differences cancel to first order.
"""

import json
import subprocess
import sys

_PROBE = """
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
x = jnp.ones((128, 128)); (x @ x).block_until_ready()
"""


def tpu_alive(timeout: float = 240.0) -> bool:
    """Probe the accelerator in a SUBPROCESS with a hard timeout.

    The axon tunnel can be half-dead: the platform registers (so
    ``jax.devices()`` succeeds) but the first execution hangs forever.
    Probing in-process would hang this driver with it; a subprocess
    probe lets us fall back to the CPU proxy and still print the one
    JSON line the round harness records.
    """
    try:
        return subprocess.run(
            [sys.executable, "-c", _PROBE], timeout=timeout,
            capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    if not tpu_alive():
        # dead or absent accelerator: pin CPU BEFORE backend init
        jax.config.update("jax_platforms", "cpu")
        print("bench: accelerator probe failed -> CPU proxy mode",
              file=sys.stderr)

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
