"""Benchmark driver: prints ONE JSON line with the north-star metric.

Metric: DOF-updates/sec/chip on the 3D explosive-source benchmark
(BASELINE.json [D]).  vs_baseline is the speedup over this solver's own CPU
path on the same (smaller) problem — the Firedrake reference cannot run in
this environment (see BASELINE.md); the CPU denominator is measured per-DOF
so problem-size differences cancel to first order.
"""

import hashlib
import json
import os
import shutil
import subprocess
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))

# Pinned CPU-proxy denominator (see BASELINE.md "Pinned CPU proxy"):
# measured 2026-08-19 (round 3) by cpu_baseline_rate() — subprocess-
# isolated CPU backend, n=8 P3, 10-step scan, best-of-3 — on this
# container's single throttled vCPU.  ``vs_baseline`` divides by THIS
# constant so cross-round ratios are comparable (the round-1/2 numbers
# used in-process remeasurements that drifted 14.3e6 -> 17.5e6 -> 8.0e6);
# the live remeasurement is reported separately as ``vs_baseline_live``.
PINNED_CPU_BASELINE_DOF_RATE = 8.03e6

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


_CPU_BASELINE = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache_dir!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from seigen_tpu.bench.throughput import measure, setup_case
dm, p, src, damp, dt, state0 = setup_case(n=8, degree=3)
# best-of-3: the CPU denominator otherwise jitters 2-3x with host load
# and pollutes the reported speedup
r = max(measure(p, src, damp, dt, state0, n_steps=10).dof_updates_per_sec
        for _ in range(3))
print("CPU_BASELINE_DOF_RATE", r)
"""


def _host_cpu_fingerprint() -> str:
    """Short hash of this host's CPU identity + feature flags.

    XLA:CPU persistent-cache entries are AOT executables for the exact
    ISA of the machine that compiled them; the cache key does NOT include
    host CPU features, so after a container migration a load can SIGILL
    ('Machine type used for XLA:CPU compilation doesn't match...').
    Keying the CPU cache dir by the CPU identity makes a moved container
    recompile instead of loading another machine's code.  The hash covers
    model name/stepping/microcode as well as the flags line because the
    observed mismatches (results/r3_batch.log) were on LLVM *tuning*
    features (+prefer-no-scatter/+prefer-no-gather) that are
    model-derived and absent from flags; `_cpu_cache_dir` additionally
    detects a mismatch at run time and retries with a wiped cache.
    """
    keys = ("flags", "model name", "stepping", "microcode")
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.split(":")[0].strip() in keys:
                    lines.append(line.strip())
                if len(lines) == len(keys):
                    break
    except OSError:
        return "unknown"
    return hashlib.md5("\n".join(lines).encode()).hexdigest()[:12]


def _cpu_cache_dir() -> str:
    return os.path.join(_REPO, f".jax_cache_cpu_{_host_cpu_fingerprint()}")


def cpu_baseline_rate(timeout: float = 1500.0) -> float | None:
    """Measure the CPU-proxy denominator in an isolated subprocess.

    Isolation matters twice over: a stale CPU AOT cache entry can SIGILL
    (killing an in-process measurement along with the whole driver run),
    and pinning the subprocess to CPU keeps it off the TPU tunnel.
    """
    cache = _cpu_cache_dir()
    for attempt in range(2):
        try:
            cp = subprocess.run(
                [sys.executable, "-c",
                 _CPU_BASELINE.format(cache_dir=cache)],
                timeout=timeout, capture_output=True, text=True, cwd=_REPO)
        except subprocess.TimeoutExpired:
            print("bench: CPU baseline subprocess timed out",
                  file=sys.stderr)
            return None
        for line in cp.stdout.splitlines():
            if line.startswith("CPU_BASELINE_DOF_RATE"):
                return float(line.split()[1])
        # AOT/host mismatch (fingerprint collision across microarchs):
        # wipe the cache dir and recompile once from scratch
        if attempt == 0 and ("machine type" in cp.stderr.lower()
                             or cp.returncode and "SIGILL" in cp.stderr):
            print("bench: CPU AOT cache mismatch -> wiping "
                  f"{cache} and retrying", file=sys.stderr)
            shutil.rmtree(cache, ignore_errors=True)
            continue
        print(f"bench: CPU baseline subprocess rc={cp.returncode}: "
              f"{cp.stderr[-500:]}", file=sys.stderr)
        return None
    return None


def main():
    import jax

    if not tpu_alive():
        # dead or absent accelerator: pin CPU BEFORE backend init
        jax.config.update("jax_platforms", "cpu")
        print("bench: accelerator probe failed -> CPU proxy mode",
              file=sys.stderr)

    backend = jax.devices()[0].platform
    # In CPU-proxy fallback mode the main process IS an XLA:CPU consumer:
    # point it at the host-fingerprinted cache, not the shared TPU cache
    # (a stale CPU AOT entry there can SIGILL the whole driver —
    # ADVICE.md round 3).
    cache = (os.path.join(_REPO, ".jax_cache") if backend != "cpu"
             else _cpu_cache_dir())
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from seigen_tpu.bench.throughput import main as bench_main

    # CPU baseline proxy: small problem, same numerics, CPU backend,
    # measured in a subprocess (see cpu_baseline_rate).  vs_baseline uses
    # the PINNED round-3 measurement so the ratio is comparable across
    # rounds; the live remeasurement is recorded alongside.
    live_rate = cpu_baseline_rate() if backend != "cpu" else None

    # n_steps 50 -> 100 (round 5): the ~10-15 ms fixed tunnel
    # dispatch+readback per timed rep is ~8% of a 50-step scan at the
    # flagship rate — 100 steps amortizes it below 3% (production scans
    # run thousands of steps; the per-degree table always used 100).
    # Same-session apples-to-apples: 50-step 4.36/4.24e9, 100-step
    # 4.76e9 (BENCH_NOTES round-5 headline note).
    out = bench_main(n=24, degree=3, n_steps=100,
                     baseline_dof_rate=PINNED_CPU_BASELINE_DOF_RATE)
    out["detail"]["cpu_baseline_dof_rate_pinned"] = (
        PINNED_CPU_BASELINE_DOF_RATE)
    out["detail"]["cpu_baseline_dof_rate"] = live_rate
    out["detail"]["vs_baseline_live"] = (
        out["value"] / live_rate if live_rate else None)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
