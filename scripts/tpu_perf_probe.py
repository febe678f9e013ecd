#!/usr/bin/env python
"""TPU performance probe: einsum vs pallas, op-level and step-level timings.

Run exclusively (single TPU client). Results feed kernel-tuning decisions;
all timings use the persistent compilation cache.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from seigen_tpu.bench.throughput import measure, setup_case
    from seigen_tpu.ops import apply_stress_op, apply_vel_op
    from seigen_tpu.ops.pallas_kernels import stress_op_pallas, vel_op_pallas

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.time()
    dm, p, src, damp, dt, state0 = setup_case(n=n, degree=degree)
    E = dm.num_elements
    dof = E * dm.re.n_p * 9
    print(f"setup {time.time()-t0:.1f}s  E={E} dof={dof}", flush=True)

    results = {"E": E, "dof": dof, "degree": degree}

    vop = jax.jit(apply_vel_op)
    sop = jax.jit(apply_stress_op)
    t = timeit(vop, p, state0.s)
    results["vel_op_einsum_ms"] = t * 1e3
    print(f"vel_op einsum: {t*1e3:.3f} ms", flush=True)
    t = timeit(sop, p, state0.u)
    results["stress_op_einsum_ms"] = t * 1e3
    print(f"stress_op einsum: {t*1e3:.3f} ms", flush=True)

    t = timeit(lambda p, s: vel_op_pallas(p, s), p, state0.s)
    results["vel_op_pallas_ms"] = t * 1e3
    print(f"vel_op pallas: {t*1e3:.3f} ms", flush=True)
    t = timeit(lambda p, u: stress_op_pallas(p, u), p, state0.u)
    results["stress_op_pallas_ms"] = t * 1e3
    print(f"stress_op pallas: {t*1e3:.3f} ms", flush=True)

    # correctness cross-check on hardware
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.normal(size=state0.s.shape), dtype=jnp.float32)
    a = np.asarray(vop(p, sig))
    b = np.asarray(vel_op_pallas(p, sig))
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
    results["pallas_vs_einsum_rel_err"] = float(rel)
    print(f"pallas vs einsum rel err: {rel:.2e}", flush=True)

    for impl in ["einsum", "pallas"]:
        res = measure(p, src, damp, dt, state0, n_steps=50, impl=impl)
        results[f"step_{impl}_dof_rate"] = res.dof_updates_per_sec
        results[f"step_{impl}_steps_per_sec"] = res.steps_per_sec
        print(
            f"{impl}: {res.steps_per_sec:.1f} steps/s, "
            f"{res.dof_updates_per_sec:.3e} DOF/s",
            flush=True,
        )

    with open("/tmp/tpu_probe.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
