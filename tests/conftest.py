"""Test configuration: run the suite on CPU with 8 fake devices and f64.

Mirrors the reference's distributed-testing strategy (SURVEY.md §6:
``mpirun -np 8`` on one node) by exposing 8 virtual XLA CPU devices so every
multi-chip code path (shard_map / ppermute halo exchange) is exercised without
TPU hardware.  f64 is enabled because convergence-order assertions need it
(SURVEY.md §9.3); the library itself stays dtype-parametric.

NOTE: this environment's sitecustomize registers the 'axon' TPU platform at
interpreter startup and forces jax_platforms='axon,cpu', ignoring the
JAX_PLATFORMS env var.  The reliable way to pin tests to CPU is
``jax.config.update('jax_platforms', 'cpu')`` after import, before any
backend initialization.  XLA_FLAGS must still be set before first device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
