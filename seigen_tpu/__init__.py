"""seigen_tpu — a TPU-native elastic wave propagation framework.

A from-scratch rebuild of the capabilities of devitocodes/seigen (see
SURVEY.md): the linear elastic wave equation in first-order velocity-stress
form, discretized with nodal discontinuous-Galerkin finite elements (P1-P4 on
triangles/tetrahedra) and stepped with explicit 2nd/4th-order leapfrog —
implemented as batched XLA/Pallas element kernels inside a jitted ``lax.scan``
time loop, sharded SPMD over TPU meshes with ``shard_map`` halo exchange.
"""

import os as _os

__version__ = "0.1.0"

# Wave propagation accumulates matmul rounding over thousands of steps: the
# TPU default (bf16-input passes) costs ~8x accuracy on eigenmode errors for
# ~14% throughput (BENCH_NOTES.md).  Default to full-precision f32 matmuls;
# override with SEIGEN_TPU_MATMUL_PRECISION=default for maximum speed.
_prec = _os.environ.get("SEIGEN_TPU_MATMUL_PRECISION", "highest")
if _prec != "unset":
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", _prec)
