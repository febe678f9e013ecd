"""seigen_tpu — a TPU-native elastic wave propagation framework.

A from-scratch rebuild of the capabilities of devitocodes/seigen (see
SURVEY.md): the linear elastic wave equation in first-order velocity-stress
form, discretized with nodal discontinuous-Galerkin finite elements (P1-P4 on
triangles/tetrahedra) and stepped with explicit 2nd/4th-order leapfrog —
implemented as batched XLA/Pallas element kernels inside a jitted ``lax.scan``
time loop, sharded SPMD over TPU meshes with ``shard_map`` halo exchange.
"""

__version__ = "0.1.0"
