#!/usr/bin/env python
"""Minimized repro for the XLA-AD TPU-worker crash (upstream report).

Reproduced 3x on this host (axon TPU service): reverse-mode AD through
the roll-exchange einsum LF4 scan at E=82944 (n=24, P1) kills the TPU
worker with FAILED_PRECONDITION on the readback; the forward-only scan
at the same size is clean, and the custom-VJP Pallas engines are clean
at the same size (results/r4_fwi_grad_roll24.json, r4_batch.log).

This script is the smallest standalone trigger we know: one shot, one
value_and_grad of a segmented (jax.checkpoint) LF4 scan over the pure-
jnp roll-exchange operators.  DO NOT run it casually on shared TPU
hardware — it takes down the worker.  It is guarded by the same env
flag as the library guard:

    SEIGEN_TPU_ALLOW_ROLL_AD=1 python scripts/repro_roll_crash.py

Exit 0 = no crash (service fixed?); a dead worker = reproduced.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SEIGEN_TPU_ALLOW_ROLL_AD") != "1":
    sys.exit("refusing: this reproducibly kills the TPU worker. "
             "Set SEIGEN_TPU_ALLOW_ROLL_AD=1 to run (see docstring).")

import jax
import jax.numpy as jnp
import numpy as np

from seigen_tpu.bench.fwi_grad import run

# n=24 P1 is the reproduced crash config; 60 steps (segment 20) is the
# smallest step count we saw fault.  paths=('roll',) only — the other
# engines are known-clean.
out = run(n=24, degree=1, n_steps=60, repeats=1, shots=1, segment=20,
          paths=("roll",))
print("no crash:", {k: v for k, v in out.items() if k == "roll"})
