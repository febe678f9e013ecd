"""Checkpoint / resume (SURVEY.md §7.4).

State is tiny and flat — (u, s) arrays + step index — so checkpointing is a
single compressed npz with integrity metadata.  (The reference at most dumped
Firedrake checkpoints; resume here is exact: the staggered state carries all
information.)  An orbax-backed variant is provided for users already running
orbax-managed jobs.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..solver.timestep import State


def _norm(path: str) -> str:
    # np.savez appends '.npz' when absent; normalize so save/load agree on
    # the same file for extension-less paths.
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, state: State, step: int, meta: dict | None = None):
    path = _norm(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        u=np.asarray(state.u),
        s=np.asarray(state.s),
        step=np.int64(step),
        meta=json.dumps(meta or {}),
    )


def load_checkpoint(path: str, dtype=None) -> tuple[State, int, dict]:
    if not os.path.exists(path):
        path = _norm(path)
    with np.load(path, allow_pickle=False) as z:
        u, s = z["u"], z["s"]
        if dtype is not None:
            u, s = u.astype(dtype), s.astype(dtype)
        state = State(u=jnp.asarray(u), s=jnp.asarray(s))
        return state, int(z["step"]), json.loads(str(z["meta"]))


def save_checkpoint_orbax(path: str, state: State, step: int):
    """Orbax variant for orbax-managed pipelines."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {"u": state.u, "s": state.s, "step": jnp.asarray(step)},
    )
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str) -> tuple[State, int]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    return State(u=tree["u"], s=tree["s"]), int(tree["step"])
