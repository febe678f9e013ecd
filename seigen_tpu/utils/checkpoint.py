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


def save_checkpoint(path: str, state: State, step: int,
                    meta: dict | None = None,
                    extras: dict | None = None):
    """``extras``: additional named arrays stored alongside (u, s) — e.g.
    viscoelastic memory variables; returned by load_checkpoint."""
    path = _norm(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        u=np.asarray(state.u),
        s=np.asarray(state.s),
        step=np.int64(step),
        meta=json.dumps(meta or {}),
        **{f"extra_{k}": np.asarray(v) for k, v in (extras or {}).items()},
    )


def load_checkpoint(path: str, dtype=None) -> tuple[State, int, dict]:
    if not os.path.exists(path):
        path = _norm(path)
    with np.load(path, allow_pickle=False) as z:
        u, s = z["u"], z["s"]
        if dtype is not None:
            u, s = u.astype(dtype), s.astype(dtype)
        state = State(u=jnp.asarray(u), s=jnp.asarray(s))
        meta = json.loads(str(z["meta"]))
        extras = {
            k[len("extra_"):]: jnp.asarray(
                z[k] if dtype is None else z[k].astype(dtype))
            for k in z.files if k.startswith("extra_")
        }
        if extras:
            meta["_extras"] = extras
        return state, int(z["step"]), meta


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
