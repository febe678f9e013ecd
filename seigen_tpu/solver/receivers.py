"""Receiver (seismogram) sampling (SURVEY.md §4.4).

Rebuild of the reference's per-step point sampling (Firedrake Function.at):
each receiver is located once at setup into (element, basis-weight) pairs;
per-step sampling is a tiny gather + dot inside the scan, and the stacked
scan outputs are the (n_steps, R, C) seismogram.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.discrete import DiscreteMesh


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["elems", "weights"],
    meta_fields=[],
)
@dataclass(frozen=True)
class ReceiverData:
    elems: jax.Array  # (R,) int32
    weights: jax.Array  # (R, n_p) basis values at receiver points


def build_receivers(
    dm: DiscreteMesh, points: np.ndarray, dtype=jnp.float32
) -> ReceiverData | None:
    if points is None or len(points) == 0:
        return None
    elems, xi = dm.locate_points(np.asarray(points, dtype=np.float64))
    phi = dm.re.eval_basis(xi)  # (R, n_p)
    return ReceiverData(
        elems=jnp.asarray(elems, dtype=jnp.int32),
        weights=jnp.asarray(phi, dtype=dtype),
    )


def sample(rcv: ReceiverData, field: jax.Array) -> jax.Array:
    """(R, C) samples of a nodal field (E, n_p, C)."""
    vals = field[rcv.elems]  # (R, n_p, C)
    return jnp.einsum("ri,ric->rc", rcv.weights, vals)


def line(start, end, n) -> np.ndarray:
    """n receiver points on the segment [start, end] (inclusive)."""
    start, end = np.asarray(start, float), np.asarray(end, float)
    t = np.linspace(0.0, 1.0, n)[:, None]
    return start[None] * (1 - t) + end[None] * t


def grid(x_range, y_range, nx, ny, z) -> np.ndarray:
    """nx*ny points on the z=const plane over x_range x y_range (3D
    areal acquisition — a seismic-survey patch; the round-3 salt demo's
    scientific hole was LINE acquisition for a 3D target)."""
    xs = np.linspace(*x_range, nx)
    ys = np.linspace(*y_range, ny)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    return np.stack(
        [X.ravel(), Y.ravel(), np.full(X.size, float(z))], axis=1)
