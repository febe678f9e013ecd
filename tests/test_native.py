"""Native (C++) mesh kernels vs their NumPy oracles (SURVEY.md §3.1 #3)."""

import numpy as np
import pytest

from seigen_tpu.mesh import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_pair_face_nodes_matches_numpy():
    rng = np.random.default_rng(0)
    # synthetic keys: many pairs, some singletons
    base = rng.integers(0, 50, size=(300, 4)).astype(np.int64)
    keys = np.concatenate([base, base, rng.integers(60, 99, size=(37, 4))])
    rng.shuffle(keys)
    partner, mult = native.pair_face_nodes(keys)
    assert mult <= 2 or mult == keys.shape[0]  # duplicates in base possible
    # verify: partner is involutive and keys match
    N = len(keys)
    for i in range(N):
        j = partner[i]
        assert partner[j] == i
        assert np.array_equal(keys[i], keys[j])


def test_pair_on_real_mesh_connectivity():
    """build_discrete with native path equals the pure-NumPy result."""
    from seigen_tpu.mesh import box_mesh, build_discrete
    import seigen_tpu.mesh.discrete as D

    topo = box_mesh(3, 2, 2, periodic=(0,))
    dm_native = build_discrete(topo, 2)

    # force the NumPy fallback
    orig = native.available
    try:
        native.available = lambda: False
        dm_np = build_discrete(topo, 2)
    finally:
        native.available = orig

    assert np.array_equal(dm_native.nbr, dm_np.nbr)
    assert np.array_equal(dm_native.bc, dm_np.bc)


def test_morton_matches_numpy():
    from seigen_tpu.parallel.partition import morton_order

    rng = np.random.default_rng(1)
    pts = rng.uniform(size=(5000, 3))
    p_native = morton_order(pts)
    orig = native.available
    try:
        native.available = lambda: False
        p_np = morton_order(pts)
    finally:
        native.available = orig
    assert np.array_equal(p_native, p_np)
