"""ctypes loader for the native mesh-preprocessing library.

Builds ``libseigen_mesh.so`` from mesh_native.cpp on first use (g++ -O3) and
caches it next to the source.  All entry points have NumPy fallbacks in
mesh/discrete.py / parallel/partition.py; ``available()`` reports whether the
native path is usable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mesh_native.cpp")
_LIB = os.path.join(_HERE, "libseigen_mesh.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.pair_face_nodes.restype = ctypes.c_int64
        lib.pair_face_nodes.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.morton_codes.restype = None
        lib.morton_codes.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.decode_partners.restype = None
        lib.decode_partners.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.argsort_u64.restype = None
        lib.argsort_u64.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.geometric_factors.restype = None
        lib.geometric_factors.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.halo_needs.restype = ctypes.c_int64
        lib.halo_needs.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def pair_face_nodes(keys: np.ndarray) -> tuple[np.ndarray, int]:
    """(N, keylen) int64 keys -> (partner (N,) int64, max multiplicity)."""
    lib = _load()
    assert lib is not None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n, keylen = keys.shape
    partner = np.empty(n, dtype=np.int64)
    mult = lib.pair_face_nodes(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
        ctypes.c_int32(keylen),
        partner.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return partner, int(mult)


def decode_partners(partner: np.ndarray, nf: int, nfp: int, n_p: int,
                    fnodes_flat: np.ndarray):
    """partner (N,) -> (nbr int32 (N,), selfpair bool (N,)) in one C pass."""
    lib = _load()
    assert lib is not None
    partner = np.ascontiguousarray(partner, dtype=np.int64)
    fn = np.ascontiguousarray(fnodes_flat, dtype=np.int64)
    N = len(partner)
    nbr = np.empty(N, dtype=np.int32)
    sp = np.empty(N, dtype=np.uint8)
    lib.decode_partners(
        partner.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(N), ctypes.c_int32(nf), ctypes.c_int32(nfp),
        ctypes.c_int32(n_p),
        fn.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nbr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return nbr, sp.astype(bool)


def geometric_factors(verts: np.ndarray, cells: np.ndarray,
                      face_vertices: np.ndarray):
    """Affine-simplex geometry in one C pass (oracle: mesh/discrete.py).

    Returns (Ginv (E, dim, dim), detJ (E,), normals (E, nf, dim),
    Fscale (E, nf), h (E,)) — nf = dim + 1."""
    lib = _load()
    assert lib is not None
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    fv = np.ascontiguousarray(face_vertices, dtype=np.int64)
    E, dim = cells.shape[0], verts.shape[1]
    nf = dim + 1
    assert cells.shape[1] == nf and fv.shape == (nf, dim)
    ginv = np.empty((E, dim, dim), dtype=np.float64)
    detj = np.empty(E, dtype=np.float64)
    normals = np.empty((E, nf, dim), dtype=np.float64)
    fscale = np.empty((E, nf), dtype=np.float64)
    h = np.empty(E, dtype=np.float64)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.geometric_factors(
        verts.ctypes.data_as(pd),
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(E), ctypes.c_int32(dim),
        fv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ginv.ctypes.data_as(pd), detj.ctypes.data_as(pd),
        normals.ctypes.data_as(pd), fscale.ctypes.data_as(pd),
        h.ctypes.data_as(pd),
    )
    return ginv, detj, normals, fscale, h


def halo_needs(gids: np.ndarray, src: np.ndarray, dst: np.ndarray,
               P: int) -> dict:
    """Directed cross-shard needs: {(src, dst): sorted unique gids}
    (oracle: the lexsort + per-pair np.unique block of
    parallel/partition.py make_plan)."""
    lib = _load()
    assert lib is not None
    gids = np.ascontiguousarray(gids, dtype=np.int64)
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    n = len(gids)
    out = np.empty(n, dtype=np.int64)
    counts = np.empty(P * P, dtype=np.int64)
    total = lib.halo_needs(
        gids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n), ctypes.c_int32(P),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    needs: dict = {}
    off = 0
    for d_ in range(P):
        for s_ in range(P):
            c = int(counts[d_ * P + s_])
            if c:
                needs[(s_, d_)] = out[off : off + c].copy()
                off += c
    assert off == total
    return needs


def morton_argsort(q: np.ndarray, bits: int = 16) -> np.ndarray:
    """(n, dim) uint32 quantized coords -> Morton-order permutation."""
    lib = _load()
    assert lib is not None
    q = np.ascontiguousarray(q, dtype=np.uint32)
    n, dim = q.shape
    codes = np.empty(n, dtype=np.uint64)
    lib.morton_codes(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(n),
        ctypes.c_int32(dim),
        ctypes.c_int32(bits),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    perm = np.empty(n, dtype=np.int64)
    lib.argsort_u64(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_int64(n),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return perm
