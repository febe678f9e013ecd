"""Gmsh .msh import (ASCII v2.2 and v4.1) — no external dependencies.

Reference parity: Seigen's production runs read Gmsh unstructured meshes via
Firedrake's Mesh() (SURVEY.md §3 "Mesh handling"); structured meshers cover
the [D] configs, so this importer handles the common ASCII subsets and takes
only the highest-dimensional simplices (triangles or tets).
"""

from __future__ import annotations

import numpy as np

from .structured import MeshTopology, _orient_positive

# Gmsh element type ids
_TRI = 2
_TET = 4


def read_msh(path: str, periodic: tuple = ()) -> MeshTopology:
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0

    def section(name):
        nonlocal i
        while i < len(lines) and lines[i].strip() != f"${name}":
            i += 1
        if i == len(lines):
            return None
        i += 1
        start = i
        while lines[i].strip() != f"$End{name}":
            i += 1
        body = lines[start:i]
        i += 1
        return body

    fmt = section("MeshFormat")
    if fmt is None:
        raise ValueError("not a Gmsh file (no $MeshFormat)")
    version = float(fmt[0].split()[0])
    i = 0  # rewind for the data sections

    if version < 4.0:
        nodes_body = section("Nodes")
        i = 0
        elems_body = section("Elements")
        n_nodes = int(nodes_body[0])
        coords = np.zeros((n_nodes, 3))
        idmap = {}
        for k, ln in enumerate(nodes_body[1 : 1 + n_nodes]):
            parts = ln.split()
            idmap[int(parts[0])] = k
            coords[k] = [float(x) for x in parts[1:4]]
        cells = {_TRI: [], _TET: []}
        n_el = int(elems_body[0])
        for ln in elems_body[1 : 1 + n_el]:
            parts = [int(x) for x in ln.split()]
            etype = parts[1]
            if etype in cells:
                ntags = parts[2]
                vs = parts[3 + ntags :]
                cells[etype].append([idmap[v] for v in vs])
    else:
        nodes_body = section("Nodes")
        i = 0
        elems_body = section("Elements")
        # v4.1 $Nodes: numBlocks numNodes minTag maxTag
        hdr = nodes_body[0].split()
        n_blocks, n_nodes = int(hdr[0]), int(hdr[1])
        coords = np.zeros((n_nodes, 3))
        idmap = {}
        row = 1
        count = 0
        for _ in range(n_blocks):
            bh = nodes_body[row].split()
            nb = int(bh[3])
            row += 1
            tags = [int(nodes_body[row + j]) for j in range(nb)]
            row += nb
            for j in range(nb):
                parts = nodes_body[row + j].split()
                idmap[tags[j]] = count
                coords[count] = [float(x) for x in parts[:3]]
                count += 1
            row += nb
        cells = {_TRI: [], _TET: []}
        hdr = elems_body[0].split()
        n_blocks = int(hdr[0])
        row = 1
        for _ in range(n_blocks):
            bh = elems_body[row].split()
            etype, nb = int(bh[2]), int(bh[3])
            row += 1
            for j in range(nb):
                parts = [int(x) for x in elems_body[row + j].split()]
                if etype in cells:
                    cells[etype].append([idmap[v] for v in parts[1:]])
            row += nb

    if cells[_TET]:
        cell_arr = np.array(cells[_TET], dtype=np.int64)
        dim = 3
    elif cells[_TRI]:
        cell_arr = np.array(cells[_TRI], dtype=np.int64)
        dim = 2
    else:
        raise ValueError("no triangles or tetrahedra found")

    verts = coords[:, :dim]
    # drop unused vertices (e.g. from lower-dim physical groups)
    used = np.unique(cell_arr)
    remap = -np.ones(len(verts), dtype=np.int64)
    remap[used] = np.arange(len(used))
    verts = verts[used]
    cell_arr = remap[cell_arr]
    cell_arr = _orient_positive(verts, cell_arr)
    extents = tuple(
        (float(verts[:, d].min()), float(verts[:, d].max()))
        for d in range(dim)
    )
    return MeshTopology(
        vertices=verts, cells=cell_arr, extents=extents,
        periodic=tuple(periodic),
    )
