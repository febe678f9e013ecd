"""Gmsh importer round-trip tests (write-our-own .msh, read back, solve)."""

import numpy as np

from seigen_tpu.mesh import build_discrete, rect_mesh
from seigen_tpu.mesh.gmsh_io import read_msh


def _write_msh_v2(path, topo):
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{len(topo.vertices)}\n")
        for k, v in enumerate(topo.vertices):
            z = v[2] if topo.dim == 3 else 0.0
            f.write(f"{k+1} {v[0]} {v[1]} {z}\n")
        f.write("$EndNodes\n")
        etype = 2 if topo.dim == 2 else 4
        f.write(f"$Elements\n{len(topo.cells)}\n")
        for k, c in enumerate(topo.cells):
            vs = " ".join(str(v + 1) for v in c)
            f.write(f"{k+1} {etype} 2 0 0 {vs}\n")
        f.write("$EndElements\n")


def test_msh_v2_roundtrip(tmp_path):
    topo = rect_mesh(4, 3)
    path = str(tmp_path / "m.msh")
    _write_msh_v2(path, topo)
    topo2 = read_msh(path)
    assert topo2.num_cells == topo.num_cells
    assert np.allclose(np.sort(topo2.vertices, axis=0),
                       np.sort(topo.vertices, axis=0))
    # the imported mesh builds a valid discrete mesh
    dm = build_discrete(topo2, 2)
    assert abs(dm.detJ.sum() / 2 - 1.0) < 1e-12
