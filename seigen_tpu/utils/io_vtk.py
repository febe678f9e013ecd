"""VTK output for ParaView (SURVEY.md §3 "Output/visualization").

Rebuild of the reference's Firedrake ``File("x.pvd")`` field dumps: writes
VTU (XML unstructured grid, ASCII — no external deps) snapshots of nodal DG
fields plus a PVD collection file indexing them by time.  DG fields are
written with discontinuous (per-element) points, which ParaView renders
natively.
"""

from __future__ import annotations

import os

import numpy as np

from ..mesh.discrete import DiscreteMesh

_VTK_CELL_LINEAR = {2: 5, 3: 10}  # triangle / tetra


def write_vtu(
    path: str,
    dm: DiscreteMesh,
    fields: dict[str, np.ndarray],
    verts: np.ndarray | None = None,
) -> None:
    """Write nodal DG fields as a VTU file (linear sub-cells at the element
    vertices for simplicity and robustness across readers).

    fields: name -> (E, n_p, C) or (E, n_p) arrays.
    verts: optional (E, dim+1, dim) element-vertex coordinate override —
    curvilinear meshes (ops/curvilinear.py) pass their mapped vertices so
    the written geometry shows the curved domain.
    """
    E = dm.num_elements
    dim = dm.dim
    re = dm.re
    if verts is None:
        # vertices of each element from topology (affine geometry)
        verts = dm.topology.vertices[dm.topology.cells]  # (E, dim+1, dim)
    npts = E * (dim + 1)
    pts3 = np.zeros((npts, 3))
    pts3[:, :dim] = verts.reshape(-1, dim)

    conn = np.arange(npts, dtype=np.int64).reshape(E, dim + 1)
    offsets = (np.arange(E) + 1) * (dim + 1)
    ctype = np.full(E, _VTK_CELL_LINEAR[dim], dtype=np.uint8)

    # sample each field at the element vertices (ref coords = simplex verts)
    Bv = re.eval_basis(re.vertices)  # (dim+1, n_p)

    def fmt(a):
        return " ".join(f"{x:.9g}" for x in np.asarray(a).ravel())

    lines = []
    lines.append('<?xml version="1.0"?>')
    lines.append(
        '<VTKFile type="UnstructuredGrid" version="0.1" '
        'byte_order="LittleEndian">'
    )
    lines.append("  <UnstructuredGrid>")
    lines.append(
        f'    <Piece NumberOfPoints="{npts}" NumberOfCells="{E}">'
    )
    lines.append("      <Points>")
    lines.append(
        '        <DataArray type="Float64" NumberOfComponents="3" '
        'format="ascii">'
    )
    lines.append("          " + fmt(pts3))
    lines.append("        </DataArray>")
    lines.append("      </Points>")
    lines.append("      <PointData>")
    for name, arr in fields.items():
        arr = np.asarray(arr)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        C = arr.shape[2]
        vals = np.einsum("vi,eic->evc", Bv, arr)  # (E, dim+1, C)
        if C == dim:  # pad vectors to 3 components for ParaView
            pad = np.zeros((E, dim + 1, 3))
            pad[:, :, :dim] = vals
            vals, C = pad, 3
        lines.append(
            f'        <DataArray type="Float64" Name="{name}" '
            f'NumberOfComponents="{C}" format="ascii">'
        )
        lines.append("          " + fmt(vals))
        lines.append("        </DataArray>")
    lines.append("      </PointData>")
    lines.append("      <Cells>")
    lines.append(
        '        <DataArray type="Int64" Name="connectivity" format="ascii">'
    )
    lines.append("          " + fmt(conn))
    lines.append("        </DataArray>")
    lines.append(
        '        <DataArray type="Int64" Name="offsets" format="ascii">'
    )
    lines.append("          " + fmt(offsets))
    lines.append("        </DataArray>")
    lines.append(
        '        <DataArray type="UInt8" Name="types" format="ascii">'
    )
    lines.append("          " + fmt(ctype))
    lines.append("        </DataArray>")
    lines.append("      </Cells>")
    lines.append("    </Piece>")
    lines.append("  </UnstructuredGrid>")
    lines.append("</VTKFile>")
    with open(path, "w") as f:
        f.write("\n".join(lines))


class PVDWriter:
    """Time-series collection: reference parity with Firedrake File('x.pvd')."""

    def __init__(self, path: str, dm: DiscreteMesh,
                 verts: np.ndarray | None = None):
        assert path.endswith(".pvd")
        self.path = path
        self.dm = dm
        self.verts = verts
        self.base = path[:-4]
        self.entries: list[tuple[float, str]] = []
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def write(self, t: float, fields: dict[str, np.ndarray]) -> str:
        vtu = f"{self.base}_{len(self.entries):05d}.vtu"
        write_vtu(vtu, self.dm, fields, verts=self.verts)
        self.entries.append((t, os.path.basename(vtu)))
        self._flush()
        return vtu

    def _flush(self):
        lines = [
            '<?xml version="1.0"?>',
            '<VTKFile type="Collection" version="0.1">',
            "  <Collection>",
        ]
        for t, f in self.entries:
            lines.append(
                f'    <DataSet timestep="{t}" group="" part="0" file="{f}"/>'
            )
        lines += ["  </Collection>", "</VTKFile>"]
        with open(self.path, "w") as f:
            f.write("\n".join(lines))
