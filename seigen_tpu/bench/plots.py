"""Artifact plots from the bench/FWI result files (the reference's pybench
harness shipped sweep plots; this is the rebuild's equivalent surface).

Reads whatever exists under results/ and writes PNGs to results/plots/:

- throughput_per_degree.png  : DOF-updates/s per degree across engine
                               generations (r1 lane / r2 fused / r3 merged)
- convergence_3d.png         : 3D eigenmode L2 error vs h per degree,
                               central-flux LF4 and upwind-RK4 panels
- fwi_recovery.png           : vp model slices (true / initial / recovered)
                               + misfit history, from an FWI npz
- seismogram.png             : receiver gather from a showcase npz

Styling follows the dataviz ground rules: fixed categorical hue order
(never cycled), sequential single-hue colormaps for magnitudes, a
two-hue + neutral-midpoint diverging map for signed differences, thin
marks, recessive grid, direct series labels, one axis per plot.

Usage: python -m seigen_tpu.bench.plots [outdir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

# categorical slots (validated order; see the dataviz palette reference)
C1, C2, C3, C4 = "#2a78d6", "#eb6834", "#1baf7a", "#eda100"
INK, INK2 = "#0b0b0b", "#52514e"


def _style(ax, title=None):
    ax.grid(True, alpha=0.25, linewidth=0.6)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK2)
    ax.tick_params(colors=INK2, labelsize=8)
    if title:
        ax.set_title(title, fontsize=9, color=INK, loc="left")


def plot_throughput(res_dir, out):
    import matplotlib.pyplot as plt

    rows = {}  # degree -> {gen: rate}
    r2 = os.path.join(res_dir, "r2_per_degree.json")
    if os.path.exists(r2):
        for rec in json.load(open(r2)):
            d = rec.get("degree")
            if d:
                rows.setdefault(d, {})["fused (r2)"] = rec["dof_rate"]
    for deg in (1, 2, 3, 4):
        f = os.path.join(res_dir, f"r3_per_degree_p{deg}.json")
        if os.path.exists(f):
            for rec in json.load(open(f)):
                rows.setdefault(deg, {})["merged (r3)"] = rec[
                    "dof_updates_per_sec"]
    if not rows:
        return False
    gens = ["fused (r2)", "merged (r3)"]
    colors = {"fused (r2)": C1, "merged (r3)": C2}
    degrees = sorted(rows)
    fig, ax = plt.subplots(figsize=(5.4, 3.2), dpi=150)
    w = 0.32
    for i, g in enumerate(gens):
        xs = [d + (i - 0.5) * w for d in degrees if g in rows[d]]
        ys = [rows[d][g] / 1e9 for d in degrees if g in rows[d]]
        if xs:
            ax.bar(xs, ys, width=w * 0.92, color=colors[g], label=g,
                   edgecolor="none")
    ax.set_xticks(degrees)
    ax.set_xticklabels([f"P{d}" for d in degrees])
    ax.set_ylabel("GDOF-updates / s / chip", fontsize=8, color=INK2)
    _style(ax, "3D explosive source, per-degree throughput by engine")
    ax.legend(frameon=False, fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "throughput_per_degree.png"))
    plt.close(fig)
    return True


def plot_convergence(res_dir, out):
    import matplotlib.pyplot as plt

    panels = []
    for tag, title in (("lf", "central flux, LF4"),
                       ("up", "upwind flux, RK4")):
        data = {}
        for f in os.listdir(res_dir):
            if f.startswith(f"conv3d_{tag}_") and f.endswith(".json"):
                sweep = json.load(open(os.path.join(res_dir, f)))["sweep"]
                for pname, rec in sweep.items():
                    deg = int(pname[1:])
                    for row in rec["rows"]:
                        data.setdefault(deg, []).append(
                            (row["N"], row["l2_error_u"]))
        if data:
            panels.append((title, data))
    if not panels:
        return False
    fig, axes = plt.subplots(1, len(panels), figsize=(5.2 * len(panels), 3.4),
                             dpi=150)
    axes = np.atleast_1d(axes)
    cols = {1: C1, 2: C2, 3: C3, 4: C4}
    for ax, (title, data) in zip(axes, panels):
        for deg in sorted(data):
            pts = sorted(data[deg])
            h = 1.0 / np.array([p[0] for p in pts])
            e = np.array([p[1] for p in pts])
            ax.loglog(h, e, "-o", color=cols[deg], linewidth=1.8,
                      markersize=4)
            # direct label with the observed tail order
            if len(pts) >= 2:
                slope = np.log(e[-1] / e[-2]) / np.log(h[-1] / h[-2])
                ax.annotate(f"P{deg} ({slope:.2f})", (h[0], e[0]),
                            textcoords="offset points", xytext=(6, -2),
                            fontsize=8, color=cols[deg])
        ax.set_xlabel("h", fontsize=8, color=INK2)
        ax.set_ylabel("L2 error", fontsize=8, color=INK2)
        _style(ax, f"3D eigenmode convergence — {title}")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "convergence_3d.png"))
    plt.close(fig)
    return True


def plot_fwi(res_dir, out, fname=None):
    import matplotlib.pyplot as plt

    if fname is None:
        for cand in ("fwi_salt3d_lane.npz", "fwi_salt3d.npz",
                     "fwi_demo.npz"):
            f = os.path.join(res_dir, cand)
            if os.path.exists(f):
                fname = f
                break
    if fname is None or not os.path.exists(fname):
        return False
    z = np.load(fname)
    vp_t, vp_i, vp_f = z["vp_true"], z["vp_init"], z["vp_final"]
    cent = z["centroids"]
    mis = z["misfits"]
    dim = cent.shape[1]
    # mid-slice scatter (element-wise DG fields live at centroids)
    if dim == 3:
        mid = np.abs(cent[:, 1] - np.median(cent[:, 1])) < 0.08
        x, y = cent[mid, 0], cent[mid, 2]
        fields = [vp_t[mid], vp_i[mid], vp_f[mid]]
    else:
        mid = np.ones(len(cent), bool)
        x, y = cent[:, 0], cent[:, 1]
        fields = [vp_t, vp_i, vp_f]
    vmin = min(f.min() for f in fields)
    vmax = max(f.max() for f in fields)
    fig, axes = plt.subplots(1, 4, figsize=(13, 3.1), dpi=150)
    titles = ["true vp", "initial vp", "recovered vp"]
    for ax, f, t in zip(axes[:3], fields, titles):
        # Delaunay over element centroids: continuous single-hue fill
        sc = ax.tripcolor(x, y, f, cmap="Blues", vmin=vmin, vmax=vmax,
                          shading="gouraud")
        ax.set_aspect("equal")
        _style(ax, t)
        ax.grid(False)
    fig.colorbar(sc, ax=axes[2], shrink=0.85)
    ax = axes[3]
    ax.semilogy(np.arange(len(mis)), mis, color=C1, linewidth=1.8)
    ax.set_xlabel("iteration", fontsize=8, color=INK2)
    ax.set_ylabel("misfit", fontsize=8, color=INK2)
    _style(ax, "misfit history")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "fwi_recovery.png"))
    plt.close(fig)
    return True


def plot_seismogram(res_dir, out):
    import matplotlib.pyplot as plt

    for cand in ("showcase_3d_layered_salt.npz", "unstructured_gmsh_demo.npz"):
        f = os.path.join(res_dir, cand)
        if not os.path.exists(f):
            continue
        z = np.load(f)
        key = "seis" if "seis" in z else ("seismograms"
                                          if "seismograms" in z else None)
        if key is None:
            continue
        seis = z[key]  # (n_steps, R, C)
        g = seis[:, :, -1]  # vertical / pressure component
        fig, ax = plt.subplots(figsize=(5.2, 3.4), dpi=150)
        lim = np.abs(g).max() or 1.0
        # diverging: two hues + neutral midpoint (signed amplitude)
        im = ax.imshow(g.T, aspect="auto", cmap="RdBu_r", vmin=-lim,
                       vmax=lim, interpolation="nearest")
        ax.set_xlabel("time step", fontsize=8, color=INK2)
        ax.set_ylabel("receiver", fontsize=8, color=INK2)
        _style(ax, f"receiver gather — {os.path.basename(f)}")
        fig.colorbar(im, ax=ax, shrink=0.85)
        fig.tight_layout()
        fig.savefig(os.path.join(out, "seismogram.png"))
        plt.close(fig)
        return True
    return False


def main(outdir=None):
    res_dir = os.path.join(os.path.dirname(__file__), "..", "..", "results")
    res_dir = os.path.abspath(res_dir)
    out = outdir or os.path.join(res_dir, "plots")
    os.makedirs(out, exist_ok=True)
    made = {
        "throughput": plot_throughput(res_dir, out),
        "convergence": plot_convergence(res_dir, out),
        "fwi": plot_fwi(res_dir, out),
        "seismogram": plot_seismogram(res_dir, out),
    }
    print(json.dumps({"outdir": out, "made": made}))
    return made


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
