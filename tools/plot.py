#!/usr/bin/env python
"""Voronoi-cell plotting of history files.

Rebuilds plotting/mpas-plotting.py + mpas_patches.py (SURVEY.md section 2.9)
without the deprecated Basemap dependency: builds a matplotlib PatchCollection
of the Voronoi cells (cached to a pickle like the reference) and plots any
cell variable from a history netCDF on a plate-carree axis.

Usage:
    python tools/plot.py timestep_output.nc -v pressure_p [-l LEVEL] [-o out.png]
"""

import argparse
import os
import pickle

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.collections import PatchCollection
from matplotlib.patches import Polygon

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from mpas_tpu.mesh.netcdf_io import read_netcdf  # noqa: E402


def get_mpas_patches(data, pickle_path=None):
    """Polygon per cell from verticesOnCell (mpas_patches.py:35-116)."""
    if pickle_path and os.path.exists(pickle_path):
        with open(pickle_path, "rb") as f:
            return pickle.load(f)
    lonC = np.degrees(data["lonCell"])
    # normalize to [-180, 180) so the axis is a single clean pane
    lonV = (np.degrees(data["lonVertex"]) + 180.0) % 360.0 - 180.0
    latV = np.degrees(data["latVertex"])
    nEdges = data["nEdgesOnCell"]
    voc = data["verticesOnCell"] - 1
    patches = []
    for c in range(len(lonC)):
        n = nEdges[c]
        lons = lonV[voc[c, :n]]
        lats = latV[voc[c, :n]]
        # unwrap cells straddling the dateline
        if lons.max() - lons.min() > 180.0:
            lons = np.where(lons > 180.0, lons - 360.0, lons)
        patches.append(Polygon(np.column_stack([lons, lats])))
    coll = PatchCollection(patches)
    if pickle_path:
        with open(pickle_path, "wb") as f:
            pickle.dump(coll, f)
    return coll


def plot_variable(nc_path, var, level=0, out=None, cmap="viridis"):
    data = read_netcdf(nc_path)
    coll = get_mpas_patches(data, pickle_path=nc_path + ".patches.pkl")
    if var not in data:
        plottable = sorted(k for k, v in data.items()
                           if getattr(v, "ndim", 0) >= 1
                           and v.shape[0] == len(data["lonCell"]))
        raise SystemExit(f"plot.py: variable {var!r} not in {nc_path}; "
                         f"cell variables available: {', '.join(plottable)}")
    field = data[var]
    if field.ndim == 2:
        field = field[:, min(level, field.shape[1] - 1)]
    fig, ax = plt.subplots(figsize=(12, 6))
    coll.set_array(field)
    coll.set_cmap(cmap)
    coll.set_edgecolor("face")
    ax.add_collection(coll)
    ax.set_xlim(-180, 180)
    ax.set_ylim(-90, 90)
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    ax.set_title(f"{var} (level {level})")
    fig.colorbar(coll, ax=ax, shrink=0.8)
    out = out or f"{var}_l{level}.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("ncfile")
    ap.add_argument("-v", "--var", default="pressure_p")
    ap.add_argument("-l", "--level", type=int, default=0)
    ap.add_argument("-o", "--out", default=None)
    a = ap.parse_args()
    print(plot_variable(a.ncfile, a.var, a.level, a.out))
