"""Render the round-5 validation artifacts to docs/validation PNGs:

  jw15_40962_sp.png   day-15 surface pressure at production resolution
                      (the analog of the reference's golden day15.png)
  mw_w_xsection.png   mountain-wave w(x, z) equatorial cross-section,
                      simulation vs linear theory
  supercell_w.png     supercell free-run w and graupel fields

Field plots use a diverging two-hue map with a neutral midpoint (RdBu_r)
for signed fields and a single-hue sequential map for magnitudes; axes and
grids stay recessive.  Usage: python tools/plot_artifacts.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

VDIR = os.path.join(os.path.dirname(__file__), os.pardir, "docs", "validation")


def _style(ax):
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.tick_params(colors="#555555", labelsize=8)
    for s in ax.spines.values():
        s.set_color("#bbbbbb")


def plot_jw15_prod():
    for ncells, dx in ((40962, 120), (10242, 240)):
        path = os.path.join(VDIR, f"jw15_{ncells}.npz")
        if not os.path.exists(path):
            continue
        d = np.load(path)
        lon = np.degrees(d["lonCell"])
        lat = np.degrees(d["latCell"])
        sp = d["surface_pressure"] / 100.0
        fig, ax = plt.subplots(figsize=(9, 4.5), dpi=150)
        vmax = max(abs(sp - 1000.0).max(), 1.0)
        t = ax.tripcolor(lon, lat, sp, cmap="RdBu_r",
                         vmin=1000.0 - vmax, vmax=1000.0 + vmax)
        cb = fig.colorbar(t, ax=ax, shrink=0.85,
                          label="surface pressure [hPa]")
        cb.outline.set_visible(False)
        ax.set_xlabel("longitude [deg]")
        ax.set_ylabel("latitude [deg]")
        ax.set_title(f"JW baroclinic wave, day 15 — x1.{ncells} ({dx} km), "
                     f"26 levels  (min {sp.min():.0f} hPa)", fontsize=10)
        _style(ax)
        out = os.path.join(VDIR, f"jw15_{ncells}_sp.png")
        fig.tight_layout()
        fig.savefig(out)
        print("saved", out)


def plot_mw_xsection():
    path = os.path.join(VDIR, "mw_state.npz")
    if not os.path.exists(path):
        return
    from mpas_tpu.config import Namelist
    from mpas_tpu.init.mountain_wave import linear_schar_solution
    d = np.load(path)
    lat, lon = d["latCell"], d["lonCell"]
    a = float(d["sphere_radius"])
    dx = float(d["dc_mean"])
    band = np.abs(lat) < 0.6 * dx / a
    order = np.argsort(lon[band])
    idx = np.nonzero(band)[0][order]
    x = (lon[idx] - np.pi) * a
    zg = d["zgrid"][:, idx]
    w = d["w"][:, idx]
    zs = np.arange(200.0, 8001.0, 200.0)
    w_sim = np.array([
        [np.interp(z, zg[:, j], w[:, j]) for j in range(len(idx))]
        for z in zs])
    t0, u0, h0, dd, xi = d["namelist_kw"]
    nl = Namelist(config_init_case=21, config_coriolis=False,
                  config_vertical_stretch=1.0, dtype="float64",
                  config_mtn_t0=t0, config_mtn_u0=u0, config_mtn_h0=h0,
                  config_mtn_halfwidth=dd, config_mtn_wavelength=xi)
    w_lin = linear_schar_solution(x, zs, nl)
    vmax = 2.0
    fig, axs = plt.subplots(1, 2, figsize=(10, 3.6), dpi=150, sharey=True)
    for ax, fld, title in ((axs[0], w_sim, "simulated (3000 s)"),
                           (axs[1], w_lin, "linear theory (steady)")):
        p = ax.pcolormesh(x / 1e3, zs / 1e3, fld, cmap="RdBu_r",
                          vmin=-vmax, vmax=vmax, shading="nearest")
        ax.set_xlim(-30, 30)
        ax.set_xlabel("x [km]")
        ax.set_title(title, fontsize=10)
        _style(ax)
    axs[0].set_ylabel("z [km]")
    cb = fig.colorbar(p, ax=axs, shrink=0.9, label="w [m/s]")
    cb.outline.set_visible(False)
    fig.suptitle("Schar mountain wave, equatorial cross-section "
                 "(241 m spacing, reduced planet X=500)", fontsize=11)
    out = os.path.join(VDIR, "mw_w_xsection.png")
    fig.savefig(out, bbox_inches="tight")
    print("saved", out)


def plot_supercell():
    path = os.path.join(VDIR, "supercell_state.npz")
    if not os.path.exists(path):
        return
    d = np.load(path)
    lon = np.degrees(d["lonCell"])
    lat = np.degrees(d["latCell"])
    wcol = np.abs(d["w"]).max(axis=0)               # column-max |w|
    qg = d["scalars"][5].max(axis=0) * 1e3          # column-max qg [g/kg]
    rain = d["rainnc"]
    fig, axs = plt.subplots(1, 3, figsize=(13, 3.6), dpi=150, sharey=True)
    specs = ((wcol, "Blues", "column-max |w| [m/s]"),
             (qg, "Purples", "column-max graupel [g/kg]"),
             (rain, "Greens", "accumulated precip [mm]"))
    for ax, (fld, cmap, label) in zip(axs, specs):
        t = ax.tripcolor(lon, lat, fld, cmap=cmap)
        cb = fig.colorbar(t, ax=ax, shrink=0.85)
        cb.outline.set_visible(False)
        ax.set_title(label, fontsize=10)
        ax.set_xlabel("longitude [deg]")
        _style(ax)
    axs[0].set_ylabel("latitude [deg]")
    fig.suptitle("WK82 storm free run, t = 2 h (4.8 km, full WSM6 + PBL)",
                 fontsize=11)
    out = os.path.join(VDIR, "supercell_w.png")
    fig.savefig(out, bbox_inches="tight")
    print("saved", out)


if __name__ == "__main__":
    plot_jw15_prod()
    plot_mw_xsection()
    plot_supercell()
