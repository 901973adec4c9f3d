"""Offline calibration for the multi-band radiation solver
(mpas_tpu/physics/radiation.py).  Produces the hard-coded constants:

1. SW water vapor: an exponential-sum (k-distribution) fit to the
   Lacis & Hansen (1974, JAS 31, 118) broadband absorption function
       A_wv(y) = 2.9 y / ((1 + 141.5 y)^0.635 + 5.925 y)
   (y = scaled water path, g/cm^2).  The fit T(y) = sum_i w_i exp(-k_i y)
   with sum_i w_i = 1 represents the NIR transmission so each k-term can be
   composed layer-by-layer with delta-Eddington cloud scattering (adding
   method) — the published function alone cannot (it is non-exponential).

2. LW: H2O k-distribution weights/absorption coefficients + CO2/O3 band
   parameters calibrated so the flux integration reproduces published
   clear-sky column benchmarks (ICRCCM-class values; see ANCHORS below)
   on McClatchey-style standard atmospheres.

Run:  python tools/calibrate_radiation.py
and copy the printed tables into radiation.py (provenance: this script).
"""

import numpy as np
from scipy.optimize import least_squares

SIGMA = 5.670374419e-8


# ---------------------------------------------------------------------------
# 1. SW H2O exponential-sum fit
# ---------------------------------------------------------------------------

def a_wv_lh74(y):
    """Lacis & Hansen (1974) eq. 17 broadband water-vapor absorption
    (fraction of TOTAL solar flux absorbed for scaled path y g/cm^2)."""
    return 2.9 * y / ((1.0 + 141.5 * y) ** 0.635 + 5.925 * y)


A_WV_SAT = 2.9 / 5.925          # y -> inf limit: 0.4894... of total solar


def fit_sw_h2o(n_terms=6):
    y = np.logspace(-5, 1.8, 400)          # 1e-5 .. 63 g/cm^2
    t_target = 1.0 - a_wv_lh74(y) / A_WV_SAT

    def unpack(p):
        w = np.abs(p[:n_terms])
        w = w / w.sum()
        k = np.exp(p[n_terms:])
        return w, k

    def resid(p):
        w, k = unpack(p)
        t = (w[None, :] * np.exp(-np.outer(y, k))).sum(axis=1)
        return (t - t_target) / (t_target + 0.01)

    p0 = np.concatenate([np.ones(n_terms) / n_terms,
                         np.log(np.logspace(-2, 3, n_terms))])
    sol = least_squares(resid, p0, max_nfev=20000)
    w, k = unpack(sol.x)
    order = np.argsort(k)
    w, k = w[order], k[order]
    t = (w[None, :] * np.exp(-np.outer(y, k))).sum(axis=1)
    err = np.abs(t - t_target).max()
    print(f"SW H2O exp-sum fit ({n_terms} terms): max |T - T_LH74| = {err:.4f}")
    print("SW_H2O_W =", np.array2string(w, precision=6, separator=", "))
    print("SW_H2O_K =", np.array2string(k, precision=6, separator=", "))
    return w, k


# ---------------------------------------------------------------------------
# 2. Standard atmospheres (shared with the package; approximate McClatchey)
# ---------------------------------------------------------------------------

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mpas_tpu.physics.standard_atmospheres import standard_atmosphere  # noqa: E402


# ---------------------------------------------------------------------------
# 3. LW flux integration (mirror of radiation.py's lw_fluxes, numpy)
# ---------------------------------------------------------------------------

DIFF = 1.66                                  # diffusivity factor
CO2_VMR = 3.8e-4
G = 9.80665


def lw_fluxes(atm, params):
    """k-distribution LW: per-term scan down (F_dn) and up (F_up).
    Bands: N_h2o H2O terms + 1 CO2 15um + 1 O3 9.6um + window continuum."""
    w_h2o, k_h2o, w_co2, k_co2, w_o3, k_o3, k_cnt = params
    t, q, o3 = atm["t"], atm["q"], atm["o3"]
    pint, pmid = atm["pint"], atm["pmid"]
    K = len(t)
    dp = pint[:-1] - pint[1:]
    # absorber paths per layer [kg/m^2 -> g/cm^2 = *0.1]
    u_h2o = q * dp / G * 0.1
    u_co2 = CO2_VMR * (44.0 / 28.97) * dp / G * 0.1
    u_o3 = o3 * dp / G * 0.1
    # pressure-broadening scaling
    pscale = (pmid / 1.01325e5) ** 0.8
    # e-type continuum: scaled by vapor pressure ~ q*p
    e_vap = q * pmid / 0.622
    u_cnt = u_h2o * (e_vap / 1000.0) * (296.0 / t) ** 4

    B = SIGMA * t ** 4
    B_sfc = SIGMA * atm["t_sfc"] ** 4

    # CO2 15um band as a 3-term k-distribution (fixed weight split; k ratios
    # 1 : 25 : 625) so the band response is ~logarithmic in CO2 — a single k
    # overshoots the doubling forcing by 2x
    co2_split = [(0.55, 1.0), (0.30, 25.0), (0.15, 625.0)]
    terms = []
    for w, tau in (
        [(w, DIFF * k * u_h2o * pscale + DIFF * k_cnt * u_cnt)
         for w, k in zip(w_h2o, k_h2o)]
        + [(w_co2 * f, DIFF * k_co2 * r * u_co2 * pscale)
           for f, r in co2_split]
        + [(w_o3, DIFF * k_o3 * u_o3)]
    ):
        terms.append((w, np.exp(-tau)))

    Fdn = np.zeros(K + 1)
    Fup = np.zeros(K + 1)
    for w, tr in terms:
        f = 0.0                              # downward at TOA
        fdn = np.zeros(K + 1)
        for i in range(K - 1, -1, -1):       # scan down
            f = f * tr[i] + w * B[i] * (1.0 - tr[i])
            fdn[i] = f
        f = w * B_sfc                        # upward at surface (eps=1)
        fup = np.zeros(K + 1)
        fup[0] = f
        for i in range(K):                   # scan up
            f = f * tr[i] + w * B[i] * (1.0 - tr[i])
            fup[i + 1] = f
        Fdn += fdn
        Fup += fup
    return Fup, Fdn


O3_W_FIXED = 0.04                            # 9.6um band Planck fraction


def unpack_lw(p, n_h2o):
    w = np.abs(p[:n_h2o + 1])
    w = w / w.sum() * (1.0 - O3_W_FIXED)
    k = np.exp(p[n_h2o + 1:2 * n_h2o + 3])
    k_cnt = np.exp(p[-1])
    return (w[:n_h2o], k[:n_h2o], w[n_h2o], k[n_h2o], O3_W_FIXED,
            k[n_h2o + 1], k_cnt)


# Published clear-sky anchors (ICRCCM-class LBL results for the McClatchey
# atmospheres; e.g. Ellingson et al. 1991, Clough et al.):
ANCHORS = [
    ("tropical", "olr", 288.0, 6.0),
    ("tropical", "dlr", 395.0, 3.0),
    ("midlat_summer", "olr", 280.0, 6.0),
    ("midlat_summer", "dlr", 345.0, 8.0),
    ("subarctic_winter", "olr", 200.0, 5.0),
    ("subarctic_winter", "dlr", 163.0, 8.0),
]


def fit_lw(n_h2o=5):
    atms = {k: standard_atmosphere(k) for k in
            ("tropical", "midlat_summer", "subarctic_winter")}

    def resid(p):
        params = unpack_lw(p, n_h2o)
        r = []
        for name, which, target, tol in ANCHORS:
            fup, fdn = lw_fluxes(atms[name], params)
            val = fup[-1] if which == "olr" else fdn[0]
            r.append((val - target) / tol)
        # regularizer: cooling rate near 2 K/day in tropical mid-troposphere
        fup, fdn = lw_fluxes(atms["tropical"], params)
        net = fup - fdn
        dp = atms["tropical"]["pint"][:-1] - atms["tropical"]["pint"][1:]
        cool = (net[1:] - net[:-1]) / dp * G / 1004.0 * 86400.0
        mid = slice(4, 14)                   # ~3-12 km
        r.append(((cool[mid].mean()) - 2.0) / 0.7)
        # CO2 doubling clear-sky instantaneous TOA forcing ~ -4 W/m^2
        global CO2_VMR
        olr1 = fup[-1]
        CO2_VMR *= 2
        olr2 = lw_fluxes(atms["tropical"], params)[0][-1]
        CO2_VMR /= 2
        r.append(((olr2 - olr1) - (-4.0)) / 1.0)
        return np.array(r)

    p0 = np.concatenate([
        np.full(n_h2o + 1, 1.0 / (n_h2o + 2)),
        np.log(np.logspace(-2, 2.5, n_h2o)), [np.log(1.0)], [np.log(20.0)],
        [np.log(300.0)],
    ])
    sol = least_squares(resid, p0, max_nfev=40000)
    params = unpack_lw(sol.x, n_h2o)
    w_h2o, k_h2o, w_co2, k_co2, w_o3, k_o3, k_cnt = params
    print("\nLW calibration results:")
    for name, which, target, tol in ANCHORS:
        fup, fdn = lw_fluxes(atms[name], params)
        val = fup[-1] if which == "olr" else fdn[0]
        print(f"  {name:17s} {which}: {val:7.1f}  (target {target} +- {tol})")
    fup, fdn = lw_fluxes(atms["tropical"], params)
    net = fup - fdn
    dp = atms["tropical"]["pint"][:-1] - atms["tropical"]["pint"][1:]
    cool = (net[1:] - net[:-1]) / dp * G / 1004.0 * 86400.0
    print(f"  tropical troposphere cooling: {cool[4:14].mean():.2f} K/day")
    # CO2 doubling (clear-sky instantaneous TOA forcing ~ 4-5 W/m^2 LBL)
    global CO2_VMR
    olr1 = lw_fluxes(atms["tropical"], params)[0][-1]
    CO2_VMR *= 2
    olr2 = lw_fluxes(atms["tropical"], params)[0][-1]
    CO2_VMR /= 2
    print(f"  2xCO2 tropical dOLR: {olr2 - olr1:+.2f} W/m^2")
    print("\nLW_H2O_W =", np.array2string(w_h2o, precision=6, separator=", "))
    print("LW_H2O_K =", np.array2string(k_h2o, precision=6, separator=", "))
    print(f"LW_CO2_W = {w_co2:.6f}\nLW_CO2_K = {k_co2:.6f}")
    print(f"LW_O3_W = {w_o3:.6f}\nLW_O3_K = {k_o3:.6f}")
    print(f"LW_CNT_K = {k_cnt:.6f}")
    return params


if __name__ == "__main__":
    fit_sw_h2o()
    fit_lw()
