"""Physics driver: cloudiness + CAM-style SW/LW radiation scaffolding.

Rebuilds the reference physics-driver call tree (atmphys_driver.rg:23-62,
atmphys_driver_cloudiness.rg, atmphys_driver_radiation_swlw.rg, ra_cam.rg)
with the same structure — physics_init -> per-step driver_cloudiness ->
driver_radiation_sw -> driver_radiation_lw — but with working column
physics where the reference has empty stubs:

  - cloud fraction: relative-humidity scheme (the calc_cldfraction slot,
    atmphys_driver_cloudiness.rg:19-20, empty in the reference);
  - ozone: built-in standard climatology feeding the implemented
    oznint -> radozn -> radinp chain (ra_cam.rg:109-115);
  - radiation: a gray-atmosphere two-stream column model standing in for
    radcswmx/radclwmx (stubs in the reference, ra_cam_radctl_support.rg:546,
    552) producing physically-scaled heating rates and surface fluxes.

All computations are columnar (embarrassingly parallel over cells) and jit-
compatible; the driver returns tendencies that couple into the dycore via
state.rt_diabatic_tend.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants
from . import radiation_support as rs
from . import tables as tbl


# ---------------------------------------------------------------------------
# initialization (physics_init / camradinit)
# ---------------------------------------------------------------------------

def standard_ozone_profile(levsiz: int = constants.nOznLevels):
    """Built-in climatological ozone: pressure levels [Pa] + volume mixing
    ratio with a stratospheric peak near 10 hPa (oznini slot,
    atmphys_camrad_init.rg:258-264)."""
    pin = np.logspace(np.log10(100.0), np.log10(1.0e5), levsiz)   # 1 hPa..1000 hPa
    p_hpa = pin / 100.0
    # single-mode lognormal peak ~ 8 ppmv at 10 hPa, ~0.03 ppmv at surface
    o3 = 8.0e-6 * np.exp(-0.5 * (np.log(p_hpa / 10.0) / 1.1) ** 2) + 3.0e-8
    return pin, o3


@dataclass
class PhysicsState:
    """Tables + climatologies (phys_tbls_fs / ozn_fs / aerosol_fs analog)."""
    tables: tbl.SaturationTables
    pin: np.ndarray          # [nOznLevels] ozone data pressures
    ozmixm: np.ndarray       # [nMonths, nOznLevels] monthly ozone vmr
    m_hybi: np.ndarray       # [nAerLevels+1] aerosol hybrid interface coords
    aerosolc: np.ndarray | None = None


def physics_init(n_cells: int | None = None) -> PhysicsState:
    """physics_init -> camradinit (atmphys_init.rg:9-23)."""
    tables = tbl.camradinit()
    pin, o3 = standard_ozone_profile()
    # annual cycle: +-15% seasonal modulation of the column
    months = np.arange(constants.nMonths)
    seasonal = 1.0 + 0.15 * np.cos(2 * np.pi * (months - 3) / 12.0)
    ozmixm = seasonal[:, None] * o3[None, :]
    m_hybi = np.linspace(0.0, 1.0, constants.nAerLevels + 1)
    return PhysicsState(tables=tables, pin=pin, ozmixm=ozmixm, m_hybi=m_hybi)


# ---------------------------------------------------------------------------
# cloudiness (driver_cloudiness)
# ---------------------------------------------------------------------------

def calc_cldfraction(qv, qsat):
    """RH-based fractional cloudiness (the empty calc_cldfraction slot):
    cldfra = ((RH - RHc)/(1 - RHc))^2, RHc = 0.80."""
    rh = np.clip(qv / np.maximum(qsat, 1e-12), 0.0, 1.0)
    rhc = 0.80
    return np.clip((rh - rhc) / (1.0 - rhc), 0.0, 1.0) ** 2


def calc_cldincidence(qc, qi=None):
    """0/1 cloud incidence from condensate (calc_cldincidence slot)."""
    qtot = qc if qi is None else qc + qi
    return (qtot > 1e-8).astype(np.float64)


def driver_cloudiness(qv, qsat, scheme: str = "cld_fraction", qc=None):
    if scheme == "cld_incidence":
        return calc_cldincidence(qc if qc is not None else np.zeros_like(qv))
    return calc_cldfraction(qv, qsat)


# ---------------------------------------------------------------------------
# radiation (driver_radiation_sw / driver_radiation_lw -> camrad -> radctl)
# ---------------------------------------------------------------------------

def _column_pressures(pressure, pressure_sfc):
    """Mid and interface pressures per column from 3-D pressure [C, K]."""
    C, K = pressure.shape
    pint = np.zeros((C, K + 1))
    pint[:, 0] = pressure_sfc
    pint[:, 1:K] = 0.5 * (pressure[:, :-1] + pressure[:, 1:])
    pint[:, K] = np.maximum(1.5 * pressure[:, -1] - 0.5 * pressure[:, -2], 1.0)
    return pressure, pint


def radctl(phys: PhysicsState, t, qv, pmid, pint, cldfra, coszrs, julian,
           albedo=0.2, emiss=0.95, tsfc=None):
    """The radctl chain (ra_cam.rg:31-128): ozone time/vertical interpolation,
    cgs conversion, saturation humidity, then SW/LW column fluxes.

    Returns dict with heating rates [K/s] (qrs, qrl), surface fluxes and
    TOA diagnostics."""
    C, K = t.shape
    g, cp = constants.gravity, constants.cp

    # --- implemented support chain (matches reference) ---
    ozmix_now = rs.oznint(julian, phys.ozmixm)                 # [levsiz]
    ozmix = np.broadcast_to(ozmix_now, (C, len(ozmix_now)))
    o3vmr = rs.radozn(pmid, phys.pin, ozmix)                   # [C, K]
    pbr, pnm, o3mmr = rs.radinp(pmid, pint, o3vmr)
    esat, qsat = tbl.aqsat(t, pmid, phys.tables)

    dp = pint[:, 1:] - pint[:, :-1]                            # [C, K] (>0 downward)
    dp = np.abs(dp)
    path = dp / g                                              # mass path kg/m^2

    tsfc = tsfc if tsfc is not None else t[:, 0]

    # --- SW: Beer-law absorption with cloud albedo (radcswmx slot) ---
    declin, solcon = rs.radconst(julian)
    mu0 = np.maximum(coszrs, 0.0)                              # [C]
    day = mu0 > 0.0
    # broadband absorptance: water vapor + ozone
    tau_sw = 0.02 * (qv * path) ** 0.5 + 15.0 * o3mmr * path
    # cumulative transmission from TOA (level K-1 = top)
    tau_cum = np.cumsum(tau_sw[:, ::-1], axis=1)[:, ::-1]
    mu = np.maximum(mu0[:, None], 0.05)
    cld_above = np.maximum.accumulate((cldfra * 0.7)[:, ::-1], axis=1)[:, ::-1]
    s_toa = solcon * mu0
    flux = s_toa[:, None] * np.exp(-tau_cum / mu) * (1.0 - cld_above)
    # downward flux grows toward the top; the difference across a layer is
    # the energy it absorbs
    absorbed = np.diff(np.concatenate([flux, s_toa[:, None]], axis=1), axis=1)
    absorbed = np.maximum(absorbed, 0.0)
    qrs = np.where(day[:, None], absorbed / (cp * path), 0.0)  # K/s
    swdnb = flux[:, 0] * (1.0 - albedo)

    # --- LW: gray two-stream cooling-to-space (radclwmx slot) ---
    sb = constants.stbolt
    tau_lw = 0.25 * qv * path + 1.5 * cldfra * 0.1 + 0.017 * path * 0.0 + 1e-4
    eps_lw = 1.0 - np.exp(-tau_lw)
    # cooling to space approximation per layer
    trans_above = np.concatenate(
        [np.exp(-np.cumsum(tau_lw[:, ::-1], axis=1))[:, ::-1][:, 1:],
         np.ones((C, 1))], axis=1)
    cool = eps_lw * sb * t ** 4 * trans_above                   # W/m^2 emitted to space
    qrl = -cool / (cp * path)
    olr = (cool.sum(axis=1) + sb * tsfc ** 4
           * np.exp(-tau_lw.sum(axis=1)) * emiss)
    lwdnb = emiss * sb * (t[:, 0] ** 2 * tsfc ** 2)             # crude back-radiation

    return dict(qrs=qrs, qrl=qrl, o3vmr=o3vmr, qsat=qsat, esat=esat,
                swdnb=swdnb, lwdnb=lwdnb, olr=olr, solcon=solcon,
                declin=declin)


def cosine_zenith(lat, lon, julian):
    """Cosine solar zenith angle at the given julian day/time."""
    declin, _ = rs.radconst(julian)
    hour_angle = 2.0 * np.pi * (julian % 1.0) + lon - np.pi
    return (np.sin(lat) * np.sin(declin)
            + np.cos(lat) * np.cos(declin) * np.cos(hour_angle))


def physics_driver(phys: PhysicsState, state_np: dict, mesh, julian: float):
    """Per-step physics driver (atmphys_driver.rg:23-62): cloudiness ->
    SW radiation -> LW radiation -> diabatic theta tendency.

    `state_np` needs: theta_m [C,K], exner [C,K], pressure [C,K],
    surface_pressure [C], qv [C,K] (zeros if dry).
    Returns dict with rthraten (d(theta)/dt, K/s), cldfra, and flux
    diagnostics."""
    t = state_np["theta_m"] * state_np["exner"]
    qv = state_np.get("qv")
    if qv is None:
        qv = np.zeros_like(t)
    pmid, pint = _column_pressures(state_np["pressure"],
                                   state_np["surface_pressure"])
    esat, qsat = tbl.aqsat(t, pmid, phys.tables)
    cldfra = driver_cloudiness(qv, qsat)
    coszrs = cosine_zenith(mesh.latCell, mesh.lonCell, julian)
    rad = radctl(phys, t, qv, pmid, pint, cldfra, coszrs, julian)
    # temperature tendency -> potential temperature tendency
    rthraten = (rad["qrs"] + rad["qrl"]) / state_np["exner"]
    return dict(rthraten=rthraten, cldfra=cldfra, **rad)
