"""Physics driver: cloudiness + multi-band CAM-style SW/LW radiation.

Rebuilds the reference physics-driver call tree (atmphys_driver.rg:23-62,
atmphys_driver_cloudiness.rg, atmphys_driver_radiation_swlw.rg, ra_cam.rg)
with the same structure — physics_init -> per-interval driver: cloudiness ->
SW radiation -> LW radiation — but with working column physics where the
reference has empty stubs:

  - cloud fraction: relative-humidity scheme + condensate incidence (the
    calc_cldfraction/calc_cldincidence slots, atmphys_driver_cloudiness.rg:
    19-20, empty in the reference);
  - cloud optics: cldefr/cldems/cldovrlap equivalents (ra_cam_cld_support.rg
    :4-11, stubs in the reference) in physics/radiation.py;
  - ozone: built-in climatology feeding the implemented oznint -> radozn ->
    radinp chain (ra_cam.rg:109-115);
  - aerosol: background sulfate climatology consumed through
    vert_interpolate (ra_cam_radctl_support.rg:353-532) into the SW solve;
  - radiation: the calibrated multi-band solver (radiation.py) standing in
    the radcswmx/radclwmx slots (stubs at ra_cam_radctl_support.rg:546,552).

The per-interval compute path is pure jnp and jit/shard_map-compatible:
`make_radiation_fn` returns one jitted columnar function; time-dependent
scalars (ozone month weights, solar declination/eccentricity, hour angle)
are computed host-side per radiation interval (the timetracker slot,
atm_core.rg:64) and passed in as small arrays so the compiled program never
retraces.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from . import radiation as rad
from . import radiation_support as rs
from . import tables as tbl


# ---------------------------------------------------------------------------
# initialization (physics_init / camradinit)
# ---------------------------------------------------------------------------

def standard_ozone_profile(levsiz: int = constants.nOznLevels):
    """Built-in climatological ozone: pressure levels [Pa] + volume mixing
    ratio with a stratospheric peak near 10 hPa (oznini slot,
    atmphys_camrad_init.rg:258-264)."""
    pin = np.logspace(np.log10(100.0), np.log10(1.0e5), levsiz)   # 1..1000 hPa
    p_hpa = pin / 100.0
    # single-mode lognormal peak ~ 8 ppmv at 10 hPa, ~0.03 ppmv at surface
    o3 = 8.0e-6 * np.exp(-0.5 * (np.log(p_hpa / 10.0) / 1.1) ** 2) + 3.0e-8
    return pin, o3


def background_aerosol(naer: int = constants.naer,
                       paerlev: int = constants.nAerLevels):
    """Background sulfate-like climatology in the reference's aerosolc
    layout (aerosol_fs, data_structures.rg:631-639): cumulative column mass
    [kg/m^2] BELOW each hybrid data interface — aerosolc[0] = the column
    total at the data top, aerosolc[-1] = 0 at the data surface (the
    convention radiation_support.vert_interpolate consumes).  Total burden
    4 mg/m^2 split over the species slots, mass concentrated in the
    boundary layer (hybrid coordinate ~ p/ps)."""
    m_hybi = np.linspace(0.0, 1.0, paerlev + 1)
    total = 4.0e-6                                        # kg/m^2 column
    # atmospheric mass between hybrid level eta and the surface falls like
    # 1 - eta^2 (low-level aerosol): everything is below the eta=0 top
    # interface, nothing below the eta=1 surface interface
    below = total * (1.0 - m_hybi ** 2)                   # mass below interface
    aerosolc = np.repeat(below[:, None], naer, axis=1) / naer
    return m_hybi, aerosolc


@dataclass
class PhysicsState:
    """Tables + climatologies (phys_tbls_fs / ozn_fs / aerosol_fs analog)."""
    tables: tbl.SaturationTables
    pin: np.ndarray          # [nOznLevels] ozone data pressures
    ozmixm: np.ndarray       # [nMonths, nOznLevels] monthly ozone vmr
    m_hybi: np.ndarray       # [nAerLevels+1] aerosol hybrid interface coords
    aerosolc: np.ndarray     # [nAerLevels+1, naer] cumulative column mass


def physics_init(n_cells: int | None = None) -> PhysicsState:
    """physics_init -> camradinit (atmphys_init.rg:9-23)."""
    tables = tbl.camradinit()
    pin, o3 = standard_ozone_profile()
    # annual cycle: +-15% seasonal modulation of the column
    months = np.arange(constants.nMonths)
    seasonal = 1.0 + 0.15 * np.cos(2 * np.pi * (months - 3) / 12.0)
    ozmixm = seasonal[:, None] * o3[None, :]
    m_hybi, aerosolc = background_aerosol()
    return PhysicsState(tables=tables, pin=pin, ozmixm=ozmixm, m_hybi=m_hybi,
                        aerosolc=aerosolc)


def time_params(phys: PhysicsState, julian: float, dtype=jnp.float32):
    """Host-side per-interval time factors (the physics_timetracker slot):
    month-interpolated ozone, solar declination + eccentricity-scaled solar
    constant, hour angle.  Small arrays -> no retrace of the jitted path."""
    ozmix_now = rs.oznint(julian, phys.ozmixm)
    declin, solcon = rs.radconst(max(julian % constants.daysperyear, 1e-3))
    return dict(
        ozmix=jnp.asarray(ozmix_now, dtype),
        declin=jnp.asarray(declin, dtype),
        solcon=jnp.asarray(solcon, dtype),
        hour=jnp.asarray(2.0 * np.pi * (julian % 1.0), dtype),
    )


# ---------------------------------------------------------------------------
# cloudiness (driver_cloudiness) — jnp, works on numpy inputs too
# ---------------------------------------------------------------------------

def calc_cldfraction(qv, qsat):
    """RH-based fractional cloudiness (the empty calc_cldfraction slot):
    cldfra = ((RH - RHc)/(1 - RHc))^2, RHc = 0.80."""
    rh = jnp.clip(qv / jnp.maximum(qsat, 1e-12), 0.0, 1.0)
    rhc = 0.80
    return jnp.clip((rh - rhc) / (1.0 - rhc), 0.0, 1.0) ** 2


def calc_cldincidence(qc, qi=None):
    """0/1 cloud incidence from condensate (calc_cldincidence slot)."""
    qtot = qc if qi is None else qc + qi
    return (qtot > 1e-8).astype(jnp.result_type(float))


def driver_cloudiness(qv, qsat, scheme: str = "cld_fraction", qc=None):
    if scheme == "cld_incidence":
        return calc_cldincidence(qc if qc is not None else jnp.zeros_like(qv))
    cf = calc_cldfraction(qv, qsat)
    if qc is not None:
        cf = jnp.maximum(cf, calc_cldincidence(qc))
    return cf


# ---------------------------------------------------------------------------
# column pressures & zenith angle
# ---------------------------------------------------------------------------

def _column_pressures(pressure, pressure_sfc):
    """Mid and interface pressures per column from 3-D pressure [C, K]."""
    K = pressure.shape[1]
    p_top = jnp.maximum(1.5 * pressure[:, -1] - 0.5 * pressure[:, -2], 1.0)
    pint = jnp.concatenate(
        [pressure_sfc[:, None],
         0.5 * (pressure[:, :-1] + pressure[:, 1:]),
         p_top[:, None]], axis=1)
    return pressure, pint


def cosine_zenith(lat, lon, declin, hour):
    """Cosine solar zenith angle; `hour` = 2*pi*(julian % 1)."""
    hour_angle = hour + lon - jnp.pi
    return (jnp.sin(lat) * jnp.sin(declin)
            + jnp.cos(lat) * jnp.cos(declin) * jnp.cos(hour_angle))


# ---------------------------------------------------------------------------
# radctl: the full chain, jnp
# ---------------------------------------------------------------------------

def radctl(phys_j: dict, t, qv, pmid, pint, cldfra, cwp, coszrs, tp,
           albedo=0.2, emiss=0.95, tsfc=None, qc=None):
    """The radctl chain (ra_cam.rg:31-128): ozone time/vertical
    interpolation, cgs conversion, saturation humidity, aerosol vertical
    interpolation, then the multi-band SW/LW solves.

    `phys_j`: device-side tables from `_device_tables`.  `tp`: time_params.
    Returns dict with heating rates [K/s] (qrs, qrl), surface fluxes and
    TOA diagnostics."""
    C = t.shape[0]
    ozmix = jnp.broadcast_to(tp["ozmix"][None, :], (C, tp["ozmix"].shape[0]))
    o3vmr = rs.radozn(pmid, phys_j["pin"], ozmix)
    _, _, o3mmr = rs.radinp(pmid, pint, o3vmr)
    esat, qsat = tbl.aqsat_j(t, pmid, phys_j)

    # aerosol path: vert_interpolate (ra_cam_radctl_support.rg:353-532) from
    # the background climatology to model levels, summed over species
    aer = rs.vert_interpolate_j(pint[:, 0], phys_j["aerosolc"],
                                phys_j["m_hybi"], pint)
    aer_mmr = aer.sum(axis=-1)

    tsfc = tsfc if tsfc is not None else t[:, 0]
    rel, rei = rad.cldefr(t)
    fice = rad.ice_fraction(t)
    cld_emis = rad.cldems(cwp, rei, fice)

    sw = rad.sw_fluxes(coszrs, tp["solcon"], pmid, pint, qv, o3mmr, cldfra,
                       cwp, rel, rei, fice, aer_mmr=aer_mmr, albedo=albedo)
    lw = rad.lw_fluxes(t, qv, o3mmr, pmid, pint, cld_emis, cldfra, tsfc,
                       emiss=emiss)
    return dict(qrs=sw["qrs"], qrl=lw["qrl"], o3vmr=o3vmr, qsat=qsat,
                esat=esat, aer_mmr=aer_mmr, swdnb=sw["swdnb"],
                fsns=sw["fsns"], fsnt=sw["fsnt"], swup_toa=sw["swup_toa"],
                solin=sw["solin"], lwdnb=lw["lwdnb"], olr=lw["olr"],
                flns=lw["flns"], solcon=tp["solcon"], declin=tp["declin"])


def _device_tables(phys: PhysicsState, dtype):
    tb = phys.tables
    return dict(
        estbl=jnp.asarray(tb.estbl, dtype), tmin=tb.tmin, tmax=tb.tmax,
        pin=jnp.asarray(phys.pin, dtype),
        m_hybi=jnp.asarray(phys.m_hybi, dtype),
        aerosolc=jnp.asarray(phys.aerosolc, dtype),
    )


def radiation_columns(phys_j, lat, lon, theta_m, exner, pressure,
                      surface_pressure, qv, qc, tp):
    """Pure columnar radiation update: the jit/shard_map work function.

    Returns (rthraten, diags dict)."""
    qv = jnp.zeros_like(theta_m) if qv is None else qv
    t = theta_m * exner / (1.0 + constants.rvord * qv)
    pmid, pint = _column_pressures(pressure, surface_pressure)
    _, qsat = tbl.aqsat_j(t, pmid, phys_j)
    cldfra = driver_cloudiness(qv, qsat, qc=qc)
    g = constants.gravity
    dp = jnp.abs(pint[:, :-1] - pint[:, 1:])
    if qc is not None:
        # grid-mean condensate -> in-cloud water path [g/m^2]
        cwp = qc * dp / g * 1e3 / jnp.maximum(cldfra, 0.05)
    else:
        # no prognostic condensate: climatological in-cloud CWP
        cwp = jnp.where(cldfra > 0.0, 60.0, 0.0)
    coszrs = cosine_zenith(lat, lon, tp["declin"], tp["hour"])
    out = radctl(phys_j, t, qv, pmid, pint, cldfra, cwp, coszrs, tp)
    rthraten = (out["qrs"] + out["qrl"]) / exner
    out["cldfra"] = cldfra
    return rthraten, out


def make_radiation_fn(phys: PhysicsState, dtype=jnp.float32):
    """Returns a jitted radiation(lat, lon, theta_m, exner, pressure, sp,
    qv, qc, tp) -> (rthraten, diags)."""
    phys_j = _device_tables(phys, dtype)

    @jax.jit
    def radiation(lat, lon, theta_m, exner, pressure, sp, qv, qc, tp):
        return radiation_columns(phys_j, lat, lon, theta_m, exner, pressure,
                                 sp, qv, qc, tp)

    return radiation


# ---------------------------------------------------------------------------
# numpy-facing driver (kept for tests / host-side use)
# ---------------------------------------------------------------------------

def physics_driver(phys: PhysicsState, state_np: dict, mesh, julian: float):
    """Per-interval physics driver (atmphys_driver.rg:23-62): cloudiness ->
    SW radiation -> LW radiation -> diabatic theta tendency.

    `state_np` needs: theta_m [C,K], exner [C,K], pressure [C,K],
    surface_pressure [C], qv [C,K] (zeros if dry), optional qc.
    Returns dict with rthraten (d(theta)/dt, K/s), cldfra, and flux
    diagnostics (numpy)."""
    dtype = jnp.float64 if state_np["theta_m"].dtype == np.float64 else jnp.float32
    phys_j = _device_tables(phys, dtype)
    tp = time_params(phys, julian, dtype)
    qv = state_np.get("qv")
    qc = state_np.get("qc")
    rthraten, out = radiation_columns(
        phys_j, jnp.asarray(mesh.latCell, dtype), jnp.asarray(mesh.lonCell, dtype),
        jnp.asarray(state_np["theta_m"], dtype), jnp.asarray(state_np["exner"], dtype),
        jnp.asarray(state_np["pressure"], dtype),
        jnp.asarray(state_np["surface_pressure"], dtype),
        None if qv is None else jnp.asarray(qv, dtype),
        None if qc is None else jnp.asarray(qc, dtype), tp)
    res = {k: np.asarray(v) for k, v in out.items()}
    res["rthraten"] = np.asarray(rthraten)
    return res
