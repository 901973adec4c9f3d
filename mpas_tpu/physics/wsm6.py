"""WSM6 ice-phase microphysics (jit-compatible, columnar).

The WRF Single-Moment 6-class scheme (Hong & Lim, JKMS 2006) in two tiers:

* ``wsm6lite`` (config_microphysics="wsm6lite") — five species, graupel
  folded into snow; the round-4 scheme, numerics unchanged.
* ``wsm6full`` (config_microphysics="wsm6") — the full six species with a
  prognostic graupel class qg: snow->graupel autoconversion above the
  Hong-Lim threshold, graupel riming of cloud water and accretion
  (freezing) of rain with a wet-/dry-growth heat-balance cap (accreted
  liquid that cannot freeze without heating the air past 0 C is shed,
  i.e. stays liquid), Bigg (1953) immersion freezing of supercooled rain,
  graupel share of vapor deposition/sublimation, graupel melting, and
  graupel sedimentation with the Hong-Lim fall law
  (V = a Gamma(4+b)/6 lambda^-b, a=330, b=0.8, rho_g=500, n0g=4e6).

Shared process set (both tiers):

  warm rain:   Kessler-form autoconversion qc->qr and accretion (shared
               constants with physics/kessler.py), saturation adjustment
               over water, rain evaporation;
  ice phase:   Fletcher (1962) ice nucleation, vapor deposition /
               sublimation on ice toward ice saturation, autoconversion
               qi->qs above the Hong et al. threshold, snow accretion of
               ice and riming of cloud water, snow deposition, melting of
               ice and snow above freezing, homogeneous freezing of cloud
               water at -40 C;
  sedimentation: upwind flux for rain (Kessler fall law), snow
               (vt = 11.72 (rho qs)^0.25 / sqrt(rho-fac), capped) and
               graupel, CFL substeps as in physics/kessler.py.

Latent heating uses Lv / Ls / Lf consistently so a closed column conserves
total water (vapor + condensate + accumulated precip) and the moist
enthalpy cp T + Lv qv - Lf (qi+qs+qg) pointwise (tests/test_wsm6.py).
The reference's physics suite has no microphysics at all (SURVEY.md
section 8); slot: /root/reference/physics/atmphys_driver.rg:23-62.

Scalar layout: scalars[0]=qv, [1]=qc, [2]=qr, [3]=qi, [4]=qs, [5]=qg (dry
mixing ratios), level-major [K, C]; all ops elementwise + vertical scans,
fully fused by XLA and embarrassingly parallel over cells.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants
from .kessler import (C1, C2, C3, C4, EP2, SVP1, SVP2, SVP3, SVPT0,
                      _sediment, fall_substeps)

XLV = constants.xlv
XLS = constants.xls
XLF = constants.xlf
T0 = SVPT0
TICE_HOMOG = 233.15            # homogeneous freezing of cloud water
QI0 = 8.0e-5                   # ice -> snow autoconversion threshold [kg/kg]
QCK1 = 1.0e-3                  # riming efficiency factor
N0_FLETCHER = 1.0e-2           # Fletcher nucleation prefactor [1/m^3 /rho]
MI0 = 1.0e-12                  # initial ice crystal mass [kg]
MAX_VT_SNOW = 8.0

# --- graupel class (wsm6full) ---
QS0 = 6.0e-4                   # snow -> graupel autoconversion threshold
GRAUPEL_PIRN = 6.2832e9        # pi * rho_g * n0g (rho_g=500, n0g=4e6 m^-4)
# mass-weighted fall speed a*Gamma(4+b)/6 * lambda^-b with a=330, b=0.8:
# 330 * Gamma(4.8)/6 = 981; lambda^-0.8 = (rho qg / (pi rho_g n0g))^0.2
GRAUPEL_VCOEF = 981.0
MAX_VT_GRAUPEL = 15.0
BIGG_A = 0.66                  # Bigg (1953) immersion-freezing exponent [1/K]
BIGG_K = 1.0e-5                # rate prefactor [1/s]; tau ~ 2 min at -10 C


def saturation_pressures(t):
    """(es_water, es_ice) [Pa], Tetens over water and ice."""
    esw = 1000.0 * SVP1 * jnp.exp(SVP2 * (t - SVPT0) / (t - SVP3))
    esi = 1000.0 * SVP1 * jnp.exp(21.8745584 * (t - SVPT0) / (t - 7.66))
    return esw, jnp.where(t < T0, esi, esw)


def _qsat(es, p):
    p = jnp.maximum(p, 100.0)
    es = jnp.minimum(es, 0.99 * p)
    return EP2 * es / (p - es)


def _snow_fall_velocity(qs, rho):
    rhofac = jnp.sqrt(rho[:1] / jnp.maximum(rho, 1e-12))
    vt = 11.72 * jnp.maximum(rho * qs, 0.0) ** 0.25 * rhofac
    return jnp.minimum(vt, MAX_VT_SNOW)


def _sediment_snow(qs, rho, dz, dt: float, nfall: int):
    """Upwind snow sedimentation (same scheme as kessler._sediment with the
    snow fall law)."""
    dtfall = dt / nfall
    rho_dz = rho * dz

    def body(_, carry):
        qs, snow = carry
        vt = _snow_fall_velocity(qs, rho)
        flux = rho * qs * vt
        flux_in = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
        qs = jnp.maximum(qs + dtfall * (flux_in - flux) / rho_dz, 0.0)
        snow = snow + flux[0] * dtfall
        return qs, snow

    snow0 = qs[0] * 0.0        # varying-axes-correct carry under shard_map
    return jax.lax.fori_loop(0, nfall, body, (qs, snow0))


def _graupel_fall_velocity(qg, rho):
    rhofac = jnp.sqrt(rho[:1] / jnp.maximum(rho, 1e-12))
    vt = (GRAUPEL_VCOEF
          * (jnp.maximum(rho * qg, 0.0) / GRAUPEL_PIRN) ** 0.2 * rhofac)
    return jnp.minimum(vt, MAX_VT_GRAUPEL)


def _sediment_graupel(qg, rho, dz, dt: float, nfall: int):
    dtfall = dt / nfall
    rho_dz = rho * dz

    def body(_, carry):
        qg, graup = carry
        vt = _graupel_fall_velocity(qg, rho)
        flux = rho * qg * vt
        flux_in = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
        qg = jnp.maximum(qg + dtfall * (flux_in - flux) / rho_dz, 0.0)
        graup = graup + flux[0] * dtfall
        return qg, graup

    graup0 = qg[0] * 0.0       # varying-axes-correct carry under shard_map
    return jax.lax.fori_loop(0, nfall, body, (qg, graup0))


def _wsm6_core(theta, qv, qc, qr, qi, qs, qg, rho, exner, pressure, dz,
               dt: float, nfall: int):
    """Shared 5-/6-class update.  qg=None selects the lite (5-class) path,
    which is numerically identical to round 4's wsm6lite; with qg the full
    graupel process set is inserted.  Returns
    (theta, qv, qc, qr, qi, qs, qg|None, rain, snow, graup|0)."""
    cp = constants.cp
    p = jnp.maximum(pressure, 100.0)
    has_g = qg is not None

    # --- 1. sedimentation ---
    qr, rain = _sediment(qr, rho, dz, dt, nfall)
    qs, snow = _sediment_snow(qs, rho, dz, dt, nfall)
    graup = 0.0
    if has_g:
        qg, graup = _sediment_graupel(qg, rho, dz, dt, nfall)

    # --- 2. warm-rain conversions (Kessler form) ---
    factorn = 1.0 / (1.0 + C3 * dt * jnp.maximum(qr, 0.0) ** C4)
    qrprod = qc * (1.0 - factorn) + factorn * C1 * dt * jnp.maximum(qc - C2, 0.0)
    qrprod = jnp.minimum(qrprod, qc)
    qc = qc - qrprod
    qr = qr + qrprod

    t = theta * exner
    cold = t < T0

    # --- 3. ice nucleation + depositional growth (cold, ice-supersaturated) ---
    esw, esi = saturation_pressures(t)
    qsi = _qsat(esi, p)
    si_excess = qv - qsi                               # ice-supersaturation
    # Fletcher number concentration n_i = 1e-2 exp(0.6 (T0 - T)) [1/m^3]
    ni = N0_FLETCHER * jnp.exp(jnp.minimum(0.6 * (T0 - t), 25.0))
    # nucleation: bring up to the crystal mass implied by n_i, bounded by
    # available supersaturation
    qi_nuc = jnp.where(cold, jnp.minimum(jnp.maximum(ni * MI0 / rho - qi, 0.0),
                                         jnp.maximum(si_excess, 0.0)), 0.0)
    # deposition/sublimation: relax qv toward ice saturation on existing ice
    # (timescale shortens with ice mass; linearized capacitance form)
    tau_dep = 600.0
    qice_tot = qi + qs + (qg if has_g else 0.0)
    grow = jnp.where(cold & (qice_tot > 1e-12),
                     (1.0 - jnp.exp(-dt / tau_dep)) * si_excess, 0.0)
    dep = jnp.clip(grow, -qice_tot, jnp.maximum(si_excess, 0.0))
    dep_i = jnp.where(dep >= 0,
                      dep * qi / jnp.maximum(qice_tot, 1e-12),
                      -jnp.minimum(-dep, qi))
    if has_g:
        # deposit proportional to mass; sublimate qi first, then qs, then qg
        rest = dep - dep_i
        dep_s = jnp.where(dep >= 0,
                          dep * qs / jnp.maximum(qice_tot, 1e-12),
                          jnp.maximum(rest, -qs))
        dep_g = dep - dep_i - dep_s
        dep_g = jnp.maximum(dep_g, -qg)
        qg = qg + dep_g
    else:
        dep_s = jnp.maximum(dep - dep_i, -qs)
        dep_g = 0.0

    qv = qv - qi_nuc - dep_i - dep_s - dep_g
    qi = qi + qi_nuc + dep_i
    qs = qs + dep_s
    theta = theta + XLS / (cp * exner) * (qi_nuc + dep_i + dep_s + dep_g)
    t = theta * exner
    cold = t < T0

    # --- 4. ice -> snow autoconversion + snow collection ---
    praut_i = jnp.where(cold, jnp.maximum(qi - QI0, 0.0)
                        * (1.0 - jnp.exp(-1.0e-3 * dt)), 0.0)
    # snow accretes ice and rimes cloud water (cold only)
    vts = _snow_fall_velocity(qs, rho)
    sweep = 1.0 - jnp.exp(-QCK1 * dt * rho * qs * (1.0 + vts))
    pacr_i = jnp.where(cold, qi * sweep, 0.0)
    prim_c = jnp.where(cold, qc * sweep, 0.0)          # riming: liquid->snow
    qi = qi - praut_i - pacr_i
    qs = qs + praut_i + pacr_i + prim_c
    qc = qc - prim_c
    theta = theta + XLF / (cp * exner) * prim_c        # freezing heat
    t = theta * exner

    if has_g:
        cold = t < T0
        # snow -> graupel autoconversion above the Hong-Lim threshold
        # (heavily rimed snow graupelizes)
        pgaut = jnp.where(cold, jnp.maximum(qs - QS0, 0.0)
                          * (1.0 - jnp.exp(-1.0e-3 * dt)), 0.0)
        qs = qs - pgaut
        qg = qg + pgaut
        # graupel sweeps out cloud water (riming) and rain (freezing on
        # contact), continuous-collection form like the snow sweep
        vtg = _graupel_fall_velocity(qg, rho)
        sweep_g = 1.0 - jnp.exp(-QCK1 * dt * rho * qg * (1.0 + vtg))
        pgacw = jnp.where(cold, qc * sweep_g, 0.0)
        pgacr = jnp.where(cold, qr * sweep_g, 0.0)
        # Bigg (1953) immersion freezing of supercooled rain
        bigg = BIGG_K * (jnp.exp(jnp.minimum(BIGG_A * (T0 - t), 25.0)) - 1.0)
        pgfrz = jnp.where(cold, qr * (1.0 - jnp.exp(-dt * jnp.maximum(bigg,
                                                                      0.0))),
                          0.0)
        pgfrz = jnp.minimum(pgfrz, qr - pgacr)
        # wet-/dry-growth heat balance: freezing heats the air by XLF/cp per
        # unit mass; liquid that would push t past T0 cannot freeze (wet
        # growth) and is shed — implemented as a proportional cap on the
        # liquid->graupel conversions
        freeze_cap = cp * jnp.maximum(T0 - t, 0.0) / XLF
        liq2g = pgacw + pgacr + pgfrz
        scale = jnp.minimum(freeze_cap / jnp.maximum(liq2g, 1e-30), 1.0)
        pgacw, pgacr, pgfrz = pgacw * scale, pgacr * scale, pgfrz * scale
        qc = qc - pgacw
        qr = qr - pgacr - pgfrz
        qg = qg + pgacw + pgacr + pgfrz
        theta = theta + XLF / (cp * exner) * (pgacw + pgacr + pgfrz)
        t = theta * exner

    # --- 5. homogeneous freezing of cloud water; melting above T0 ---
    frz = jnp.where(t < TICE_HOMOG, qc, 0.0)
    qc = qc - frz
    qi = qi + frz
    theta = theta + XLF / (cp * exner) * frz
    t = theta * exner

    warm = t > T0
    # melt rate limited by available sensible heat above freezing
    melt_cap = cp * jnp.maximum(t - T0, 0.0) / XLF
    melt_i = jnp.where(warm, jnp.minimum(qi, melt_cap), 0.0)
    qi = qi - melt_i
    qc = qc + melt_i
    theta = theta - XLF / (cp * exner) * melt_i
    t = theta * exner
    melt_cap = cp * jnp.maximum(t - T0, 0.0) / XLF
    melt_s = jnp.where(t > T0, jnp.minimum(qs * (1.0 - jnp.exp(-dt / 600.0)),
                                           melt_cap), 0.0)
    qs = qs - melt_s
    qr = qr + melt_s
    theta = theta - XLF / (cp * exner) * melt_s
    t = theta * exner

    if has_g:
        # graupel melts more slowly than snow (denser, smaller area/mass)
        melt_cap = cp * jnp.maximum(t - T0, 0.0) / XLF
        melt_g = jnp.where(t > T0,
                           jnp.minimum(qg * (1.0 - jnp.exp(-dt / 900.0)),
                                       melt_cap), 0.0)
        qg = qg - melt_g
        qr = qr + melt_g
        theta = theta - XLF / (cp * exner) * melt_g
        t = theta * exner

    # --- 6. saturation adjustment over water + rain evaporation ---
    esw, _ = saturation_pressures(t)
    qvs = _qsat(esw, p)
    f5 = SVP2 * (SVPT0 - SVP3) * XLV / cp
    prod = (qv - qvs) / (1.0 + p / (p - jnp.minimum(esw, 0.99 * p))
                         * qvs * f5 / (t - SVP3) ** 2)
    product = jnp.maximum(prod, -qc)

    rqr = jnp.maximum(rho * qr * 0.001, 0.0)
    ern = (dt * ((1.6 + 124.9 * rqr ** 0.2046) * rqr ** 0.525)
           / (rho * (2.55e8 / (p * qvs) + 5.4e5))
           * jnp.maximum(qvs - qv, 0.0) / qvs)
    ern = jnp.minimum(ern, jnp.maximum(-prod - qc, 0.0))
    ern = jnp.clip(ern, 0.0, qr)

    theta = theta + XLV / (cp * exner) * (product - ern)
    qv = jnp.maximum(qv - product + ern, 0.0)
    qc = jnp.maximum(qc + product, 0.0)
    qr = jnp.maximum(qr - ern, 0.0)
    qi = jnp.maximum(qi, 0.0)
    qs = jnp.maximum(qs, 0.0)
    if has_g:
        qg = jnp.maximum(qg, 0.0)
    return theta, qv, qc, qr, qi, qs, qg, rain, snow, graup


def wsm6lite(theta, qv, qc, qr, qi, qs, rho, exner, pressure, dz, dt: float,
             nfall: int):
    """One WSM6-lite (5-class) update.  Inputs level-major [K, C]; theta is
    the dry potential temperature.  Returns
    (theta, qv, qc, qr, qi, qs, rain, snow) with rain/snow surface
    accumulations [C] in kg/m^2 (mm)."""
    out = _wsm6_core(theta, qv, qc, qr, qi, qs, None, rho, exner, pressure,
                     dz, dt, nfall)
    theta, qv, qc, qr, qi, qs, _, rain, snow, _ = out
    return theta, qv, qc, qr, qi, qs, rain, snow


def wsm6full(theta, qv, qc, qr, qi, qs, qg, rho, exner, pressure, dz,
             dt: float, nfall: int):
    """One full WSM6 (6-class) update with prognostic graupel.  Returns
    (theta, qv, qc, qr, qi, qs, qg, rain, snow, graup) with surface
    accumulations [C] in kg/m^2 (mm)."""
    return _wsm6_core(theta, qv, qc, qr, qi, qs, qg, rho, exner, pressure,
                      dz, dt, nfall)


def apply_wsm6(state, static, vert, nl, dt: float, full: bool = False):
    """Couple WSM6 into the SRK3 step (same rediagnosis pattern as
    kessler.apply_kessler).  full=False: 5-class lite; full=True: 6-class
    with prognostic graupel in scalars[5]."""
    rgas, cp, p0 = constants.rgas, constants.cp, constants.p0
    rcv = rgas / (cp - rgas)

    n_sp = 6 if full else 5
    qv, qc, qr, qi, qs = (state.scalars[i] for i in range(5))
    qg = state.scalars[5] if full else None
    theta = state.theta_m / (1.0 + constants.rvord * qv)
    rho = state.rho_zz * static.zz
    pressure = static.pressure_base + state.pressure_p
    dz = static.zgrid[1:] - static.zgrid[:-1]

    theta, qv, qc, qr, qi, qs, qg, rain, snow, graup = _wsm6_core(
        theta, qv, qc, qr, qi, qs, qg, rho, state.exner, pressure, dz, dt,
        nfall=nl.config_kessler_nfall)

    theta_m = theta * (1.0 + constants.rvord * qv)
    rtheta_p = state.rho_zz * theta_m - static.rtheta_base
    exner = (static.zz * (rgas / p0) * (rtheta_p + static.rtheta_base)) ** rcv
    pressure_p = static.zz * rgas * (
        exner * rtheta_p + static.rtheta_base * (exner - static.exner_base))

    species = [qv, qc, qr, qi, qs] + ([qg] if full else [])
    extra = [state.scalars[i] for i in range(n_sp, state.scalars.shape[0])]
    scalars = jnp.stack(species + extra, axis=0)
    precip = rain + snow + graup
    rainnc = (state.rainnc + precip) if state.rainnc is not None else precip
    return state.replace(theta_m=theta_m, rtheta_p=rtheta_p, exner=exner,
                         pressure_p=pressure_p, scalars=scalars,
                         rainnc=rainnc)
