"""WSM6-lite ice-phase microphysics (jit-compatible, columnar).

A reduced WRF Single-Moment 6-class scheme (Hong & Lim, JKMS 2006) for the
sharded-physics harness: five prognostic species — qv, qc (cloud water),
qr (rain), qi (cloud ice), qs (snow, with graupel folded in, hence "lite")
— with the scheme's leading-order process set:

  warm rain:   Kessler-form autoconversion qc->qr and accretion (shared
               constants with physics/kessler.py), saturation adjustment
               over water, rain evaporation;
  ice phase:   Fletcher (1962) ice nucleation, vapor deposition /
               sublimation on ice toward ice saturation, autoconversion
               qi->qs above the Hong et al. threshold, snow accretion of
               ice and riming of cloud water, snow deposition, melting of
               ice and snow above freezing, homogeneous freezing of cloud
               water at -40 C;
  sedimentation: upwind flux for rain (Kessler fall law) and snow
               (vt = 11.72 (rho qs)^0.25 / sqrt(rho-fac), capped), CFL
               substeps as in physics/kessler.py.

Latent heating uses Lv / Ls / Lf consistently so a closed column conserves
total water (vapor + condensate + accumulated precip) and is energetically
consistent (tests/test_wsm6.py).  The reference's physics suite has no
microphysics at all (SURVEY.md section 8); slot:
/root/reference/physics/atmphys_driver.rg:23-62.

Scalar layout: scalars[0]=qv, [1]=qc, [2]=qr, [3]=qi, [4]=qs (dry mixing
ratios), level-major [K, C]; all ops elementwise + vertical scans, fully
fused by XLA and embarrassingly parallel over cells.
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


def wsm6lite(theta, qv, qc, qr, qi, qs, rho, exner, pressure, dz, dt: float,
             nfall: int):
    """One WSM6-lite update.  Inputs level-major [K, C]; theta is the dry
    potential temperature.  Returns (theta, qv, qc, qr, qi, qs, rain, snow)
    with rain/snow surface accumulations [C] in kg/m^2 (mm)."""
    cp = constants.cp
    p = jnp.maximum(pressure, 100.0)

    # --- 1. sedimentation ---
    qr, rain = _sediment(qr, rho, dz, dt, nfall)
    qs, snow = _sediment_snow(qs, rho, dz, dt, nfall)

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
    grow = jnp.where(cold & (qi + qs > 1e-12),
                     (1.0 - jnp.exp(-dt / tau_dep)) * si_excess, 0.0)
    dep = jnp.clip(grow, -(qi + qs), jnp.maximum(si_excess, 0.0))
    dep_i = jnp.where(dep >= 0,
                      dep * qi / jnp.maximum(qi + qs, 1e-12),
                      -jnp.minimum(-dep, qi))
    dep_s = dep - dep_i
    dep_s = jnp.maximum(dep_s, -qs)

    qv = qv - qi_nuc - dep_i - dep_s
    qi = qi + qi_nuc + dep_i
    qs = qs + dep_s
    theta = theta + XLS / (cp * exner) * (qi_nuc + dep_i + dep_s)
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
    return theta, qv, qc, qr, qi, qs, rain, snow


def apply_wsm6(state, static, vert, nl, dt: float):
    """Couple WSM6-lite into the SRK3 step (same rediagnosis pattern as
    kessler.apply_kessler)."""
    rgas, cp, p0 = constants.rgas, constants.cp, constants.p0
    rcv = rgas / (cp - rgas)

    qv, qc, qr, qi, qs = (state.scalars[i] for i in range(5))
    theta = state.theta_m / (1.0 + constants.rvord * qv)
    rho = state.rho_zz * static.zz
    pressure = static.pressure_base + state.pressure_p
    dz = static.zgrid[1:] - static.zgrid[:-1]

    theta, qv, qc, qr, qi, qs, rain, snow = wsm6lite(
        theta, qv, qc, qr, qi, qs, rho, state.exner, pressure, dz, dt,
        nfall=nl.config_kessler_nfall)

    theta_m = theta * (1.0 + constants.rvord * qv)
    rtheta_p = state.rho_zz * theta_m - static.rtheta_base
    exner = (static.zz * (rgas / p0) * (rtheta_p + static.rtheta_base)) ** rcv
    pressure_p = static.zz * rgas * (
        exner * rtheta_p + static.rtheta_base * (exner - static.exner_base))

    extra = [state.scalars[i] for i in range(5, state.scalars.shape[0])]
    scalars = jnp.stack([qv, qc, qr, qi, qs] + extra, axis=0)
    rainnc = (state.rainnc + rain + snow) if state.rainnc is not None \
        else rain + snow
    return state.replace(theta_m=theta_m, rtheta_p=rtheta_p, exner=exner,
                         pressure_p=pressure_p, scalars=scalars,
                         rainnc=rainnc)
