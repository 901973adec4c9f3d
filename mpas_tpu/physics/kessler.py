"""Kessler warm-rain microphysics (jit-compatible, columnar).

The reference's physics suite has no microphysics at all — the moisture
loop is open (scalars unused, qtot loop empty at dynamics_tasks.rg:476-481;
SURVEY.md section 8).  This module closes it with the classic Kessler (1969)
warm-rain scheme, following the MPAS/WRF formulation
(mpas_atmphys_driver_microphysics / module_mp_kessler semantics):

  1. rain sedimentation (upwind flux with substeps bounded by the fall-speed
     CFL; fall speed vt = 36.34 (rho qr)^0.1364 sqrt(rho_sfc/rho) m/s),
  2. autoconversion of cloud to rain above the 1 g/kg threshold and
     accretion of cloud by rain (Berry-type factors c1=1e-3 s^-1, c2=1e-3,
     c3=2.2, c4=0.875),
  3. saturation adjustment (condensation/evaporation of cloud) and rain
     evaporation against Tetens saturation vapor pressure, with the latent
     heating applied to theta.

Scalar layout convention: scalars[0]=qv, [1]=qc, [2]=qr (dry mixing
ratios).  The update runs *inside* the jitted SRK3 step after scalar
transport — the TPU-native equivalent of MPAS calling the microphysics
driver at the end of atm_do_timestep — and rediagnoses the coupled state
(rtheta_p, exner, pressure_p) from the equation of state exactly as
atm_init_coupled_diagnostics does (dynamics_tasks.rg:707-724).

All operations are elementwise on level-major [K, C] arrays plus a
vertical upwind scan: embarrassingly parallel over cells, fully fused by
XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants

# Kessler/WRF constants (module_mp_kessler.F)
XLV = constants.xlv
EP2 = constants.rgas / constants.rv        # 0.622
SVP1 = 0.6112                              # kPa
SVP2 = 17.67
SVP3 = 29.65
SVPT0 = 273.15
C1 = 0.001                                 # autoconversion rate [1/s]
C2 = 0.001                                 # autoconversion threshold [kg/kg]
C3 = 2.2                                   # accretion rate
C4 = 0.875                                 # accretion exponent
MAX_VT = 15.0                              # bound on rain fall speed [m/s]
MAX_CR_SEDIMENTATION = 0.75                # per-substep fall CFL target


def fall_substeps(dt: float, dz_min: float) -> int:
    """Static number of sedimentation substeps (host-side, trace-time)."""
    import math
    return max(1, min(60, math.ceil(MAX_VT * dt / (MAX_CR_SEDIMENTATION * dz_min))))


def _fall_velocity(qr, rho):
    """Rain terminal fall speed [m/s]; rho is dry air density [kg/m^3].
    Capped at MAX_VT — the bound fall_substeps sizes the sedimentation
    CFL against (the low-density rhofac amplification could otherwise
    exceed it aloft in extreme columns)."""
    rhofac = jnp.sqrt(rho[:1] / jnp.maximum(rho, 1e-12))
    vt = 36.34 * jnp.maximum(qr * rho * 0.001, 0.0) ** 0.1364 * rhofac
    return jnp.minimum(vt, MAX_VT)


def _sediment(qr, rho, dz, dt: float, nfall: int):
    """Upwind rain sedimentation over `nfall` substeps.

    Returns (qr_new, rain_accum [C] in mm == kg/m^2 of water)."""
    dtfall = dt / nfall
    rho_dz = rho * dz

    def body(_, carry):
        qr, rain = carry
        vt = _fall_velocity(qr, rho)
        flux = rho * qr * vt                       # downward mass flux [kg/m^2/s]
        # level k receives flux from k+1 above, loses its own; top gets none
        flux_in = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])],
                                  axis=0)
        qr = qr + dtfall * (flux_in - flux) / rho_dz
        qr = jnp.maximum(qr, 0.0)
        rain = rain + flux[0] * dtfall             # surface precipitation
        return qr, rain

    rain0 = qr[0] * 0.0        # derives from qr: varying-axes-correct carry
                               # under shard_map (vs an unvarying jnp.zeros)
    qr, rain = jax.lax.fori_loop(0, nfall, body, (qr, rain0))
    return qr, rain


def kessler(theta, qv, qc, qr, rho, exner, pressure, dz, dt: float,
            nfall: int):
    """One Kessler update.  All inputs level-major [K, C]; theta is the
    dry potential temperature.  Returns (theta, qv, qc, qr, rain [C] mm)."""
    # --- 1. sedimentation ---
    qr, rain = _sediment(qr, rho, dz, dt, nfall)

    # --- 2. autoconversion + accretion (production of rain) ---
    factorn = 1.0 / (1.0 + C3 * dt * jnp.maximum(qr, 0.0) ** C4)
    qrprod = qc * (1.0 - factorn) + factorn * C1 * dt * jnp.maximum(qc - C2, 0.0)
    qrprod = jnp.minimum(qrprod, qc)
    qc = jnp.maximum(qc - qrprod, 0.0)
    qr = jnp.maximum(qr + qrprod, 0.0)

    # --- 3. saturation adjustment + rain evaporation ---
    t = theta * exner
    p = jnp.maximum(pressure, 100.0)
    es = 1000.0 * SVP1 * jnp.exp(SVP2 * (t - SVPT0) / (t - SVP3))   # Pa
    es = jnp.minimum(es, 0.99 * p)
    qvs = EP2 * es / (p - es)
    f5 = SVP2 * (SVPT0 - SVP3) * XLV / constants.cp
    # linearized supersaturation removal (WRF kessler.F "prod")
    prod = (qv - qvs) / (1.0 + p / (p - es) * qvs * f5 / (t - SVP3) ** 2)

    # rain evaporation (ventilation form), limited by available subsaturation
    rqr = jnp.maximum(rho * qr * 0.001, 0.0)                        # g/cm^3-ish scaling
    ern = (dt * ((1.6 + 124.9 * rqr ** 0.2046) * rqr ** 0.525)
           / (rho * (2.55e8 / (p * qvs) + 5.4e5))
           * jnp.maximum(qvs - qv, 0.0) / qvs)
    ern = jnp.minimum(ern, jnp.maximum(-prod - qc, 0.0))
    ern = jnp.minimum(ern, qr)
    ern = jnp.maximum(ern, 0.0)

    # condensation can't exceed available cloud when evaporating
    product = jnp.maximum(prod, -qc)

    theta = theta + XLV / (constants.cp * exner) * (product - ern)
    qv = jnp.maximum(qv - product + ern, 0.0)
    qc = qc + product
    qr = qr - ern
    return theta, qv, qc, qr, rain


def apply_kessler(state, static, vert, nl, dt: float):
    """Couple Kessler into the SRK3 step: update scalars + theta_m from the
    current state and rediagnose the coupled thermodynamic variables."""
    rgas, cp, p0 = constants.rgas, constants.cp, constants.p0
    rcv = rgas / (cp - rgas)

    qv = state.scalars[0]
    qc = state.scalars[1]
    qr = state.scalars[2]
    theta = state.theta_m / (1.0 + constants.rvord * qv)
    rho = state.rho_zz * static.zz                       # dry density
    pressure = static.pressure_base + state.pressure_p
    dz = static.zgrid[1:] - static.zgrid[:-1]

    theta, qv, qc, qr, rain = kessler(
        theta, qv, qc, qr, rho, state.exner, pressure, dz, dt,
        nfall=nl.config_kessler_nfall)

    theta_m = theta * (1.0 + constants.rvord * qv)
    # rediagnose coupled state from the equation of state
    # (atm_init_coupled_diagnostics, dynamics_tasks.rg:707-724)
    rtheta_p = state.rho_zz * theta_m - static.rtheta_base
    exner = (static.zz * (rgas / p0) * (rtheta_p + static.rtheta_base)) ** rcv
    pressure_p = static.zz * rgas * (
        exner * rtheta_p + static.rtheta_base * (exner - static.exner_base))

    scalars = jnp.stack([qv, qc, qr] + [state.scalars[i]
                                        for i in range(3, state.scalars.shape[0])],
                        axis=0)
    rainnc = (state.rainnc + rain) if state.rainnc is not None else rain
    return state.replace(theta_m=theta_m, rtheta_p=rtheta_p, exner=exner,
                         pressure_p=pressure_p, scalars=scalars, rainnc=rainnc)
