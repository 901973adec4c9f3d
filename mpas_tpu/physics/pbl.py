"""Surface-layer fluxes + K-profile boundary-layer mixing (YSU-lite).

The reference's physics driver has empty slots where MPAS couples its
surface layer and PBL schemes (atmphys_driver.rg:23-62 runs only the
radiation chain; no sfclayer/PBL files exist at all) — this module grows
that capability TPU-first: everything is columnar, elementwise on
level-major [K, C] arrays plus small vertical scans, so it shards with the
same zero-collective harness as radiation/microphysics.

Physics (following the classic formulations, reduced to their
jit-friendly cores):

  * Surface layer: bulk aerodynamic fluxes with Louis (1979) stability
    functions over a uniform water-like lower boundary at skin temperature
    `config_sst` and roughness `config_roughness`:
        Cd = fm(Rib) * (k / ln(z1/z0))^2,   Ch = fh(Rib) * Cd-shape
        tau = rho Cd |V| u,   H = rho cp Ch |V| (th_skin - th_1)
  * PBL height: first interface where the bulk Richardson number from the
    lowest level exceeds Ric = 0.25 (Troen & Mahrt 1986 diagnosis).
  * K-profile: Km(z) = k u* z (1 - z/h)^2 inside the PBL (YSU's
    first-order closure without the countergradient/entrainment terms),
    Kh = Km / Pr, plus a small local-Ri background above the PBL.
  * Implicit (backward-Euler) vertical diffusion of theta, qv and
    edge-normal u via a Thomas solve scanned over the (small) vertical;
    the surface drag on u is folded implicitly into the lowest row.

Coupling matches physics/kessler.py: update theta/u/scalars, rediagnose
the coupled thermodynamic state from the equation of state
(atm_init_coupled_diagnostics, dynamics_tasks.rg:707-724).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants
from ..ops import stencils as st

KARMAN = 0.4
RIC = 0.25          # critical bulk Richardson number for the PBL top
PRANDTL = 1.0       # PBL Prandtl number (YSU surface value ~0.8-1.0)
B_LOUIS = 9.4       # Louis (1979) constants
C_STAR = 7.4


def _louis_fm_fh(rib, z1, z0):
    """Louis (1979) stability functions of the bulk Richardson number:
    unstable  f = 1 + b|Ri| / (1 + c sqrt(|Ri|)),
              c = C* b (k/ln(z1/z0))^2 sqrt(z1/z0)   (bounded as Ri -> -inf)
    stable    f = 1 / (1 + b/2 Ri)^2."""
    lnz = jnp.log(z1 / z0)
    cd_n = (KARMAN / lnz) ** 2
    c = C_STAR * B_LOUIS * cd_n * jnp.sqrt(z1 / z0)
    absri = jnp.abs(rib)
    unstable = 1.0 + B_LOUIS * absri / (1.0 + c * jnp.sqrt(absri))
    stable = 1.0 / (1.0 + 0.5 * B_LOUIS * jnp.maximum(rib, 0.0)) ** 2
    fm = jnp.where(rib < 0.0, unstable, stable)
    return fm, fm  # fh = fm at this reduction level


def surface_and_kprofile(theta, u_cell_sq, zgrid, rho, nl):
    """Surface exchange coefficients, u*, PBL height and the K profiles.

    theta [K, C] dry potential temperature; u_cell_sq [K, C] squared wind
    speed at cell centers; zgrid [K+1, C]; rho [K, C].
    Returns (Km_i, Kh_i [K+1, C] interface diffusivities with zero top/bottom
    rows, ustar [C], wth_sfc [C] kinematic heat flux, drag [C] = Cd*|V|)."""
    K, C = theta.shape
    g = constants.gravity
    z0 = nl.config_roughness
    zsfc = zgrid[0]
    zmid = 0.5 * (zgrid[:-1] + zgrid[1:]) - zsfc[None, :]   # AGL mass levels
    z1 = zmid[0]
    # flux wind-speed floor (WRF-style): keeps the bulk Ri and the exchange
    # coefficients bounded in calm columns
    spd1 = jnp.sqrt(jnp.maximum(u_cell_sq[0], 1.0))

    th_skin = (jnp.full_like(z1, nl.config_sst) if nl.config_sst > 0.0
               else theta[0])
    rib_s = g * (theta[0] - th_skin) * z1 / (theta[0] * spd1 ** 2)
    lnz = jnp.log(z1 / z0)
    fm, fh = _louis_fm_fh(rib_s, z1, z0)
    cd_n = (KARMAN / lnz) ** 2
    drag = cd_n * fm * spd1                                  # Cd |V|  [m/s]
    ustar = jnp.sqrt(cd_n * fm) * spd1
    wth_sfc = cd_n * fh * spd1 * (th_skin - theta[0])        # K m/s

    # PBL height: first interface above which bulk Ri exceeds RIC
    spd2 = jnp.maximum(u_cell_sq, 1e-4)
    rib = g * (theta - theta[0:1]) * zmid / (theta[0:1] * spd2)
    above = rib > RIC
    any_above = jnp.any(above, axis=0)
    kh_top = jnp.argmax(above, axis=0)                       # first True
    h = jnp.where(any_above,
                  jnp.take_along_axis(zmid, kh_top[None, :], axis=0)[0],
                  zmid[-1])
    h = jnp.maximum(h, 1.5 * z1)

    # K profile on interior interfaces (1..K-1)
    z_i = zgrid[1:-1] - zsfc[None, :]                        # [K-1, C] AGL
    shape = jnp.maximum(1.0 - z_i / h[None, :], 0.0) ** 2
    km = KARMAN * ustar[None, :] * z_i * shape
    # weakly-stable background above the PBL: local-Ri mixing, capped
    dz_i = zmid[1:] - zmid[:-1]
    dth = (theta[1:] - theta[:-1]) / dz_i
    du2 = jnp.maximum((jnp.sqrt(spd2[1:]) - jnp.sqrt(spd2[:-1])) ** 2
                      / dz_i ** 2, 1e-8)
    ri_loc = g / theta[1:] * dth / du2
    l_mix = 30.0
    km_bg = (l_mix ** 2 * jnp.sqrt(du2)
             * jnp.maximum(1.0 - ri_loc / RIC, 0.0) ** 2)
    km = jnp.maximum(km, jnp.minimum(km_bg, 100.0))
    zero = jnp.zeros((1, C), theta.dtype)
    km_i = jnp.concatenate([zero, km, zero], axis=0)         # [K+1, C]
    return km_i, km_i / PRANDTL, ustar, wth_sfc, drag


def implicit_diffusion(x, k_i, rho, rho_i, zgrid, dt,
                       sfc_flux=None, sfc_drag=None):
    """Backward-Euler d(rho x)/dt = d/dz(rho_i K dx/dz) on mass levels.

    k_i/rho_i at interfaces [K+1, C]; `sfc_flux` [C] is a kinematic surface
    flux (x m/s) added explicitly to the lowest level; `sfc_drag` [C]
    (= Cd|V|, m/s) applies implicit surface friction to the lowest level.
    Thomas solve scanned over the (small) vertical axis."""
    K, C = x.shape
    dzw = zgrid[1:] - zgrid[:-1]                             # [K, C]
    zmid = 0.5 * (zgrid[:-1] + zgrid[1:])
    dzu = zmid[1:] - zmid[:-1]                               # [K-1, C]

    cond = rho_i[1:K] * k_i[1:K] / dzu                       # [K-1, C]
    zero = jnp.zeros((1, C), x.dtype)
    up = jnp.concatenate([cond, zero], axis=0)               # flux to k+1
    dn = jnp.concatenate([zero, cond], axis=0)               # flux to k-1
    inv = dt / (rho * dzw)
    a = -inv * dn                                            # couples k-1
    c = -inv * up                                            # couples k+1
    b = 1.0 - a - c
    rhs = x
    if sfc_drag is not None:
        b = b.at[0].add(inv[0] * rho[0] * sfc_drag)
    if sfc_flux is not None:
        rhs = rhs.at[0].add(inv[0] * rho[0] * sfc_flux)

    # Thomas algorithm over axis 0 with [C]-wide carries
    def fwd(carry, abcr):
        cp_prev, dp_prev = carry
        a_k, b_k, c_k, r_k = abcr
        den = b_k - a_k * cp_prev
        cp = c_k / den
        dp = (r_k - a_k * dp_prev) / den
        return (cp, dp), (cp, dp)

    # carries derive from a traced operand (x[0]*0, not jnp.zeros) so their
    # varying-axes type matches the loop outputs under shard_map (vma)
    zero_c = x[0] * 0.0
    _, (cps, dps) = jax.lax.scan(fwd, (zero_c, zero_c), (a, b, c, rhs))

    def bwd(x_next, cd):
        cp_k, dp_k = cd
        x_k = dp_k - cp_k * x_next
        return x_k, x_k

    _, xs = jax.lax.scan(bwd, zero_c, (cps[::-1], dps[::-1]))
    return xs[::-1]


def apply_pbl(state, static, vert, mesh, nl, dt: float):
    """Couple the surface layer + PBL diffusion into the step (same pattern
    as physics/kessler.apply_kessler): diffuse theta/qv/u, apply surface
    fluxes, rediagnose the coupled thermodynamic state."""
    rgas, cp, p0 = constants.rgas, constants.cp, constants.p0
    rcv = rgas / (cp - rgas)

    qv = state.scalars[0] if state.scalars is not None else None
    theta = (state.theta_m / (1.0 + constants.rvord * qv)
             if qv is not None else state.theta_m)
    rho = state.rho_zz * static.zz

    u2 = state.uReconstructZonal ** 2 + state.uReconstructMeridional ** 2
    km_i, kh_i, ustar, wth, drag = surface_and_kprofile(
        theta, u2, static.zgrid, rho, nl)
    rho_i = st.interface_interp(rho, vert.fzm, vert.fzp)
    rho_i = rho_i.at[0].set(rho[0]).at[-1].set(rho[-1])

    theta_new = implicit_diffusion(theta, kh_i, rho, rho_i, static.zgrid,
                                   dt, sfc_flux=wth)
    if qv is not None and nl.config_sst > 0.0:
        # ocean-like moisture flux with Ce = Ch toward saturation at SST
        es = 610.78 * jnp.exp(17.27 * (nl.config_sst - 273.15)
                              / (nl.config_sst - 35.85))
        psfc = (static.pressure_base + state.pressure_p)[0]
        qsat = 0.622 * es / jnp.maximum(psfc - es, 1e3)
        wq = drag * (qsat - qv[0]) * (1.0 / PRANDTL)
        qv_new = implicit_diffusion(qv, kh_i, rho, rho_i, static.zgrid,
                                    dt, sfc_flux=wq)
    elif qv is not None:
        qv_new = implicit_diffusion(qv, kh_i, rho, rho_i, static.zgrid, dt)
    else:
        qv_new = None

    # momentum: diffuse edge-normal u with cell quantities averaged to edges
    coe = mesh.cellsOnEdge
    (km1, km2), (rho1, rho2), (rhoi1, rhoi2), (drag1, drag2) = st.edge_pairs_m(
        mesh, km_i, rho, rho_i, jnp.broadcast_to(drag[None, :], (1,) + drag.shape))
    km_e = 0.5 * (km1 + km2)
    rho_e = 0.5 * (rho1 + rho2)
    rhoi_e = 0.5 * (rhoi1 + rhoi2)
    drag_e = 0.5 * (drag1[0] + drag2[0])
    zg1, zg2 = st.edge_pair_m(mesh, static.zgrid)
    zg_e = 0.5 * (zg1 + zg2)
    u_new = implicit_diffusion(state.u, km_e, rho_e, rhoi_e, zg_e, dt,
                               sfc_drag=drag_e)

    theta_m = (theta_new * (1.0 + constants.rvord * qv_new)
               if qv_new is not None else theta_new)
    rtheta_p = state.rho_zz * theta_m - static.rtheta_base
    exner = (static.zz * (rgas / p0) * (rtheta_p + static.rtheta_base)) ** rcv
    pressure_p = static.zz * rgas * (
        exner * rtheta_p + static.rtheta_base * (exner - static.exner_base))

    # recouple ru exactly as atm_init_coupled_diagnostics does
    ru_new = st.avg_cell_to_edge_m(mesh, state.rho_zz) * u_new
    out = dict(theta_m=theta_m, rtheta_p=rtheta_p, exner=exner,
               pressure_p=pressure_p, u=u_new, ru=ru_new)
    if qv_new is not None:
        out["scalars"] = state.scalars.at[0].set(qv_new)
    return state.replace(**out)
