"""Multi-band column radiation: the real solver for the radcswmx/radclwmx
slots the reference leaves as stubs (ra_cam_radctl_support.rg:546,552), plus
the cloud-optics chain (cldefr/cldems/cldovrlap — ra_cam_cld_support.rg:4-11,
also empty in the reference).

Fully jax-jittable and columnar (embarrassingly parallel over cells), so it
runs inside the sharded step program (shard_map over 'dom') with zero
collectives.

Shortwave — Lacis & Hansen (1974, JAS 31, 118) gas absorption with a
delta-Eddington / adding-method scattering solve:
  - spectrum split into a visible/UV region (weight 1-W_NIR: ozone
    absorption + Rayleigh + clouds) and a near-IR region (weight W_NIR:
    water vapor k-distribution + clouds);
  - H2O: 6-term exponential-sum fit to the LH74 broadband absorption
    function A_wv(y) = 2.9y/((1+141.5y)^0.635 + 5.925y) (max fit error
    7e-4 in transmission; tools/calibrate_radiation.py);
  - O3: LH74 analytic A_uv/A_vis on the magnified direct path and the
    1.9x diffuse reflected path;
  - clouds: tau = 3 CWP/(2 rho_w r_e) with delta-Eddington two-stream
    per layer, combined by the adding method; aerosols as a scattering/
    absorbing extra (wired to vert_interpolate paths).

Longwave — k-distribution emissivity method (diffusivity factor 1.66):
H2O (4 terms + e-type continuum), CO2 15um (3-term sub-distribution for
logarithmic band saturation), O3 9.6um, calibrated against ICRCCM-class
clear-sky LBL benchmarks on McClatchey standard atmospheres
(tools/calibrate_radiation.py):
  tropical OLR 288.8 (LBL ~288), DLR 394.9 (~395); midlat-summer OLR 278.6
  (~280), DLR 345.2 (~345); subarctic-winter OLR 200.6 (~200), DLR 162.8
  (~163) W/m^2; tropical tropospheric cooling 1.9 K/day (~2); 2xCO2
  instantaneous clear-sky forcing -3.98 W/m^2 (LBL ~-4).
Clouds enter through the cldems emissivity: SW uses maximum-random overlap
(cldovrlap); LW applies eps = emis*cldfra per layer (random overlap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants

# ---------------------------------------------------------------------------
# calibrated constants (provenance: tools/calibrate_radiation.py)
# ---------------------------------------------------------------------------

W_NIR = 2.9 / 5.925          # LH74 A_wv saturation = NIR region weight
SW_H2O_W = (0.564197, 0.170715, 0.108440, 0.075501, 0.052213, 0.028934)
SW_H2O_K = (3.200809e-03, 7.470748e-02, 4.354802e-01, 2.552351e+00,
            1.834175e+01, 1.427858e+02)

LW_H2O_W = (0.1795333, 0.06720974, 0.4838243, 0.1036203)
LW_H2O_K = (9.532292e-03, 1.350079e-01, 1.714313e+01, 3.564001e+06)
LW_CO2_W = 0.125812
LW_CO2_K = 0.802783
LW_CO2_SPLIT = ((0.55, 1.0), (0.30, 25.0), (0.15, 625.0))
LW_O3_W = 0.04
LW_O3_K = 0.126267
LW_CNT_K = 0.212141

DIFF = 1.66                  # diffusivity factor
CO2_VMR = 3.8e-4
AER_K_EXT = 3.0              # sulfate mass extinction [m^2/g]
AER_OMEGA = 0.95
AER_G = 0.65


# ---------------------------------------------------------------------------
# cloud optics (cldefr / cldems / cldovrlap equivalents)
# ---------------------------------------------------------------------------

def cldefr(t):
    """Effective radii [um] for liquid and ice (the cldefr slot,
    ra_cam_cld_support.rg:4): rel fixed at 10 um; rei ramping 10->30 um as
    temperature drops 263->223 K (CAM's Kristjansson-style table collapsed
    to its linear trend)."""
    rel = jnp.full_like(t, 10.0)
    rei = jnp.clip(10.0 + 0.5 * (263.0 - t), 10.0, 30.0)
    return rel, rei


def ice_fraction(t):
    """Condensate ice fraction: linear ramp 0 -> 1 over 263 -> 233 K."""
    return jnp.clip((263.0 - t) / 30.0, 0.0, 1.0)


def cldems(cwp, rei, fice):
    """Cloud LW emissivity (the cldems slot): 1 - exp(-D kabs CWP) with
    CAM's mass absorption coefficients kabs_liq = 0.090361 m^2/g,
    kabs_ice = 0.005 + 1/rei.  cwp in g/m^2."""
    kabs = 0.090361 * (1.0 - fice) + (0.005 + 1.0 / rei) * fice
    return 1.0 - jnp.exp(-DIFF * kabs * cwp)


def cldovrlap(cldfra):
    """Maximum-random overlap (the cldovrlap slot): effective cloud cover
    above each interface, scanning from the top.  cldfra [C, K] with k=0 the
    lowest layer; returns (tot_above [C, K+1], column total [C]).

    clear(i) = clear(i+1) * (1 - max(c_i, c_{i+1})) / (1 - c_{i+1}):
    adjacent layers overlap maximally, separated blocks randomly."""
    c = jnp.clip(cldfra, 0.0, 0.999)

    def step(carry, ck):
        clear, c_prev = carry
        clear = clear * (1.0 - jnp.maximum(ck, c_prev)) / (1.0 - c_prev)
        return (clear, ck), clear

    C = c.shape[0]
    # carries derived from the input so they inherit its sharding/varying
    # axes (shard_map scans reject unvarying init + varying output)
    init = (jnp.ones_like(c[:, 0]), jnp.zeros_like(c[:, 0]))
    # scan from the top layer (k = K-1) downward
    _, clear_below = jax.lax.scan(step, init, c.T[::-1])
    clear_below = clear_below[::-1].T                     # [C, K] below layer k
    tot_above = 1.0 - jnp.concatenate(
        [clear_below, jnp.ones((C, 1), c.dtype)], axis=1)  # [C, K+1]
    return tot_above, tot_above[:, 0]


# ---------------------------------------------------------------------------
# shortwave
# ---------------------------------------------------------------------------

def _a_oz(x):
    """LH74 ozone absorption (fraction of total solar flux) for path x
    [cm STP]."""
    a_uv = (1.082 * x / (1.0 + 138.6 * x) ** 0.805
            + 0.0658 * x / (1.0 + (103.6 * x) ** 3))
    a_vis = 0.02118 * x / (1.0 + 0.042 * x + 0.000323 * x ** 2)
    return a_uv + a_vis


def _two_stream(tau, omega, g):
    """Delta-Eddington two-stream diffuse reflectance/transmittance of one
    layer (vectorized).  Returns (R, T)."""
    f = g * g
    tau = (1.0 - omega * f) * tau
    omega = jnp.clip((1.0 - f) * omega / (1.0 - omega * f), 0.0, 0.999999)
    g = g / (1.0 + g)
    lam = jnp.sqrt(3.0 * (1.0 - omega) * (1.0 - omega * g))
    u = 1.5 * (1.0 - omega * g) / jnp.maximum(lam, 1e-12)
    lt = jnp.clip(lam * tau, 0.0, 50.0)
    ep, em = jnp.exp(lt), jnp.exp(-lt)
    D = (u + 1.0) ** 2 * ep - (u - 1.0) ** 2 * em
    R = (u * u - 1.0) * (ep - em) / D
    T = 4.0 * u / D
    # clamp f32 cancellation noise in the near-conservative limit
    R = jnp.clip(R, 0.0, 1.0)
    T = jnp.clip(T, 0.0, 1.0)
    return R, T


def _sw_adding(tau, omega, g, inc, albedo):
    """Adding method over K layers (top = index K-1): per-layer two-stream
    (R_i, T_i) composed with the surface.  inc [C] flux incident at TOA.
    Returns (abs_layer [C, K], abs_sfc [C], reflected_toa [C])."""
    R, T = _two_stream(tau, omega, g)                     # [C, K]

    # upward pass: combined reflectance of layer i + everything below
    def up(rb, rt):
        r, t = rt
        rb_new = r + t * t * rb / (1.0 - r * rb)
        return rb_new, rb

    rb0 = jnp.full_like(tau[:, 0], albedo)
    rb_final, rb_below = jax.lax.scan(up, rb0, (R.T, T.T))
    # rb_below[i] = reflectance below layer i (excl. layer i); [K, C]

    # downward pass from the top
    def down(f, xs):
        r, t, rb_b, rb_i = xs
        f_next = f * t / (1.0 - r * rb_b)
        absorbed = f * (1.0 - rb_i) - f_next * (1.0 - rb_b)
        return f_next, absorbed

    rb_incl = jnp.concatenate(
        [rb_below[1:], rb_final[None]], axis=0)           # reflectance incl. layer i
    xs = (R.T[::-1], T.T[::-1], rb_below[::-1], rb_incl[::-1])
    f_sfc, absorbed = jax.lax.scan(down, inc, xs)
    abs_layer = absorbed[::-1].T                          # [C, K]
    abs_sfc = f_sfc * (1.0 - rb0)
    reflected = inc * rb_final
    return abs_layer, abs_sfc, reflected


def sw_fluxes(mu0, solcon, pmid, pint, q, o3mmr, cldfra, cwp, rel, rei, fice,
              aer_mmr=None, albedo=0.2):
    """Shortwave heating + surface/TOA fluxes.

    All fields [C, K] (k=0 lowest), pint [C, K+1], mu0 [C].
    Returns dict(qrs [K/s], swdnb, swups, fsnt, fsntc...)."""
    dtype = pmid.dtype
    g_grav, cp = constants.gravity, constants.cp
    C, K = pmid.shape
    mu = jnp.maximum(mu0, 0.0)
    day = (mu > 1e-4).astype(dtype)
    mu_safe = jnp.maximum(mu, 0.05)

    dp = jnp.abs(pint[:, :-1] - pint[:, 1:])              # [C, K]
    path = dp / g_grav                                    # kg/m^2

    # --- ozone on the direct + reflected path (decoupled, LH74) ---
    # cumulative ozone above each interface [cm STP]: 1 cm STP = 21.415 kg/m^2
    du_o3 = o3mmr * path / 2.1415e-2                      # cm STP per layer
    x_above = jnp.cumsum(du_o3[:, ::-1], axis=1)[:, ::-1]  # incl. own layer
    x_top = x_above - du_o3                                # above layer top
    M = 35.0 / jnp.sqrt(1224.0 * mu_safe ** 2 + 1.0)
    s_toa = solcon * mu * day
    a_dn = _a_oz(M[:, None] * x_above) - _a_oz(M[:, None] * x_top)
    oz_dn = s_toa[:, None] * a_dn                         # W/m^2 per layer
    x_col = x_above[:, 0]

    # --- effective scattering scene (max-random overlap) ---
    tot_above, c_tot = cldovrlap(cldfra)
    # in-scene cloud optical depth: scale tau by the effective overlapped
    # cover so one adding solve represents the ICA average
    c_eff = jnp.maximum(c_tot[:, None], 1e-6)
    tau_liq = 1.5 * cwp * (1.0 - fice) / jnp.maximum(rel, 1.0)
    tau_ice = 1.5 * cwp * fice / jnp.maximum(rei, 1.0)
    tau_cld = (tau_liq + tau_ice) * cldfra / c_eff

    tau_aer = jnp.zeros_like(pmid)
    if aer_mmr is not None:
        tau_aer = AER_K_EXT * (aer_mmr * 1e3) * path      # mmr kg/kg -> g/kg
    # Rayleigh optical depth per layer in the visible region (column ~0.09,
    # the broadband value behind LH74's R_r(mu) reflection formulas)
    tau_ray_v = 0.09 * dp / pint[:, :1]

    def region(w_region, tau_gas, omega_c, with_ray):
        tau_r = tau_ray_v if with_ray else jnp.zeros_like(tau_gas)
        tau = tau_gas + tau_r + tau_cld + tau_aer + 1e-12
        omega = (tau_r + omega_c * tau_cld
                 + AER_OMEGA * tau_aer) / tau
        gsc = (0.85 * omega_c * tau_cld + AER_G * AER_OMEGA * tau_aer) / \
            jnp.maximum(tau_r + omega_c * tau_cld + AER_OMEGA * tau_aer, 1e-12)
        inc = w_region * s_toa
        return _sw_adding(tau, omega, gsc, inc, albedo)

    # --- visible region: ozone removed from the beam first ---
    w_vis = 1.0 - W_NIR
    oz_total = oz_dn.sum(axis=1)
    abs_v, sfc_v, refl_v = region(w_vis, jnp.zeros_like(pmid), 0.999999, True)
    # renormalize the visible region for the ozone-depleted beam
    deplete = jnp.where(s_toa > 0, 1.0 - oz_total / jnp.maximum(
        w_vis * s_toa, 1e-6), 1.0)
    deplete = jnp.clip(deplete, 0.0, 1.0)[:, None]
    abs_v = abs_v * deplete
    sfc_v = sfc_v * deplete[:, 0]
    refl_v = refl_v * deplete[:, 0]
    # ozone absorption of the reflected beam (diffuse magnification 1.9)
    a_up = (_a_oz(1.9 * (x_col[:, None] - x_top) + (M * x_col)[:, None])
            - _a_oz(1.9 * (x_col[:, None] - x_above) + (M * x_col)[:, None]))
    oz_up = refl_v[:, None] * a_up
    refl_v = jnp.maximum(refl_v - oz_up.sum(axis=1), 0.0)

    # --- NIR region: H2O k-distribution, one adding solve per term ---
    y_layer = (q * path * 0.1) * (pmid / 1.01325e5) ** 0.9  # g/cm^2 scaled
    y_slant = y_layer / mu_safe[:, None]                  # direct-beam slant
    abs_n = jnp.zeros_like(pmid)
    sfc_n = jnp.zeros_like(sfc_v)
    refl_n = jnp.zeros_like(refl_v)
    for w_i, k_i in zip(SW_H2O_W, SW_H2O_K):
        a, s, r = region(W_NIR * w_i, k_i * y_slant, 0.98, False)
        abs_n += a
        sfc_n += s
        refl_n += r

    abs_layer = abs_v + abs_n + oz_dn + oz_up
    qrs = abs_layer / (cp * path)
    swdnb = (sfc_v + sfc_n) / jnp.maximum(1.0 - albedo, 1e-6)
    fsns = sfc_v + sfc_n
    fsnt = s_toa - refl_v - refl_n
    return dict(qrs=qrs * day[:, None], swdnb=swdnb * day, fsns=fsns * day,
                fsnt=fsnt * day, swup_toa=(refl_v + refl_n) * day,
                solin=s_toa)


# ---------------------------------------------------------------------------
# longwave
# ---------------------------------------------------------------------------

def lw_fluxes(t, q, o3mmr, pmid, pint, cld_emis, cldfra, tsfc, emiss=1.0):
    """Longwave fluxes and heating via the calibrated k-distribution
    emissivity method.  Fields [C, K], k=0 lowest; returns dict(qrl [K/s],
    olr, lwdnb, flns)."""
    sb, g_grav, cp = constants.stbolt, constants.gravity, constants.cp
    C, K = t.shape
    dp = jnp.abs(pint[:, :-1] - pint[:, 1:])
    path = dp / g_grav

    u_h2o = q * path * 0.1                                # g/cm^2
    u_co2 = CO2_VMR * (44.0 / 28.97) * dp / g_grav * 0.1
    u_o3 = o3mmr * path * 0.1
    pscale = (pmid / 1.01325e5) ** 0.8
    e_vap = q * pmid / 0.622
    u_cnt = u_h2o * (e_vap / 1000.0) * (296.0 / t) ** 4

    B = sb * t ** 4
    B_sfc = sb * tsfc ** 4

    # effective per-layer cloud emissivity; LW uses per-layer random
    # overlap (eps = emis * cldfra applied independently per layer) —
    # max-random overlap (cldovrlap) is used only on the SW side
    eps_c = jnp.clip(cld_emis * cldfra, 0.0, 0.999)

    terms = (
        [(w, DIFF * k * u_h2o * pscale + DIFF * LW_CNT_K * u_cnt)
         for w, k in zip(LW_H2O_W, LW_H2O_K)]
        + [(LW_CO2_W * f, DIFF * LW_CO2_K * r * u_co2 * pscale)
           for f, r in LW_CO2_SPLIT]
        + [(LW_O3_W, DIFF * LW_O3_K * u_o3)]
    )

    Fdn = jnp.zeros((C, K + 1), t.dtype)
    Fup = jnp.zeros((C, K + 1), t.dtype)
    for w, tau in terms:
        tr = jnp.exp(-jnp.clip(tau, 0.0, 80.0)) * (1.0 - eps_c)

        def dn_step(f, x):
            tr_i, b_i = x
            f = f * tr_i + w * b_i * (1.0 - tr_i)
            return f, f

        _, fdn = jax.lax.scan(dn_step, jnp.zeros_like(t[:, 0]),
                              (tr.T[::-1], B.T[::-1]))
        fdn = fdn[::-1].T                                 # [C, K] at layer bottoms
        Fdn = Fdn + jnp.concatenate(
            [fdn, jnp.zeros((C, 1), t.dtype)], axis=1)

        f0 = w * emiss * B_sfc + (1.0 - emiss) * fdn[:, 0]

        def up_step(f, x):
            tr_i, b_i = x
            f = f * tr_i + w * b_i * (1.0 - tr_i)
            return f, f

        fup_sfc = f0
        _, fup = jax.lax.scan(up_step, fup_sfc, (tr.T, B.T))
        Fup = Fup + jnp.concatenate([fup_sfc[:, None], fup.T], axis=1)

    net = Fup - Fdn                                        # [C, K+1]
    qrl = -(net[:, 1:] - net[:, :-1]) / dp * g_grav / cp
    return dict(qrl=qrl, olr=Fup[:, -1], lwdnb=Fdn[:, 0],
                flns=net[:, 0], lwup_sfc=Fup[:, 0])
