"""Scalar (moisture) transport on the time-averaged acoustic mass fluxes.

The reference leaves scalar transport unfinished everywhere (empty qtot loop
at dynamics_tasks.rg:476-481, unused `scalars` superarray, srk3 skip at
rk_timestep.rg:465-469; SURVEY.md section 8).  This module implements the
intended MPAS semantics (atm_advance_scalars / atm_advance_scalars_mono):
flux-form advection of the scalar array using ruAvg / wwAvg accumulated over
the acoustic substeps, with

  - a 3rd-order horizontal flux via the adv_coefs stencil and flux3 vertical
    transport (atm_advance_scalars), and
  - a monotonic (Zalesak FCT) variant that limits the high-order correction
    against local min/max bounds, guaranteeing positivity for moisture
    (atm_advance_scalars_mono) — expressed scatter-free with gathers.

Both preserve a constant: the density used in the update is advanced with
the *same* discrete fluxes, so scalar == 1 stays exactly 1.

Layout: scalars are species-major [nS, K, C]; per-species fields are
level-major [K, C] like the dycore (core/state.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import stencils as st


def _mass_divergence(ruAvg, wwAvg, mesh, rdzw):
    """rho update implied by the averaged fluxes: drho = -div(ruAvg) -
    d(wwAvg)/dzeta, returned as the per-dt tendency."""
    sign_dv = mesh.edgesOnCellSign * jnp.take(mesh.dvEdge, mesh.edgesOnCell)
    h_div = st.sum_edges_to_cell_m(mesh, ruAvg, sign_dv) \
        * mesh.invAreaCell[None, :]
    return -h_div - rdzw[:, None] * st.delta(wwAvg)


def advance_scalars(scalars, rho_zz_old, ruAvg, wwAvg, mesh, vert, nl, dt):
    """3rd-order (non-monotonic) scalar update.

    scalars [nS, K, C]; returns (scalars_new, rho_zz_new)."""
    rdzw, fzm, fzp = vert.rdzw, vert.fzm, vert.fzp
    rho_new = rho_zz_old + dt * _mass_divergence(ruAvg, wwAvg, mesh, rdzw)

    flow_sign = jnp.sign(ruAvg)
    sign_only = mesh.edgesOnCellSign

    # vmap over the (major) scalar axis; the species advect independently
    cell_form = getattr(nl, "config_cell_form_ops", False)

    def one(q):
        if cell_form:
            fe = st.adv_flux_on_edge_cellform(q, flow_sign, mesh,
                                              nl.config_coef_3rd_order)
        else:
            fe = st.adv_flux_on_edge(q, flow_sign, mesh.advCellsForEdge,
                                     mesh.adv_coefs, mesh.adv_coefs_3rd)
        h_tend = -st.sum_edges_to_cell_m(mesh, ruAvg * fe, sign_only) \
            * mesh.invAreaCell[None, :]
        wq = st.vflux_mass_to_iface(q, wwAvg, fzm, fzp, nl.config_coef_3rd_order)
        v_tend = -rdzw[:, None] * st.delta(wq)
        return (q * rho_zz_old + dt * (h_tend + v_tend)) / rho_new

    return jax.vmap(one, in_axes=0, out_axes=0)(scalars), rho_new


def advance_scalars_mono(scalars, rho_zz_old, ruAvg, wwAvg, mesh, vert, nl, dt):
    """Monotonic (FCT-limited) scalar update, the MPAS default for moisture.

    Low-order solution: first-order upwind fluxes (positivity-preserving).
    High-order correction: (3rd-order flux - upwind flux), limited per edge
    by the Zalesak factors computed from local min/max bounds."""
    nS, K, C = scalars.shape
    rdzw, fzm, fzp = vert.rdzw, vert.fzm, vert.fzp
    eoc = mesh.edgesOnCell
    coe = mesh.cellsOnEdge
    inv_area = mesh.invAreaCell[None, :]
    sign_only = mesh.edgesOnCellSign
    M = eoc.shape[1]

    rho_new = rho_zz_old + dt * _mass_divergence(ruAvg, wwAvg, mesh, rdzw)
    flow_sign = jnp.sign(ruAvg)
    up = 0.5 * (1.0 + flow_sign)          # 1 if flow from cell1 -> cell2

    def one(q):
        q1, q2 = st.edge_pair_m(mesh, q)

        # ---- low-order (upwind) fluxes ----
        f_low_e = ruAvg * (up * q1 + (1.0 - up) * q2) * mesh.dvEdge[None, :]
        # vertical upwind: interface k advects q[k-1] if wwAvg>0 else q[k]
        qk = jnp.pad(q, ((0, 1), (0, 0)))             # q[k] for k<K
        qkm1 = jnp.pad(q, ((1, 0), (0, 0)))           # q[k-1]
        f_low_v = wwAvg * jnp.where(wwAvg > 0, qkm1, qk)
        f_low_v = f_low_v.at[0].set(0.0).at[K].set(0.0)

        h_low = -st.sum_edges_to_cell_m(mesh, f_low_e, sign_only) * inv_area
        v_low = -rdzw[:, None] * st.delta(f_low_v)
        rq_td = q * rho_zz_old + dt * (h_low + v_low)   # transported-diffused
        q_td = rq_td / rho_new

        # ---- high-order fluxes and anti-diffusive corrections ----
        if getattr(nl, "config_cell_form_ops", False):
            fe_high = st.adv_flux_on_edge_cellform(q, flow_sign, mesh,
                                                   nl.config_coef_3rd_order)
        else:
            fe_high = st.adv_flux_on_edge(q, flow_sign, mesh.advCellsForEdge,
                                          mesh.adv_coefs, mesh.adv_coefs_3rd)
        f_high_e = ruAvg * fe_high
        a_e = f_high_e - f_low_e                        # [K, E]
        f_high_v = st.vflux_mass_to_iface(q, wwAvg, fzm, fzp,
                                          nl.config_coef_3rd_order)
        a_v = (f_high_v - f_low_v).at[0].set(0.0).at[K].set(0.0)

        # ---- Zalesak limiter bounds from neighborhood min/max ----
        big = 1e30
        mask = mesh.edgesOnCell_mask
        q_max_h = None
        q_min_h = None
        for m in range(M):
            g = jnp.take(q, mesh.cellsOnCell[:, m], axis=1)    # [K, C]
            gm = jnp.where(mask[:, m][None, :] > 0, g, -big)
            gn = jnp.where(mask[:, m][None, :] > 0, g, big)
            q_max_h = gm if q_max_h is None else jnp.maximum(q_max_h, gm)
            q_min_h = gn if q_min_h is None else jnp.minimum(q_min_h, gn)
        q_up = jnp.concatenate([q[1:], q[-1:]], axis=0)        # level above
        q_dn = jnp.concatenate([q[:1], q[:-1]], axis=0)        # level below
        q_max = jnp.maximum(jnp.maximum(q, q_max_h), jnp.maximum(q_up, q_dn))
        q_min = jnp.minimum(jnp.minimum(q, q_min_h), jnp.minimum(q_up, q_dn))
        q_max = jnp.maximum(q_max, q_td)
        q_min = jnp.minimum(q_min, q_td)

        # net in/out anti-diffusive fluxes per cell (per-slot lane gathers;
        # inflow contribution to the cell is -sign*flux when positive)
        p_in_h = None
        p_out_h = None
        for m in range(M):
            g = jnp.take(a_e, eoc[:, m], axis=1)               # [K, C]
            signed = mesh.edgesOnCellSign[:, m][None, :] * g
            pi = jnp.maximum(-signed, 0.0)
            po = jnp.maximum(signed, 0.0)
            p_in_h = pi if p_in_h is None else p_in_h + pi
            p_out_h = po if p_out_h is None else p_out_h + po
        # vertical: d/dzeta contributes -(a_v[k+1]-a_v[k]) * rdzw
        a_top = a_v[1:]      # interface above mass level
        a_bot = a_v[:-1]
        p_in_v = (jnp.maximum(-a_top, 0.0) + jnp.maximum(a_bot, 0.0))
        p_out_v = (jnp.maximum(a_top, 0.0) + jnp.maximum(-a_bot, 0.0))

        p_in = dt * (p_in_h * inv_area + p_in_v * rdzw[:, None])
        p_out = dt * (p_out_h * inv_area + p_out_v * rdzw[:, None])

        tiny = 1e-30
        r_plus = jnp.minimum(1.0, (q_max - q_td) * rho_new / (p_in + tiny))
        r_minus = jnp.minimum(1.0, (q_td - q_min) * rho_new / (p_out + tiny))
        r_plus = jnp.maximum(r_plus, 0.0)
        r_minus = jnp.maximum(r_minus, 0.0)

        # edge limiter: min of donor r_minus and receiver r_plus; one
        # stacked gather serves both limiter fields
        (rp1, rp2), (rm1, rm2) = st.edge_pairs_m(mesh, r_plus, r_minus)
        # positive a_e moves mass from cell1 to cell2
        lim_e = jnp.where(a_e > 0, jnp.minimum(rm1, rp2), jnp.minimum(rm2, rp1))
        a_e_lim = lim_e * a_e
        # vertical at interface k: positive a_v moves from k-1 to k
        rpk = jnp.pad(r_plus, ((0, 1), (0, 0)))
        rpkm = jnp.pad(r_plus, ((1, 0), (0, 0)))
        rmk = jnp.pad(r_minus, ((0, 1), (0, 0)))
        rmkm = jnp.pad(r_minus, ((1, 0), (0, 0)))
        lim_v = jnp.where(a_v > 0, jnp.minimum(rmkm, rpk), jnp.minimum(rmk, rpkm))
        a_v_lim = (lim_v * a_v).at[0].set(0.0).at[K].set(0.0)

        h_corr = -st.sum_edges_to_cell_m(mesh, a_e_lim, sign_only) * inv_area
        v_corr = -rdzw[:, None] * st.delta(a_v_lim)
        return (rq_td + dt * (h_corr + v_corr)) / rho_new

    return jax.vmap(one, in_axes=0, out_axes=0)(scalars), rho_new
