"""Large-step tendencies: the atm_compute_dyn_tend rebuild.

This is the flop-dominant kernel of the solver (dynamics_tasks.rg:813-1500,
~670 LoC in the reference), restructured as pure gather-based array code:
U section (pressure gradient, vertical transport, nonlinear Coriolis, KE
gradient, curvature, del2/del4 mixing, Rayleigh damping), W section
(horizontal 3rd-order advection, curvature, mixing, vertical advection,
buoyancy), THETA section (flux-form advection, perturbation flux, mixing,
vertical advection, diabatic coupling).

TPU performance structure (round-3 layout, core/state.py): every field is
level-major [K, N] with the horizontal index in the lane dimension, so each
stencil slot is a ~2 ns/column lane gather from a narrow table, and fields
sharing an index vector STACK along the level axis and gather together
(st.take_packed / st.slot_reduce) — 3 stacked fields cost ~1.15x one field.
The pack groups below cut the step's gather count roughly in half.

Reference defects corrected (SURVEY.md section 8):
  - separate tend_w / per-edge flux temporaries instead of the reference's
    reuse of prognostic `w` and scalar `flux_arr` fields (:1171-1205);
  - `tend *= invAreaCell - rdzu*(...)` operator-precedence bugs unrolled into
    multiply-then-subtract (:1292, :1423);
  - the Coriolis q accumulation runs once per level (the reference's nested
    k loop accumulates nVertLevels times, :993-1001);
  - Smagorinsky kdiff uses per-level deformations (the reference's stack
    array races under flattened iteration, :863-887);
  - interior wdtz uses flux3 (omitted in the reference, :1406-1420).

Mixing (Euler) tendencies are computed on the first RK step only and reused
on steps 2/3 (rk_timestep semantics), carried in the returned Tend pytree.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from .. import constants
from . import stencils as st


# debug-only switches for term-by-term bisection in tests (names of terms to
# disable); not used in production paths
_DEBUG_DISABLE = set()


@struct.dataclass
class Tend:
    tend_u: Any          # [K, E]
    tend_w: Any          # [K+1, C]
    tend_theta: Any      # [K, C]
    tend_rho: Any        # [K, C]
    h_divergence: Any    # [K, C]
    # rk_step-0 caches reused on later RK steps
    tend_u_euler: Any    # [K, E]
    tend_w_euler: Any    # [K+1, C]
    tend_theta_euler: Any  # [K, C]
    kdiff: Any           # [K, C]
    dpdz: Any            # [K, C]
    # diagnostics for physics couplings
    rthdynten: Any       # [K, C]
    # tangential velocity (stencil form): the Coriolis term's weighted
    # edgesOnEdge sum of u IS Thuburn's v, so the reduce is shared with
    # compute_solve_diagnostics instead of being done twice (never
    # halo-exchanged: computed redundantly over the rings from fresh u)
    v: Any = None        # [K, E]


def _smagorinsky_kdiff(state, mesh, nl, invDt, v=None):
    """Horizontal Smagorinsky eddy viscosity (dynamics_tasks.rg:858-916);
    one stacked [C, M]-slot gather serves u and v."""
    v = state.v if v is None else v
    (ua, ub), (vb, va) = st.slot_reduce(
        mesh.edgesOnCell, [(state.u, [mesh.defc_a, mesh.defc_b]),
                           (v, [mesh.defc_b, mesh.defc_a])])
    d_diag = ua - vb
    d_off = ub + va
    c_s = nl.config_smagorinsky_coef
    ld = nl.config_len_disp
    kdiff = jnp.minimum((c_s * ld) ** 2 * jnp.sqrt(d_diag ** 2 + d_off ** 2),
                        0.01 * ld ** 2 * invDt)
    if nl.config_mpas_cam_coef > 0.0:
        # 2nd-order filter floor in the top 3 levels (CAM-SE style)
        K = kdiff.shape[0]
        base = 2.0833 * ld * nl.config_mpas_cam_coef
        floor = jnp.zeros(K).at[K - 3].set(base).at[K - 2].set(2 * base).at[K - 1].set(4 * base)
        kdiff = jnp.maximum(kdiff, floor[:, None])
    return kdiff


def compute_dyn_tend(state, save, static, mesh, vert, nl, rk_step: int,
                     dt: float, prev: Tend | None = None) -> Tend:
    K, C = state.theta_m.shape
    fzm, fzp, rdzw, rdzu = vert.fzm, vert.fzp, vert.rdzw, vert.rdzu
    coe = mesh.cellsOnEdge
    eoc = mesh.edgesOnCell
    inv_r_earth = 1.0 / getattr(nl, "config_sphere_radius",
                                constants.sphere_radius)
    omega_pl = constants.omega if getattr(nl, "config_coriolis", True) else 0.0
    prandtl_inv = 1.0 / constants.prandtl
    invDt = 1.0 / dt

    sign_dv = mesh.edgesOnCellSign * jnp.take(mesh.dvEdge, eoc)       # [C, M]
    sign_only = mesh.edgesOnCellSign
    cell_form = getattr(nl, "config_cell_form_ops", False)

    # ---- nonlinear Coriolis edgesOnEdge reduction, hoisted ahead of the
    # Smagorinsky call: its weighted sum of u IS the Thuburn tangential
    # velocity (diagnostics.compute_solve_diagnostics), so one stacked
    # reduce serves q, v, and the deformation inputs (stencil form only;
    # returned in Tend.v and applied to state by the caller) ----
    if not cell_form:
        W_eoe = mesh.weightsOnEdge * mesh.edgesOnEdge_mask
        ((su,), (supv,)) = st.slot_reduce(
            mesh.edgesOnEdge, [(state.u, [W_eoe]),
                               (state.u * state.pv_edge, [W_eoe])])
        v_tan = su
    else:
        su = supv = v_tan = None

    # ---- packed cell-field edge pairs (moved ahead of the flux section so
    # the cell-form advection can use the theta/w pairs for its 2nd-order
    # part) ----
    # static zz is gathered separately so XLA CSEs it across RK stages
    zz1, zz2 = st.edge_pair_m(mesh, static.zz)
    if rk_step == 0:
        kdiff0 = (jnp.zeros_like(state.theta_m)
                  if nl.config_horiz_mixing == "2d_fixed"
                  else _smagorinsky_kdiff(state, mesh, nl, invDt, v=v_tan))
        zero_row_c = jnp.zeros((1, C), kdiff0.dtype)
        kdiff_i = jnp.concatenate(
            [zero_row_c, 0.5 * (kdiff0[1:] + kdiff0[:-1]), zero_row_c],
            axis=0)                                                    # [K+1, C]
        # mass+interface stacked pack; dpdz/h_divergence of THIS call are
        # not yet known at this point, so gather the rk0-only mixing inputs
        # here and the dpdz/hd pair below with the flux pack
        ((pp1, pp2), (ke1, ke2), (tm1, tm2), (div1, div2), (kd1, kd2),
         (w1, w2), (rw1, rw2), (kdi1, kdi2)) = st.edge_pairs_m(
            mesh, state.pressure_p, state.ke, state.theta_m,
            state.divergence, kdiff0, state.w, state.rw, kdiff_i)
    else:
        ((pp1, pp2), (ke1, ke2), (tm1, tm2), (w1, w2),
         (rw1, rw2)) = st.edge_pairs_m(
            mesh, state.pressure_p, state.ke, state.theta_m, state.w, state.rw)
    rw_e = 0.5 * (rw1 + rw2)                                           # [K+1, E]

    # ---- horizontal 3rd-order advective edge values ----
    ru_edge_w = st.interface_interp(state.ru, fzm, fzp)                # [K+1, E]
    if cell_form:
        # cell-form: per-cell directional Hessians + flat slot gathers
        # (identical arithmetic to adv_coefs . q, ~5x fewer gather columns)
        Dc_t, Dc_w = st.dir_second_deriv(mesh.dirHess, mesh.cellsOnCell,
                                         state.theta_m, state.w)
        D1t, D2t = st.edge_slot_pair(Dc_t, coe, mesh.slotOnCell)
        D1w, D2w = st.edge_slot_pair(Dc_w, coe, mesh.slotOnCell)
        adv_scale = (mesh.dvEdge * mesh.dcEdge ** 2 / 12.0)[None, :]   # [1, E]
        c3 = nl.config_coef_3rd_order
        flux_arr_t = (0.5 * mesh.dvEdge[None, :] * (tm1 + tm2)
                      - adv_scale * ((D1t + D2t)
                                     + jnp.sign(state.ru) * c3 * (D1t - D2t)))
        flux_arr_w = (0.5 * mesh.dvEdge[None, :] * (w1 + w2)
                      - adv_scale * ((D1w + D2w)
                                     + jnp.sign(ru_edge_w) * c3 * (D1w - D2w)))
    else:
        # stencil form: advCellsForEdge slot reductions over narrow [K, C]
        # tables (~2 ns per gathered column — see docs/PERF.md).  Slots 0/1
        # are cell1/cell2 by construction (mesh/coefficients.py candidate
        # order) and their theta/w values are already gathered as the edge
        # pairs above — reduce only the neighbor slots and add the pair
        # terms directly (20% fewer gathered columns; reassociation only).
        a2 = mesh.advCellsForEdge[:, 2:]
        c_n, c3_n = mesh.adv_coefs[:, 2:], mesh.adv_coefs_3rd[:, 2:]
        ((bt, tt), (bw, tw)) = st.slot_reduce(
            a2, [(state.theta_m, [c_n, c3_n]), (state.w, [c_n, c3_n])])
        c0, c1 = mesh.adv_coefs[:, 0][None, :], mesh.adv_coefs[:, 1][None, :]
        d0, d1 = (mesh.adv_coefs_3rd[:, 0][None, :],
                  mesh.adv_coefs_3rd[:, 1][None, :])
        bt = c0 * tm1 + c1 * tm2 + bt
        tt = d0 * tm1 + d1 * tm2 + tt
        bw = c0 * w1 + c1 * w2 + bw
        tw = d0 * w1 + d1 * w2 + tw
        flux_arr_t = bt + jnp.sign(state.ru) * tt
        flux_arr_w = bw + jnp.sign(ru_edge_w) * tw

    # ---- perturbation theta flux needs theta_m_save edge values first ----
    if rk_step > 0:
        (ts1, ts2), = st.edge_pairs_m(mesh, save.theta_m_save)
        pert = (save.ru_save - state.ru) * 0.5 * (ts1 + ts2)           # [K, E]

    # ---- main edge->cell sums (stacked slot reductions); the cell-form
    # Coriolis/tangential inputs (u, u*pv_edge) are slot-gathered with the
    # same index ----
    flux_w_e = ru_edge_w * flux_arr_w                                  # [K+1, E]
    flux_t_e = state.ru * flux_arr_t                                   # [K, E]
    specs = [(state.ru, [sign_dv]), (flux_w_e, [sign_only]),
             (flux_t_e, [sign_only])]
    has_pert = rk_step > 0 and "theta_pert_flux" not in _DEBUG_DISABLE
    if has_pert:
        specs.append((pert, [sign_dv]))
    red = st.slot_reduce_m(mesh, eoc, specs)
    pert_sum = red[3][0] if has_pert else None
    if cell_form:
        gu_slots = st.slot_gather(eoc, state.u)
        gupv_slots = st.slot_gather(eoc, state.u * state.pv_edge)
    h_divergence = red[0][0] * mesh.invAreaCell[None, :]
    tend_w = -red[1][0]                                                # [K+1, C]
    tend_theta = -red[2][0]                                            # [K, C]
    if pert_sum is not None:
        tend_theta = tend_theta - pert_sum

    if rk_step == 0:
        tend_rho = (-h_divergence - rdzw[:, None] * st.delta(state.rw)
                    + state.tend_rho_physics)
        dpdz = -constants.gravity * (static.rho_base * state.qtot
                                     + save.rho_p_save * (1.0 + state.qtot))
        if "dpdz" in _DEBUG_DISABLE:
            dpdz = dpdz * 0.0
    else:
        tend_rho, dpdz = prev.tend_rho, prev.dpdz

    # ---- mixing coefficients (rk_step 0 only) ----
    if rk_step == 0:
        kdiff = kdiff0
        if nl.config_horiz_mixing == "2d_smagorinsky":
            h_mom_eddy_visc4 = nl.config_visc4_2dsmag * nl.config_len_disp ** 3
            h_theta_eddy_visc4 = h_mom_eddy_visc4
        else:
            h_mom_eddy_visc4 = nl.config_h_mom_eddy_visc4
            h_theta_eddy_visc4 = nl.config_h_theta_eddy_visc4
    else:
        kdiff = prev.kdiff

    # ---- edge pairs of cell fields computed within this call ----
    if rk_step == 0:
        (dpdz1, dpdz2), (hd1, hd2) = st.edge_pairs_m(mesh, dpdz, h_divergence)
    else:
        (hd1, hd2), = st.edge_pairs_m(mesh, h_divergence)

    # =================== U section ===================
    if rk_step == 0:
        tend_u_euler = -state.cqu * (
            (pp2 - pp1) * mesh.invDcEdge[None, :] / (0.5 * (zz1 + zz2))
            - 0.5 * static.zxu * (dpdz1 + dpdz2))
    else:
        tend_u_euler = prev.tend_u_euler

    # vertical transport of u
    wduz = st.vflux_mass_to_iface(state.u, rw_e, fzm, fzp, 1.0)
    tend_u = -rdzw[:, None] * st.delta(wduz)

    # nonlinear Coriolis / PV flux (Ringler et al JCP 2009):
    #   q[e] = sum_w W[e,w] * u[eoe] * 0.5*(pv[e] + pv[eoe])
    if cell_form:
        # split as 0.5*pv[e]*(sum W u) + 0.5*(sum W u*pv): both sums come
        # from the per-cell tangential matrices applied to the slot-gathered
        # u / u*pv values, read back per edge by slot-pair gathers
        t_u = st.cell_tangential(mesh.tanWeights, gu_slots)
        t_upv = st.cell_tangential(mesh.tanWeights, gupv_slots)
        tu1, tu2 = st.edge_slot_pair(t_u, coe, mesh.slotOnCell)
        tupv1, tupv2 = st.edge_slot_pair(t_upv, coe, mesh.slotOnCell)
        q = 0.5 * state.pv_edge * (tu1 + tu2) + 0.5 * (tupv1 + tupv2)
    else:
        # u and u*pv shared the edgesOnEdge slot gathers (hoisted above);
        # the 0.5*(pv_e + pv_eoe) average splits into the two weighted sums
        # (same algebraic split as the cell form)
        q = 0.5 * state.pv_edge * su + 0.5 * supv

    if "q" in _DEBUG_DISABLE:
        q = q * 0.0
    if "ke" in _DEBUG_DISABLE:
        ke1 = ke2 = ke1 * 0.0
    if "hdiv_u" in _DEBUG_DISABLE:
        hd1 = hd2 = hd1 * 0.0
    tend_u = tend_u + state.rho_edge * (q - (ke2 - ke1) * mesh.invDcEdge[None, :]) \
        - state.u * 0.5 * (hd1 + hd2)

    # curvature terms for the sphere (dynamics_tasks.rg:1009-1018)
    if nl.config_curvature:
        w_avg = 0.25 * (w1[:-1] + w1[1:] + w2[:-1] + w2[1:])           # [K, E]
        tend_u = tend_u - (2.0 * omega_pl * jnp.cos(mesh.angleEdge)
                           * jnp.cos(mesh.latEdge))[None, :] * state.rho_edge * w_avg \
            - state.u * w_avg * state.rho_edge * inv_r_earth

    # ---- horizontal/vertical mixing for u (first RK step only) ----
    if rk_step == 0:
        # del^2 u as grad(divergence) - curl(vorticity)
        vort1 = jnp.take(state.vorticity, mesh.verticesOnEdge[:, 0], axis=1)
        vort2 = jnp.take(state.vorticity, mesh.verticesOnEdge[:, 1], axis=1)
        r_dc = mesh.invDcEdge[None, :]
        r_dv = jnp.minimum(mesh.invDvEdge, 4.0 * mesh.invDcEdge)[None, :]
        u_diffusion = (div2 - div1) * r_dc - (vort2 - vort1) * r_dv
        delsq_u = u_diffusion
        tend_u_euler = tend_u_euler + (state.rho_edge * 0.5 * (kd1 + kd2)
                                       * u_diffusion * mesh.meshScalingDel2[None, :])

        # ---- mixing edge fields: one stacked [C, M]-slot gather serves the
        # del^2 sums for u, w and theta plus their kdiff-scaled variants ----
        # MPAS uses (rho_edge(k) + rho_edge(k-1)), i.e. a plain sum at the
        # interface, not fzm/fzp weights:
        zero_row_e = jnp.zeros((1, state.rho_edge.shape[1]), state.rho_edge.dtype)
        rho_sum = jnp.concatenate(
            [zero_row_e, state.rho_edge[1:] + state.rho_edge[:-1], zero_row_e],
            axis=0)
        edge_sign_w = (0.5 * mesh.invAreaCell[:, None] * sign_dv
                       * jnp.take(mesh.invDcEdge, eoc))                # [C, M]
        w_turb = rho_sum * (w2 - w1)                                   # [K+1, E]
        kd_e = 0.5 * (kdi1 + kdi2)             # 0.25*(4 cell terms) [K+1, E]
        w_turb_k = w_turb * kd_e * mesh.meshScalingDel2[None, :]

        edge_sign_t = (mesh.invAreaCell[:, None] * sign_dv
                       * jnp.take(mesh.invDcEdge, eoc))                # [C, M]
        theta_turb = (tm2 - tm1) * state.rho_edge                      # [K, E]
        kd_e2 = 0.5 * (kd1 + kd2)
        theta_turb_k = theta_turb * kd_e2 * (prandtl_inv * mesh.meshScalingDel2[None, :])

        ((delsq_w,), (tend_w_euler,), (delsq_theta,), (tend_theta_euler,),
         (du_sum,)) = st.slot_reduce_m(
            mesh, eoc, [(w_turb, [edge_sign_w]), (w_turb_k, [edge_sign_w]),
                  (theta_turb, [edge_sign_t]), (theta_turb_k, [edge_sign_t]),
                  (delsq_u, [sign_dv])])
        delsq_divergence = du_sum * mesh.invAreaCell[None, :]

        # del^4 = del^2(del^2); the u/w parts carry the h_mom factor and the
        # theta part the h_theta factor, so a zero coefficient contributes 0
        if h_mom_eddy_visc4 > 0.0 or h_theta_eddy_visc4 > 0.0:
            w_vort = mesh.edgesOnVertexSign * jnp.take(mesh.dcEdge, mesh.edgesOnVertex)
            delsq_vorticity = (st.sum_edges_to_vertex(delsq_u, mesh.edgesOnVertex, w_vort)
                               * mesh.invAreaTriangle[None, :])
            dv_v1 = jnp.take(delsq_vorticity, mesh.verticesOnEdge[:, 0], axis=1)
            dv_v2 = jnp.take(delsq_vorticity, mesh.verticesOnEdge[:, 1], axis=1)
            # delsq cell fields: one stacked edge-pair gather
            ((dd1, dd2), (dw1, dw2), (dt1, dt2)) = st.edge_pairs_m(
                mesh, delsq_divergence, delsq_w, delsq_theta)
            u_mix_scale = mesh.meshScalingDel4[None, :] * h_mom_eddy_visc4
            r_dc4 = u_mix_scale * nl.config_del4u_div_factor * mesh.invDcEdge[None, :]
            r_dv4 = u_mix_scale * jnp.minimum(mesh.invDvEdge, 4.0 * mesh.invDcEdge)[None, :]
            u_diffusion4 = state.rho_edge * ((dd2 - dd1) * r_dc4
                                             - (dv_v2 - dv_v1) * r_dv4)
            tend_u_euler = tend_u_euler - u_diffusion4

            # del^4 for w and theta: pack their difference fields
            edge_sign_w4 = (h_mom_eddy_visc4 * mesh.invAreaCell[:, None] * sign_dv
                            * jnp.take(mesh.invDcEdge * mesh.meshScalingDel4, eoc))
            edge_sign_t4 = (h_theta_eddy_visc4 * prandtl_inv
                            * mesh.invAreaCell[:, None] * sign_dv
                            * jnp.take(mesh.invDcEdge * mesh.meshScalingDel4, eoc))
            ((ddw_sum,), (ddt_sum,)) = st.slot_reduce_m(
                mesh, eoc, [(dw2 - dw1, [edge_sign_w4]),
                            (dt2 - dt1, [edge_sign_t4])])
            tend_w_euler = tend_w_euler - ddw_sum
            tend_theta_euler = tend_theta_euler - ddt_sum

        # vertical 2nd-order mixing of u (perturbation form by default)
        if nl.config_v_mom_eddy_visc2 > 0.0:
            zg1 = jnp.take(static.zgrid, coe[:, 0], axis=1)            # [K+1, E]
            zg2 = jnp.take(static.zgrid, coe[:, 1], axis=1)
            z_edge = 0.5 * (zg1 + zg2)                                 # interfaces
            zmid = 0.5 * (z_edge[:-1] + z_edge[1:])                    # mass levels
            if nl.config_mix_full:
                um = state.u
            else:
                um = state.u - (vert.u_init[:, None] * jnp.cos(mesh.angleEdge)[None, :]
                                + vert.v_init[:, None] * jnp.sin(mesh.angleEdge)[None, :])
            dzp = zmid[2:] - zmid[1:-1]
            dzm = zmid[1:-1] - zmid[:-2]
            mix = (nl.config_v_mom_eddy_visc2 * state.rho_edge[1:-1]
                   * ((um[2:] - um[1:-1]) / dzp
                      - (um[1:-1] - um[:-2]) / dzm) / (0.5 * (dzp + dzm)))
            tend_u_euler = tend_u_euler.at[1:-1].add(mix)
    else:
        tend_u_euler = prev.tend_u_euler
        tend_w_euler = prev.tend_w_euler
        tend_theta_euler = prev.tend_theta_euler

    # Rayleigh damping on u (dynamics_tasks.rg:1152-1159)
    if nl.config_rayleigh_damp_u:
        ndamp = nl.config_number_rayleigh_damp_u_levels
        rcoef = 1.0 / (ndamp * nl.config_rayleigh_damp_u_timescale_days
                       * constants.seconds_per_day)
        lev = jnp.arange(K)
        coef = jnp.maximum(0.0, (lev - (K - ndamp) + 1.0)) * rcoef
        tend_u = tend_u - state.rho_edge * state.u * coef[:, None]

    tend_u = tend_u + tend_u_euler + state.tend_ru_physics

    # =================== W section ===================
    zero_row = jnp.zeros((1, C), tend_w.dtype)

    # vertical advection of w
    wdwz = st.vflux_iface_to_mass(state.w, state.rw, 1.0)              # [K, C]
    d_wdwz = jnp.concatenate([zero_row, st.delta(wdwz), zero_row], axis=0)  # [K+1, C]
    tend_w = tend_w * mesh.invAreaCell[None, :] - rdzu[:, None] * d_wdwz

    # curvature terms — pointwise forces, added after the flux-divergence
    # normalization (the reference adds them before the invAreaCell multiply,
    # dynamics_tasks.rg:1208-1218 vs :1292, which scales them to nothing)
    if nl.config_curvature:
        rho_i = st.interface_interp(state.rho_zz, fzm, fzp)            # [K+1, C]
        ur_i = st.interface_interp(state.uReconstructZonal, fzm, fzp)
        vr_i = st.interface_interp(state.uReconstructMeridional, fzm, fzp)
        curv = (rho_i * (ur_i ** 2 + vr_i ** 2) * inv_r_earth
                + 2.0 * omega_pl * jnp.cos(mesh.latCell)[None, :] * ur_i * rho_i)
        tend_w = tend_w + curv

    if rk_step == 0:
        # pressure gradient + buoyancy (dpdz) for w
        dpp = jnp.concatenate([zero_row, st.delta(state.pressure_p), zero_row], axis=0)
        dpdz_i = st.interface_interp(dpdz, fzm, fzp)
        cqw_i = jnp.concatenate([zero_row, state.cqw[1:], zero_row], axis=0)
        tend_w_euler = tend_w_euler - cqw_i * (rdzu[:, None] * dpp - dpdz_i)

        if nl.config_v_mom_eddy_visc2 > 0.0:
            rho_sum_c = state.rho_zz[1:] + state.rho_zz[:-1]           # [K-1, C]
            d_up = (state.w[2:] - state.w[1:-1]) * rdzw[1:, None]
            d_dn = (state.w[1:-1] - state.w[:-2]) * rdzw[:-1, None]
            mixw = (nl.config_v_mom_eddy_visc2 * rho_sum_c * 0.5
                    * (d_up - d_dn) * rdzu[1:K, None])
            tend_w_euler = tend_w_euler.at[1:K].add(mixw)

    tend_w = tend_w + tend_w_euler
    # w is prognosed on interior interfaces only
    tend_w = tend_w.at[0].set(0.0).at[K].set(0.0)

    # =================== THETA section ===================
    if rk_step == 0:
        if nl.config_v_theta_eddy_visc2 > 0.0:
            tm = state.theta_m if nl.config_mix_full else state.theta_m - static.t_init
            zmid_c = 0.5 * (static.zgrid[:-1] + static.zgrid[1:])
            dzp = zmid_c[2:] - zmid_c[1:-1]
            dzm = zmid_c[1:-1] - zmid_c[:-2]
            mixt = (nl.config_v_theta_eddy_visc2 * prandtl_inv * state.rho_zz[1:-1]
                    * ((tm[2:] - tm[1:-1]) / dzp
                       - (tm[1:-1] - tm[:-2]) / dzm) / (0.5 * (dzp + dzm)))
            tend_theta_euler = tend_theta_euler.at[1:-1].add(mixt)

    # vertical advection + acoustic-consistency correction (wdtz)
    wdtz = st.vflux_mass_to_iface(state.theta_m, state.rw, fzm, fzp,
                                  nl.config_coef_3rd_order)            # [K+1, C]
    theta_save_i = st.interface_interp(save.theta_m_save, fzm, fzp)
    if "wdtz_corr" not in _DEBUG_DISABLE:
        wdtz = wdtz + (save.rw_save - state.rw) * theta_save_i
    # top interface K-1 uses the pure save form (rtheta_pp redefinition)
    wdtz = wdtz.at[K - 1].set(save.rw_save[K - 1] * theta_save_i[K - 1])

    tend_theta = tend_theta * mesh.invAreaCell[None, :] - rdzw[:, None] * st.delta(wdtz)
    rthdynten = tend_theta / state.rho_zz
    tend_theta = tend_theta + state.rho_zz * state.rt_diabatic_tend
    tend_theta = tend_theta + tend_theta_euler + state.tend_rtheta_physics

    return Tend(tend_u=tend_u, tend_w=tend_w, tend_theta=tend_theta,
                tend_rho=tend_rho, h_divergence=h_divergence,
                tend_u_euler=tend_u_euler, tend_w_euler=tend_w_euler,
                tend_theta_euler=tend_theta_euler, kdiff=kdiff, dpdz=dpdz,
                rthdynten=rthdynten, v=v_tan)
