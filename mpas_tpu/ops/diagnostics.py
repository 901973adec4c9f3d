"""Diagnostic operators: solve_diagnostics, velocity reconstruction, coupled
state initialization, output diagnostics.

Rebuilds atm_compute_solve_diagnostics (dynamics_tasks.rg:328-454),
mpas_reconstruct_2d (:1894-1948), atm_init_coupled_diagnostics (:651-725) and
atm_compute_output_diagnostics (:729-744) as pure gather-based functions over
level-major [K, N] fields (core/state.py).
Reference defects corrected here (SURVEY.md section 8):
  - divergence accumulates s * u (the reference's `s + u` at :375);
  - the tangential-velocity sum includes all nEdgesOnEdge terms (the
    reference starts its loop at 1, :433);
  - rho_edge is actually computed (consumed but never written in the
    reference).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from . import stencils as st


def compute_solve_diagnostics(state, mesh, hollingsworth: bool = False,
                              reconstruct_v: bool = True,
                              cell_form: bool = True,
                              apvm_upwinding: float = 0.0, dt: float = 0.0):
    """Returns dict of updated diagnostic fields:
    ke, divergence, vorticity, pv_edge, rho_edge, v (if reconstruct_v).

    `cell_form`: compute the tangential velocity via the per-cell Thuburn
    matrices (mesh.tanWeights + slot gathers) instead of the [E, W2]-slot
    edgesOnEdge reduction — identical arithmetic, far fewer gathers.

    `apvm_upwinding` > 0 applies the anticipated-potential-vorticity
    upwinding of pv_edge (Ringler et al. JCP 2010 eq. 72; MPAS
    atm_compute_solve_diagnostics, skipped by the reference at
    rk_timestep.rg:453): pv_edge -= apvm*dt*(v*gradPVt + u*gradPVn).
    `dt` is required (> 0) whenever apvm_upwinding > 0."""
    if apvm_upwinding > 0.0 and not dt > 0.0:
        raise ValueError(
            f"apvm_upwinding={apvm_upwinding} requires dt > 0 (got {dt}); "
            "a zero dt silently disables the APVM correction")
    u = state.u
    h = state.rho_zz

    # edge-interpolated mass and kinetic energy
    rho_edge = st.avg_cell_to_edge_m(mesh, h)
    efac = (mesh.dcEdge * mesh.dvEdge)[None, :]
    ke_edge = efac * u * u

    # circulation -> relative vorticity at vertices
    w_vortex = mesh.edgesOnVertexSign * jnp.take(mesh.dcEdge, mesh.edgesOnVertex)
    vorticity = st.sum_edges_to_vertex(u, mesh.edgesOnVertex, w_vortex)
    vorticity = vorticity * mesh.invAreaTriangle[None, :]

    # divergence and cell kinetic energy share the slot-gathered u: the KE
    # edge value is efac * u^2 with efac a mesh constant, so its per-cell
    # weight absorbs the gathered efac (st.slot_reduce doc)
    w_div = (mesh.edgesOnCellSign * jnp.take(mesh.dvEdge, mesh.edgesOnCell)
             * mesh.invAreaCell[:, None])
    w_ke = (0.25 * mesh.edgesOnCell_mask * mesh.invAreaCell[:, None]
            * jnp.take(mesh.dcEdge * mesh.dvEdge, mesh.edgesOnCell))
    gu_slots = st.slot_gather(mesh.edgesOnCell, u)
    divergence = sum(w_div[:, m][None, :] * gu_slots[m]
                     for m in range(len(gu_slots)))
    ke = sum(w_ke[:, m][None, :] * gu_slots[m] ** 2
             for m in range(len(gu_slots)))

    kite_area = None
    if hollingsworth or apvm_upwinding > 0.0:
        kite_area = jnp.take_along_axis(
            jnp.take(mesh.kiteAreasOnVertex, mesh.verticesOnCell, axis=0),
            mesh.kiteForCell[..., None], axis=2)[..., 0]       # [C, M]

    if hollingsworth:
        # AG's KE construction (dynamics_tasks.rg:392-418)
        r = 0.25 * mesh.invAreaTriangle[None, :]
        ke_vertex = st.sum_edges_to_vertex(
            ke_edge, mesh.edgesOnVertex, jnp.ones_like(mesh.edgesOnVertexSign)) * r
        ke_fact = 1.0 - 0.375
        ke = ke * ke_fact
        ((kv_sum,),) = st.slot_reduce(
            mesh.verticesOnCell,
            [(ke_vertex, [kite_area * mesh.edgesOnCell_mask])])
        ke = ke + (1.0 - ke_fact) * mesh.invAreaCell[None, :] * kv_sum

    out = dict(ke=ke, divergence=divergence, vorticity=vorticity, rho_edge=rho_edge)

    # tangential velocities (Thuburn et al JCP 2009)
    if reconstruct_v:
        if cell_form:
            t_u = st.cell_tangential(mesh.tanWeights, gu_slots)
            tu1, tu2 = st.edge_slot_pair(t_u, mesh.cellsOnEdge,
                                         mesh.slotOnCell)
            out["v"] = tu1 + tu2
        else:
            out["v"] = st.edges_on_edge_sum(u, mesh.edgesOnEdge,
                                            mesh.weightsOnEdge,
                                            mesh.edgesOnEdge_mask)

    # potential vorticity at vertices and edges (dry: no 1/h factor)
    pv_vertex = mesh.fVertex[None, :] + vorticity
    pv_edge = st.sum_vertices_to_edge(pv_vertex, mesh.verticesOnEdge)

    if apvm_upwinding > 0.0:
        # anticipated PV: advect pv_edge upstream by apvm*dt along the full
        # (normal u, tangential v) edge velocity
        pvv1 = jnp.take(pv_vertex, mesh.verticesOnEdge[:, 0], axis=1)
        pvv2 = jnp.take(pv_vertex, mesh.verticesOnEdge[:, 1], axis=1)
        gradPVt = (pvv2 - pvv1) / mesh.dvEdge[None, :]
        ((pvc_sum,),) = st.slot_reduce(
            mesh.verticesOnCell,
            [(pv_vertex, [kite_area * mesh.edgesOnCell_mask])])
        pv_cell = mesh.invAreaCell[None, :] * pvc_sum
        gradPVn = st.diff_cell_to_edge_m(mesh, pv_cell) / mesh.dcEdge[None, :]
        # When reconstruct_v=False (RK stages 1-2 in srk3), this reuses the
        # stage-0 tangential velocity state.v while u and pv are current-
        # stage.  Intentional: MPAS carries the same staleness (v is only
        # refreshed where solve_diagnostics reconstructs it), and the APVM
        # term is a small dissipative correction insensitive to O(dt) lag.
        v_edge = out.get("v", state.v)
        pv_edge = pv_edge - apvm_upwinding * dt * (v_edge * gradPVt
                                                   + u * gradPVn)

    out["pv_edge"] = pv_edge
    return out


def reconstruct_velocity(u, mesh):
    """Cell-center zonal/meridional wind from edge normal velocities
    (mpas_reconstruct_2d, dynamics_tasks.rg:1894-1948; coefficients are the
    tangent-plane LSQ matrix, mesh/coefficients.py)."""
    ((ux, uy, uz),) = st.slot_reduce_m(
        mesh, mesh.edgesOnCell,
        [(u, [mesh.coeffs_reconstruct[..., 0],
              mesh.coeffs_reconstruct[..., 1],
              mesh.coeffs_reconstruct[..., 2]])])
    clat = jnp.cos(mesh.latCell)[None, :]
    slat = jnp.sin(mesh.latCell)[None, :]
    clon = jnp.cos(mesh.lonCell)[None, :]
    slon = jnp.sin(mesh.lonCell)[None, :]
    zonal = -ux * slon + uy * clon
    meridional = -(ux * clon + uy * slon) * slat + uz * clat
    return zonal, meridional


def init_coupled_diagnostics(state, static, mesh, vert):
    """Derive the coupled state (ru, rw, rho_p, rtheta_p, exner, pressure)
    from the uncoupled initial condition (atm_init_coupled_diagnostics,
    dynamics_tasks.rg:651-725).  Expects state.rho_zz to hold physical rho
    on input (divided by zz here)."""
    rgas, cp, p0 = constants.rgas, constants.cp, constants.p0
    rcv = rgas / (cp - rgas)

    rho_zz = state.rho_zz / static.zz
    ru = st.avg_cell_to_edge_m(mesh, rho_zz) * state.u

    # rw = rho*omega from w and ru (inverse of the recover procedure)
    zz_i = st.interface_interp(static.zz, vert.fzm, vert.fzp)         # [K+1, C]
    rho_i = st.interface_interp(rho_zz, vert.fzm, vert.fzp)
    rw = state.w * rho_i * zz_i

    # subtract the sloping-coordinate metric transport
    flux_e = st.interface_interp(ru, vert.fzm, vert.fzp)              # [K+1, E]
    metric = st.zb_metric_m(mesh, flux_e, mesh.edgesOnCellSign,
                            static.zb_cell, static.zb3_cell)            # [K+1, C]
    rw = rw - metric * zz_i

    rho_p = rho_zz - static.rho_base
    rtheta_p = (state.theta_m * rho_p
                + static.rho_base * (state.theta_m - static.theta_base))
    exner = (static.zz * (rgas / p0) * (rtheta_p + static.rtheta_base)) ** rcv
    pressure_p = static.zz * rgas * (exner * rtheta_p
                                     + static.rtheta_base * (exner - static.exner_base))
    return state.replace(rho_zz=rho_zz, ru=ru, rw=rw, rho_p=rho_p,
                         rtheta_p=rtheta_p, exner=exner, pressure_p=pressure_p)


def output_diagnostics(state, static):
    """rho, theta, full pressure for output (atm_compute_output_diagnostics,
    dynamics_tasks.rg:729-744)."""
    rho = state.rho_zz * static.zz
    qv = state.scalars[0] if state.scalars is not None else 0.0
    theta = state.theta_m / (1.0 + constants.rvord * qv)
    pressure = static.pressure_base + state.pressure_p
    return dict(rho=rho, theta=theta, pressure=pressure)
