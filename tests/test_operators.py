"""Discrete operator tests: divergence, vorticity, tridiagonal solve,
vertical flux operators."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu import constants
from mpas_tpu.core.vertical import make_vertical_grid
from mpas_tpu.ops import stencils as st


def test_vertical_grid_identities():
    vg = make_vertical_grid(26, 30000.0)
    K = 26
    np.testing.assert_allclose(vg.rdzw * vg.dzw, 1.0)
    np.testing.assert_allclose(vg.fzm[1:K] + vg.fzp[1:K], 1.0)
    # surface extrapolation weights reproduce constants exactly
    np.testing.assert_allclose(vg.cf1 + vg.cf2 + vg.cf3, 1.0, rtol=1e-12)
    assert vg.zw[0] == 0.0 and abs(vg.zw[K] - 30000.0) < 1e-9


def test_interface_interp_linear():
    vg = make_vertical_grid(12, 24000.0)
    # a field linear in zu interpolates exactly to zw at interior interfaces
    # (level-major [K, N] layout)
    f = (2.0 + 3.0 * vg.zu)[:, None].repeat(4, 1)
    fi = st.interface_interp(jnp.asarray(f), jnp.asarray(vg.fzm), jnp.asarray(vg.fzp))
    expect = np.broadcast_to((2.0 + 3.0 * vg.zw)[:, None], (13, 4))
    np.testing.assert_allclose(np.asarray(fi)[1:12], expect[1:12], rtol=1e-12)


def test_divergence_of_streamfunction_flow(model):
    # u from a streamfunction (the JW init construction) is discretely
    # divergence-free: div = sum sign*dv*u/A ~ 0
    mesh = model.mesh_arrays
    u = model.state.u
    w_div = (mesh.edgesOnCellSign * jnp.take(mesh.dvEdge, mesh.edgesOnCell)
             * mesh.invAreaCell[:, None])
    ru = model.state.ru
    div = st.sum_edges_to_cell(ru, mesh.edgesOnCell, w_div)
    scale = float(jnp.abs(ru).max()) / float(mesh.dcEdge.mean())
    assert float(jnp.abs(div).max()) < 1e-3 * scale


def test_vorticity_solid_body(model):
    # u = normal component of solid-body rotation -> vorticity = 2 Omega_r sin(lat)
    import numpy as np
    m = model.mesh
    mesh = model.mesh_arrays
    Om = 1e-5
    # JW-style construction (init_atm_cases.rg:538): u_e = (G(v2)-G(v1))*a/dv
    # with dG/dlat = U(lat)/a; solid body U = Om*a*cos(lat) -> G = Om*a*sin(lat)
    G = Om * m.sphere_radius ** 2 * np.sin(m.latVertex)
    v1, v2 = m.verticesOnEdge[:, 0], m.verticesOnEdge[:, 1]
    u = (G[v2] - G[v1]) / m.dvEdge
    w_vortex = mesh.edgesOnVertexSign * jnp.take(mesh.dcEdge, mesh.edgesOnVertex)
    vort = st.sum_edges_to_vertex(jnp.asarray(u)[None, :], mesh.edgesOnVertex, w_vortex)
    vort = np.asarray(vort)[0] * m.invAreaTriangle
    target = 2.0 * Om * np.sin(m.latVertex)
    # discrete circulation matches analytic up to coarse-mesh truncation
    # (~5% max near pentagons on the 480 km mesh)
    err = np.abs(vort - target).max() / (2 * Om)
    assert err < 0.1, err
    assert np.corrcoef(vort, target)[0, 1] > 0.999


def test_tridiag_solve_against_dense(model):
    from mpas_tpu.ops import acoustic as A
    from mpas_tpu.ops import recover as R
    state = R.compute_moist_coefficients(model.state, model.mesh_arrays)
    coefs = A.compute_vert_imp_coefs(state, model.static, model.vert,
                                     model.namelist, 240.0)
    K, C = state.theta_m.shape
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(np.concatenate([np.zeros((1, C)),
                                      rng.normal(0, 1, (K - 1, C)),
                                      np.zeros((1, C))], axis=0))
    w = np.asarray(A._tridiag_solve(rhs, coefs))
    # verify a*w[k-1] + b*w[k] + c*w[k+1] = rhs on a sample of columns
    a = np.asarray(coefs.a_tri)
    alpha = np.asarray(coefs.alpha_tri)
    gamma = np.asarray(coefs.gamma_tri)
    # reconstruct b and c from alpha/gamma: alpha = 1/(b - a*gamma_prev); c = gamma/alpha
    for c_ in [0, 17, 901]:
        b = 1.0 / alpha[1:K, c_] + a[1:K, c_] * np.concatenate([[0], gamma[1:K - 1, c_]])
        cc = gamma[1:K, c_] / alpha[1:K, c_]
        res = (a[1:K, c_] * w[0:K - 1, c_] + b * w[1:K, c_]
               + cc * w[2:K + 1, c_]) - np.asarray(rhs)[1:K, c_]
        assert np.abs(res).max() < 1e-10


def test_vflux_constant_field():
    vg = make_vertical_grid(8, 16000.0)
    fzm, fzp = jnp.asarray(vg.fzm), jnp.asarray(vg.fzp)
    q = jnp.ones((8, 5))
    m = jnp.asarray(np.random.default_rng(1).normal(0, 1, (9, 5)))
    m = m.at[0].set(0).at[8].set(0)
    flx = st.vflux_mass_to_iface(q, m, fzm, fzp, 0.25)
    # for constant q the flux must equal m * q at every interior interface
    np.testing.assert_allclose(np.asarray(flx)[1:8], np.asarray(m)[1:8], rtol=1e-12)
