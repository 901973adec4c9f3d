"""Regional (LBC) scaffolding tests: bdyMask zones, relaxation-zone mesh
scaling, and specified-zone freezing behind config_apply_lbcs — the
machinery the reference carries in atm_compute_mesh_scaling
(dynamics_tasks.rg:595-646) and the bdyMaskCell kernel gates (:1503-1538)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def regional_mesh():
    from mpas_tpu.mesh.coefficients import mark_regional_zones
    from mpas_tpu.mesh.generator import generate_mesh
    m = generate_mesh(levels=3, lloyd_iterations=3)     # 642 cells
    interior = m.latCell > 0.15                         # NH cap domain
    return mark_regional_zones(m, interior, n_relax=5)


def test_zone_structure(regional_mesh):
    m = regional_mesh
    bdy = m.bdyMaskCell
    assert set(np.unique(bdy)) == set(range(7))         # 0..5 + specified 6
    # ring r cells touch only rings r-1..r+1 or interior
    for r in range(1, 6):
        cells = np.where(bdy == r)[0]
        nbrs = m.cellsOnCell[cells][m.edgesOnCell_mask[cells] > 0]
        assert np.abs(bdy[nbrs] - r).max() <= 1
    # edge mask is the max of its two cells
    e = np.maximum(bdy[m.cellsOnEdge[:, 0]], bdy[m.cellsOnEdge[:, 1]])
    np.testing.assert_array_equal(m.bdyMaskEdge, e)


def test_regional_mesh_scaling_fields(regional_mesh):
    """meshScalingRegionalCell/Edge = density^-0.25 when h_ScaleWithMesh
    (dynamics_tasks.rg:628-646); ones otherwise."""
    from mpas_tpu.mesh.coefficients import compute_mesh_scaling
    m = regional_mesh
    m.meshDensity = np.linspace(0.5, 1.0, m.nCells)
    _, _, msrc, msre = compute_mesh_scaling(m, scale_with_mesh=True)
    np.testing.assert_allclose(msrc, m.meshDensity ** -0.25)
    md = 0.5 * (m.meshDensity[m.cellsOnEdge[:, 0]]
                + m.meshDensity[m.cellsOnEdge[:, 1]])
    np.testing.assert_allclose(msre, md ** -0.25)
    _, _, msrc0, msre0 = compute_mesh_scaling(m, scale_with_mesh=False)
    assert (msrc0 == 1.0).all() and (msre0 == 1.0).all()
    m.meshDensity = np.ones(m.nCells)


def test_specified_zone_frozen_interior_evolves(regional_mesh):
    """With config_apply_lbcs, specified-zone prognostics hold their values
    over 5 steps while the interior integrates normally and stays finite."""
    import jax.numpy as jnp
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model

    nl = Namelist(config_nvertlevels=6, config_ztop=30000.0, dtype="float64",
                  config_jw_u_perturbation=1.0, config_dt=480.0,
                  config_apply_lbcs=True)
    model = build_model(namelist=nl, mesh=regional_mesh)
    bdy_c = regional_mesh.bdyMaskCell
    bdy_e = regional_mesh.bdyMaskEdge
    spec_c = bdy_c > nl.nRelaxZone
    spec_e = bdy_e > nl.nRelaxZone
    S0 = model.state
    S = S0
    for _ in range(5):
        S = model.step_fn(S)
    assert not bool(jnp.any(jnp.isnan(S.u)))
    # specified zone held exactly (fields are level-major [K, N])
    np.testing.assert_array_equal(np.asarray(S.u)[:, spec_e],
                                  np.asarray(S0.u)[:, spec_e])
    np.testing.assert_array_equal(np.asarray(S.theta_m)[:, spec_c],
                                  np.asarray(S0.theta_m)[:, spec_c])
    np.testing.assert_array_equal(np.asarray(S.w)[:, spec_c],
                                  np.asarray(S0.w)[:, spec_c])
    # interior (perturbed JW) actually evolves
    du_int = np.abs(np.asarray(S.u) - np.asarray(S0.u))[:, bdy_e == 0].max()
    assert du_int > 1e-4, du_int
