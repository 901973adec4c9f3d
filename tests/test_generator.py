"""Mesh generator tests: invariants + operator accuracy on generated CVT
meshes (parity with the bundled x1.2562 grid)."""

import numpy as np
import pytest

from mpas_tpu.mesh.generator import generate_mesh


@pytest.fixture(scope="module")
def gen_mesh():
    return generate_mesh(levels=3, lloyd_iterations=3)    # 642 cells


def test_counts(gen_mesh):
    m = gen_mesh
    assert m.nCells == 642
    assert m.nEdges == 3 * m.nCells - 6
    assert m.nVertices == 2 * m.nCells - 4
    assert (m.nEdgesOnCell == 5).sum() == 12              # exactly 12 pentagons


def test_validate(gen_mesh):
    gen_mesh.validate()


def test_quasi_uniform(gen_mesh):
    m = gen_mesh
    ratio = m.dcEdge.max() / m.dcEdge.min()
    assert ratio < 1.45, ratio


def test_thuburn_weights_solid_body(gen_mesh):
    """Tangential reconstruction of solid-body rotation via weightsOnEdge."""
    m = gen_mesh
    Om = 1e-5
    G = Om * m.sphere_radius ** 2 * np.sin(m.latVertex)
    u = (G[m.verticesOnEdge[:, 1]] - G[m.verticesOnEdge[:, 0]]) / m.dvEdge
    v = ((m.weightsOnEdge * m.edgesOnEdge_mask) * u[m.edgesOnEdge]).sum(1)
    U = Om * m.sphere_radius * np.cos(m.latEdge)
    u_ana = U * np.cos(m.angleEdge)
    v_ana = -U * np.sin(m.angleEdge)
    assert np.corrcoef(u, u_ana)[0, 1] > 0.9999
    assert np.corrcoef(v, v_ana)[0, 1] > 0.999
    rms = np.sqrt(((v - v_ana) ** 2).mean()) / np.sqrt((v_ana ** 2).mean())
    assert rms < 0.05, rms


def test_orientation_convention_matches_loader(gen_mesh, mesh):
    """The generated verticesOnEdge orientation matches the bundled grid:
    v1->v2 is 90 degrees counterclockwise from c1->c2."""
    for m in (gen_mesh, mesh):
        pc = np.stack([m.xCell, m.yCell, m.zCell], -1)
        pv = np.stack([m.xVertex, m.yVertex, m.zVertex], -1)
        pe = np.stack([m.xEdge, m.yEdge, m.zEdge], -1)
        pe = pe / np.linalg.norm(pe, axis=1, keepdims=True)
        dc = pc[m.cellsOnEdge[:, 1]] - pc[m.cellsOnEdge[:, 0]]
        dv = pv[m.verticesOnEdge[:, 1]] - pv[m.verticesOnEdge[:, 0]]
        s = np.einsum("ij,ij->i", np.cross(dc, dv), pe)
        assert (s > 0).mean() > 0.99


@pytest.fixture(scope="module")
def var_mesh():
    from mpas_tpu.mesh.generator import circular_refinement_density
    dens = circular_refinement_density(0.0, 0.0, ratio=2.0, radius=0.9,
                                       transition=0.25)
    return generate_mesh(levels=3, lloyd_iterations=200, density_fn=dens,
                         overrelax=2.0)


def test_variable_resolution_mesh(var_mesh):
    """Density-weighted Lloyd converges toward rho^(-1/4) spacing: a 4x-area
    density contrast gives measurably finer cells in the refinement region,
    the mesh still validates (signed kite areas handle the obtuse transition
    triangles), and meshDensity is stamped for the del2/del4 mesh scaling."""
    m = var_mesh
    m.validate()
    assert m.meshDensity.max() == 1.0 and m.meshDensity.min() < 0.2
    cx = np.stack([np.cos(m.latCell) * np.cos(m.lonCell),
                   np.cos(m.latCell) * np.sin(m.lonCell),
                   np.sin(m.latCell)], axis=1)
    r = np.arccos(np.clip(cx[:, 0], -1, 1))   # distance to (0,0)
    fine = np.sqrt(m.areaCell[r < 0.5].mean())
    coarse = np.sqrt(m.areaCell[r > 1.8].mean())
    assert coarse / fine > 1.5, (coarse, fine)


def test_variable_resolution_integrates(var_mesh):
    """The variable-resolution mesh integrates 10 JW steps stably: no NaNs,
    bounded w, bounded drift from the initial jet (the mesh-quality test the
    reference's bundled-grid-only pipeline never exercises)."""
    import jax.numpy as jnp
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model

    nl = Namelist(config_nvertlevels=8, config_ztop=30000.0, dtype="float64",
                  config_jw_u_perturbation=0.0, config_dt=480.0)
    model = build_model(namelist=nl, mesh=var_mesh)
    S = model.state
    u0 = jnp.asarray(S.u)
    for _ in range(10):
        S = model.step_fn(S)
    assert not bool(jnp.any(jnp.isnan(S.u)))
    assert float(jnp.abs(S.w).max()) < 0.5
    assert float(jnp.abs(S.u - u0).max()) < 5.0
