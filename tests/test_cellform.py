"""Cell-form operators (dirHess / tanWeights / slot gathers) vs the per-edge
stencil gathers: the two formulations are algebraically identical (see
mesh/coefficients.py compute_dir_hessian), so they must agree to float64
roundoff on every output.  (x64 is enabled globally in conftest.py.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.config import Namelist
from mpas_tpu.dynamics.model import build_model
from mpas_tpu.ops import diagnostics as diag_ops


@pytest.fixture(scope="module")
def models():
    nl = Namelist(config_nvertlevels=8, dtype="float64",
                  config_cell_form_ops=True)
    m_cell = build_model(namelist=nl)
    m_sten = build_model(namelist=nl.replace(config_cell_form_ops=False))
    return m_cell, m_sten


def test_tangential_velocity_matches(models):
    m_cell, m_sten = models
    v_cell = diag_ops.compute_solve_diagnostics(
        m_cell.state, m_cell.mesh_arrays, cell_form=True)["v"]
    v_sten = diag_ops.compute_solve_diagnostics(
        m_sten.state, m_sten.mesh_arrays, cell_form=False)["v"]
    np.testing.assert_allclose(np.asarray(v_cell), np.asarray(v_sten),
                               rtol=0, atol=1e-11)


def test_full_step_matches(models):
    m_cell, m_sten = models
    s_cell = m_cell.step_fn(m_cell.state)
    s_sten = m_sten.step_fn(m_sten.state)
    for f in ("u", "w", "theta_m", "rho_zz", "rtheta_p", "pressure_p"):
        a = np.asarray(getattr(s_cell, f))
        b = np.asarray(getattr(s_sten, f))
        scale = max(np.abs(b).max(), 1e-30)
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=1e-12,
                                   err_msg=f)


def test_dir_hessian_equals_deriv_two():
    """dirHess is a pure reindexing of deriv_two: check the identity
    directly on the mesh arrays."""
    from mpas_tpu.mesh.loader import load_mesh
    from mpas_tpu.mesh import coefficients as mcoef
    from mpas_tpu.dynamics.model import DEFAULT_GRID
    mesh = load_mesh(DEFAULT_GRID)
    deriv_two = mcoef.compute_deriv_two(mesh)
    dh = mcoef.compute_dir_hessian(mesh, deriv_two)
    slots = mcoef.compute_edge_slots(mesh)
    for ind in (0, 1):
        c = mesh.cellsOnEdge[:, ind]
        np.testing.assert_allclose(
            dh[c, slots[:, ind], 0], deriv_two[:, ind, 0], atol=1e-14)
