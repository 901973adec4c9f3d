"""RCM locality renumbering (mesh/renumber.py): a pure relabeling.

The renumbered model's trajectory must be the original trajectory with
permuted columns — slot order inside every adjacency row is preserved, so
all per-output reductions sum in the same order and the arithmetic is
identical operation-for-operation.
"""

import numpy as np
import pytest

from mpas_tpu.config import Namelist
from mpas_tpu.dynamics.model import build_model
from mpas_tpu.mesh.loader import load_mesh
from mpas_tpu.mesh.renumber import block_spans, renumber_mesh

GRID = "/root/reference/mesh_loading/x1.2562.grid.nc"


@pytest.fixture(scope="module")
def meshes():
    m = load_mesh(GRID)
    n, perms = renumber_mesh(m)
    return m, n, perms


def test_renumbered_mesh_valid(meshes):
    _, n, _ = meshes
    n.validate()


def test_spans_compressed(meshes):
    m, n, _ = meshes
    # the point of the exercise: every stencil's worst per-block index span
    # shrinks to a fraction of the entity count (windowed-kernel viable)
    for name in ("edgesOnCell", "cellsOnCell", "cellsOnEdge", "edgesOnEdge",
                 "verticesOnEdge", "edgesOnVertex"):
        before = block_spans(getattr(m, name)).max()
        after = block_spans(getattr(n, name)).max()
        assert after < before, (name, before, after)
        assert after < 1600, (name, after)


def test_trajectory_is_permutation():
    nl = Namelist(config_nvertlevels=11, config_ztop=30000.0,
                  config_dt=600.0, dtype="float32",
                  config_jw_u_perturbation=1.0)
    m0 = build_model(GRID, namelist=nl)
    m1 = build_model(GRID, namelist=nl.replace(config_renumber_mesh=True))
    # recover the permutation used by m1
    _, perms = renumber_mesh(m0.mesh)
    for _ in range(3):
        m0.step()
        m1.step()
    er, cr = perms["edge_rank"], perms["cell_rank"]
    # bitwise-equal in a clean process (verified); the tolerance only covers
    # XLA:CPU persistent-cache hits whose AOT codegen (FMA contraction)
    # differs from a fresh local compile, which perturbs BOTH runs' low bits
    u0 = np.asarray(m0.state.u)
    u1 = np.asarray(m1.state.u)
    np.testing.assert_allclose(u1[:, er], u0, rtol=1e-4, atol=1e-4)
    t0, t1 = np.asarray(m0.state.theta_m), np.asarray(m1.state.theta_m)
    np.testing.assert_allclose(t1[:, cr], t0, rtol=1e-4, atol=1e-4)
    w0, w1 = np.asarray(m0.state.w), np.asarray(m1.state.w)
    np.testing.assert_allclose(w1[:, cr], w0, rtol=1e-4, atol=1e-4)
