"""Ownership-aligned edge numbering (mesh/orient.py, round-5 perf lever):
transform invariants + full-dycore trajectory equivalence with the
unaligned numbering."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

GRID = "/root/reference/mesh_loading/x1.2562.grid.nc"


@pytest.fixture(scope="module")
def oriented(mesh):
    from mpas_tpu.mesh.orient import orient_edges
    return orient_edges(mesh)


class TestTransform:
    def test_owner_invariant_and_validate(self, mesh, oriented):
        n, perms = oriented
        n.validate()
        C = n.nCells
        assert n.nEdges == 3 * C
        assert n.nEdgesReal == mesh.nEdges
        # THE invariant the stencil fast path relies on
        assert (n.cellsOnEdge[:, 0] == np.arange(n.nEdges) % C).all()

    def test_each_cell_owns_at_most_three(self, oriented):
        n, perms = oriented
        cnt = np.bincount(perms["owner"], minlength=n.nCells)
        assert cnt.max() <= 3

    def test_geometry_preserved_up_to_flip(self, mesh, oriented):
        n, perms = oriented
        no, fl = perms["new_of_old"], perms["flip"]
        np.testing.assert_allclose(n.dvEdge[no], mesh.dvEdge)
        np.testing.assert_allclose(n.dcEdge[no], mesh.dcEdge)
        d = n.angleEdge[no] - mesh.angleEdge
        d = (d + np.pi) % (2.0 * np.pi) - np.pi
        err = np.where(fl < 0, np.abs(np.abs(d) - np.pi), np.abs(d))
        assert err.max() < 1e-12

    def test_thuburn_weights_flip_consistent(self, mesh, oriented):
        """v_new[new_of_old[e]] == flip[e] * v_old[e] for the tangential
        reconstruction v = sum w u applied to a random edge field."""
        n, perms = oriented
        no, fl = perms["new_of_old"], perms["flip"]
        u_old = np.random.default_rng(0).standard_normal(mesh.nEdges)
        u_new = np.zeros(n.nEdges)
        u_new[no] = u_old * fl
        eo = np.where(mesh.edgesOnEdge_mask > 0, mesh.edgesOnEdge, 0)
        v_old = (mesh.weightsOnEdge * mesh.edgesOnEdge_mask
                 * u_old[eo]).sum(1)
        eon = np.where(n.edgesOnEdge_mask > 0, n.edgesOnEdge, 0)
        v_new = (n.weightsOnEdge * n.edgesOnEdge_mask * u_new[eon]).sum(1)
        np.testing.assert_allclose(v_new[no], fl * v_old, atol=1e-13)

    def test_dummy_edges_inert(self, oriented):
        """Dummy pad edges: zero length, both cells the owner (zero
        gradients), listed by no cell, zero Thuburn weights."""
        n, perms = oriented
        filled = np.zeros(n.nEdges, bool)
        filled[perms["new_of_old"]] = True
        dummies = np.nonzero(~filled)[0]
        assert len(dummies) == n.nEdges - n.nEdgesReal
        # zero inverse lengths kill every gradient/mixing term; coincident
        # cells/vertices make all flux numerators exactly zero
        assert (n.invDvEdge[dummies] == 0.0).all()
        assert (n.invDcEdge[dummies] == 0.0).all()
        assert (n.cellsOnEdge[dummies, 0] == n.cellsOnEdge[dummies, 1]).all()
        assert (n.verticesOnEdge[dummies, 0]
                == n.verticesOnEdge[dummies, 1]).all()
        assert not np.isin(n.edgesOnCell, dummies).any()
        assert (np.abs(n.weightsOnEdge[dummies]).max() == 0.0)


class TestDycoreEquivalence:
    """The oriented mesh must reproduce the unaligned trajectory exactly
    (up to f64 summation-order roundoff from the reordered advection
    stencils): cell fields directly, edge fields through the
    permutation + flip map."""

    @pytest.fixture(scope="class")
    def pair(self, namelist):
        import copy
        from mpas_tpu.dynamics.model import build_model
        from mpas_tpu.mesh.loader import load_mesh
        nl = namelist.replace(config_jw_u_perturbation=1.0)
        m_off = build_model(namelist=nl)
        m_on = build_model(namelist=nl.replace(config_orient_edges=True))
        from mpas_tpu.mesh.orient import orient_edges
        _, perms = orient_edges(load_mesh(GRID))
        return m_off, m_on, perms

    def test_initial_state_matches(self, pair):
        m_off, m_on, perms = pair
        no, fl = perms["new_of_old"], perms["flip"]
        np.testing.assert_allclose(np.asarray(m_off.state.theta_m),
                                   np.asarray(m_on.state.theta_m), rtol=1e-12)
        u_on = np.asarray(m_on.state.u)
        u_off = np.asarray(m_off.state.u)
        np.testing.assert_allclose(u_on[:, no], fl[None, :] * u_off,
                                   atol=1e-12)

    def test_ten_step_trajectory_matches(self, pair):
        m_off, m_on, perms = pair
        no, fl = perms["new_of_old"], perms["flip"]
        s_off, s_on = m_off.state, m_on.state
        for _ in range(10):
            s_off = m_off.step_fn(s_off)
            s_on = m_on.step_fn(s_on)
        for name in ("theta_m", "rho_zz", "w", "exner"):
            a = np.asarray(getattr(s_off, name))
            b = np.asarray(getattr(s_on, name))
            scale = np.abs(a).max()
            assert np.abs(a - b).max() / scale < 1e-11, name
        u_off = np.asarray(s_off.u)
        u_on = np.asarray(s_on.u)[:, no] * fl[None, :]
        assert np.abs(u_on - u_off).max() / np.abs(u_off).max() < 1e-11
