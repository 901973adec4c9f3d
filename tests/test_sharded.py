"""Domain-decomposition tests: partition invariants and sharded-vs-unsharded
equivalence on 8 virtual CPU devices (SURVEY.md section 4: 'allclose
comparisons of sharded vs unsharded runs')."""

import dataclasses

import jax
import numpy as np
import pytest

from mpas_tpu.parallel import partition as P


@pytest.fixture(scope="module")
def part(mesh):
    return P.build_partition(mesh, 8)


def test_every_cell_owned_once(mesh, part):
    owned = np.zeros(mesh.nCells)
    for s in range(8):
        sel = part.cell_owned_mask[s] > 0
        np.add.at(owned, part.cell_l2g[s][sel], 1)
    np.testing.assert_array_equal(owned, 1.0)


def test_every_edge_and_vertex_owned_once(mesh, part):
    for l2g, om, N in [(part.edge_l2g, part.edge_owned_mask, mesh.nEdges),
                       (part.vertex_l2g, part.vertex_owned_mask, mesh.nVertices)]:
        owned = np.zeros(N)
        for s in range(8):
            sel = om[s] > 0
            np.add.at(owned, l2g[s][sel], 1)
        np.testing.assert_array_equal(owned, 1.0)


def test_halo_covers_two_rings(mesh, part):
    """Every owned cell's 2-ring advection stencil is locally resident."""
    for s in range(3):
        local = set(part.cell_l2g[s][part.cell_mask[s] > 0].tolist())
        owned = part.cell_l2g[s][part.cell_owned_mask[s] > 0]
        ring1 = mesh.cellsOnCell[owned][mesh.edgesOnCell_mask[owned] > 0]
        ring2 = mesh.cellsOnCell[ring1][mesh.edgesOnCell_mask[ring1] > 0]
        assert set(ring1.tolist()) <= local
        assert set(ring2.tolist()) <= local


def test_exchange_tables_consistent(part):
    """recv positions point at slots the owner actually sends."""
    x = part.cell_x
    S = part.n_shards
    for s in range(S):
        halo = np.nonzero(x.recv_is_halo[s] > 0)[0]
        for slot in halo[:50]:
            pos = x.recv_pos[s, slot]
            d, p = divmod(pos, x.max_send)
            # the owner d sends its local index of this global cell to s
            g = part.cell_l2g[s, slot]
            sent_local = x.send_idx[d, s, p]
            assert part.cell_l2g[d, sent_local] == g
            assert x.send_mask[d, s, p] == 1.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_unsharded(model):
    from mpas_tpu.parallel.sharded import shard_model
    sm = shard_model(model, 8)
    S_ref = model.state
    for _ in range(2):
        S_ref = model.step_fn(S_ref)
    sm.step(2)
    g = sm.gather_state(model.mesh)
    for name in ["u", "w", "theta_m", "rho_zz", "rtheta_p"]:
        a = np.asarray(getattr(S_ref, name))
        b = g[name]
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-11, name
