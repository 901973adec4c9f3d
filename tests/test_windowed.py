"""Windowed gather-reduce kernels (tools/windowed_kernels.py — a study
module since round 5, see its docstring): exact equivalence with
the XLA gather path on a renumbered mesh (interpret mode on CPU).

Status (round-4 device study, docs/PERF.md): the windowed MXU form matches
XLA's gather pipeline to f32 roundoff and runs ~1.1x faster on cell-output
reductions but slower on edge-output ones, so it is kept as an optional
experiment rather than wired into the dycore.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.loader import load_mesh
from mpas_tpu.mesh.renumber import renumber_mesh
from mpas_tpu.ops import stencils as st

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from tools.windowed_kernels import (edge_pairs_windowed, plan_windows,  # noqa: E402
                                    slot_reduce_windowed)

GRID = "/root/reference/mesh_loading/x1.2562.grid.nc"


@pytest.fixture(scope="module")
def rmesh():
    m, _ = renumber_mesh(load_mesh(GRID))
    return m


def test_slot_reduce_matches(rmesh):
    m = rmesh
    E = m.nEdges
    eoc = jnp.asarray(np.asarray(m.edgesOnCell, np.int32))
    sign_dv = jnp.asarray((m.edgesOnCellSign * m.edgesOnCell_mask
                           * m.dvEdge[m.edgesOnCell]).astype(np.float32))
    sign = jnp.asarray((m.edgesOnCellSign
                        * m.edgesOnCell_mask).astype(np.float32))
    K = 9
    ru = jax.random.normal(jax.random.PRNGKey(0), (K, E), jnp.float32)
    fw = jax.random.normal(jax.random.PRNGKey(1), (K + 1, E), jnp.float32)
    specs = [(ru, [sign_dv, sign]), (fw, [sign])]
    ref = st.slot_reduce(eoc, specs)
    got = slot_reduce_windowed(eoc, specs, interpret=True)
    for i in range(len(specs)):
        for j in range(len(specs[i][1])):
            a, b = np.asarray(ref[i][j]), np.asarray(got[i][j])
            scale = np.abs(a).max() + 1e-30
            assert np.abs(a - b).max() / scale < 1e-6, (i, j)


def test_edge_pairs_match(rmesh):
    m = rmesh
    C = m.nCells
    coe = jnp.asarray(np.asarray(m.cellsOnEdge, np.int32))
    K = 9
    fa = jax.random.normal(jax.random.PRNGKey(2), (K, C), jnp.float32)
    fb = jax.random.normal(jax.random.PRNGKey(3), (K + 1, C), jnp.float32)
    ref = st.edge_pairs(coe, fa, fb)
    got = edge_pairs_windowed(coe, fa, fb, interpret=True)
    for i in range(2):
        for side in range(2):
            a = np.asarray(ref[i][side])
            b = np.asarray(got[i][side])
            np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)


def test_plan_cache_and_bounds(rmesh):
    m = rmesh
    eoc = jnp.asarray(np.asarray(m.edgesOnCell, np.int32))
    p1 = plan_windows(eoc)
    p2 = plan_windows(eoc)
    assert p1 is p2
    assert p1.W < m.nEdges // 8          # renumbering made windows narrow
    assert p1.idx_localT.min() >= 0 and p1.idx_localT.max() < p1.W
