"""Mesh ingest and derived-field tests (round-trip + invariants, replacing the
reference's manual write_output/ncdump verification, SURVEY.md section 4)."""

import numpy as np
import pytest

from mpas_tpu import constants
from mpas_tpu.mesh.netcdf_io import read_netcdf, write_netcdf


def test_validate(mesh):
    mesh.validate()


def test_dims(mesh):
    assert (mesh.nCells, mesh.nEdges, mesh.nVertices) == (2562, 7680, 5120)
    # widths are trimmed to the true maxima (trim_mesh_widths)
    assert mesh.maxEdges == 6 and mesh.vertexDegree == 3
    assert mesh.maxEdges2 == 10


def test_scaling(mesh):
    # scaled to the physical earth radius (init_atm_cases.rg:87-111)
    r = np.sqrt(mesh.xCell ** 2 + mesh.yCell ** 2 + mesh.zCell ** 2)
    np.testing.assert_allclose(r, constants.sphere_radius, rtol=1e-12)
    assert abs(mesh.areaCell.sum() / (4 * np.pi * constants.sphere_radius ** 2) - 1) < 1e-9


def test_edge_cell_consistency(mesh):
    # each edge appears exactly once in each of its two cells' edge lists
    counts = np.zeros(mesh.nEdges)
    np.add.at(counts, mesh.edgesOnCell.ravel(), mesh.edgesOnCell_mask.ravel())
    np.testing.assert_allclose(counts, 2.0)


def test_signs(mesh):
    # padding slots carry zero sign; valid slots are +-1
    s = mesh.edgesOnCellSign
    assert set(np.unique(s)) <= {-1.0, 0.0, 1.0}
    assert np.all((s != 0) == (mesh.edgesOnCell_mask > 0))


def test_kite_for_cell(mesh):
    # kiteForCell points at the kite of verticesOnCell that touches the cell
    C = mesh.nCells
    for c in [0, 100, 2000]:
        for i in range(mesh.nEdgesOnCell[c]):
            v = mesh.verticesOnCell[c, i]
            j = mesh.kiteForCell[c, i]
            assert mesh.cellsOnVertex[v, j] == c


def test_netcdf_roundtrip(tmp_path, mesh):
    # write_output analog (mesh_loading.rg:490-807): write mesh vars, re-read
    path = str(tmp_path / "roundtrip.nc")
    write_netcdf(path,
                 dims={"nCells": mesh.nCells, "maxEdges": mesh.maxEdges},
                 variables={
                     "latCell": (("nCells",), mesh.latCell),
                     "areaCell": (("nCells",), mesh.areaCell),
                     "edgesOnCell": (("nCells", "maxEdges"), mesh.edgesOnCell),
                 })
    back = read_netcdf(path)
    np.testing.assert_array_equal(back["latCell"], mesh.latCell)
    np.testing.assert_array_equal(back["edgesOnCell"], mesh.edgesOnCell)


def test_grid_writer_roundtrip(tmp_path):
    """save_grid -> load_mesh round-trip: topology and orientation identical,
    geometry to 1e-9 (the write_output verification, mesh_loading.rg:490)."""
    from mpas_tpu.mesh.generator import generate_mesh
    from mpas_tpu.mesh.writer import save_grid
    from mpas_tpu.mesh.loader import load_mesh
    m = generate_mesh(levels=3, lloyd_iterations=2)
    path = str(tmp_path / "gen.grid.nc")
    save_grid(m, path)
    m2 = load_mesh(path)
    m2.validate()
    np.testing.assert_array_equal(m.cellsOnEdge, m2.cellsOnEdge)
    np.testing.assert_array_equal(m.edgesOnCell, m2.edgesOnCell)
    np.testing.assert_array_equal(m.edgesOnCellSign, m2.edgesOnCellSign)
    np.testing.assert_allclose(m.weightsOnEdge, m2.weightsOnEdge, atol=1e-12)
    np.testing.assert_allclose(m.dvEdge, m2.dvEdge, rtol=1e-12)
