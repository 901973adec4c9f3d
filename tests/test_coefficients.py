"""Static coefficient builder tests: deriv_two accuracy, advection stencil
identities, velocity reconstruction, deformation weights."""

import numpy as np
import pytest

from mpas_tpu import constants
from mpas_tpu.mesh import coefficients as mc


@pytest.fixture(scope="module")
def deriv_two(mesh):
    return mc.compute_deriv_two(mesh)


@pytest.fixture(scope="module")
def adv(mesh, deriv_two):
    return mc.compute_advection_coefficients(mesh, deriv_two, coef_3rd_order=0.25)


def test_deriv_two_annihilates_constants(mesh, deriv_two):
    # second derivative of a constant field is zero -> rows sum to zero
    row_sums = deriv_two.sum(axis=2)
    assert np.abs(row_sums).max() < 1e-16


def test_deriv_two_smooth_accuracy(mesh, deriv_two):
    # d2/ds2 of q = (z/a)^2 along the edge direction vs great-circle FD
    a = mesh.sphere_radius
    q = (mesh.zCell / a) ** 2
    rc = np.stack([mesh.xCell, mesh.yCell, mesh.zCell], -1) / a
    rng = np.random.default_rng(0)
    errs = []
    for e in rng.integers(0, mesh.nEdges, 50):
        c1 = mesh.cellsOnEdge[e, 0]
        p1, p2 = rc[c1], rc[mesh.cellsOnEdge[e, 1]]
        t = p2 - (p1 @ p2) * p1
        t /= np.linalg.norm(t)
        h = 0.02
        qf = lambda s: ((np.cos(s) * p1 + np.sin(s) * t)[2]) ** 2
        d2_fd = (qf(h) - 2 * qf(0) + qf(-h)) / (a * h) ** 2
        vals = np.concatenate([[q[c1]], q[mesh.cellsOnCell[c1]] * mesh.edgesOnCell_mask[c1]])
        d2_fit = (deriv_two[e, 0, :] * vals).sum()
        errs.append(abs(d2_fit - d2_fd) / abs(d2_fd))
    assert np.median(errs) < 0.01
    assert np.max(errs) < 0.1


def test_adv_coefs_constant_field(mesh, adv):
    # flux of a constant q: sum_j adv_coefs[j]*q = q*dvEdge exactly
    total = adv.adv_coefs.sum(axis=1)
    np.testing.assert_allclose(total, mesh.dvEdge, rtol=1e-9)
    # upwind correction annihilates constants
    assert np.abs(adv.adv_coefs_3rd.sum(axis=1)).max() < 1e-9 * mesh.dvEdge.max()


def test_adv_stencil_contains_both_cells(mesh, adv):
    assert np.all(adv.advCellsForEdge[:, 0] == mesh.cellsOnEdge[:, 0])
    assert np.all(adv.advCellsForEdge[:, 1] == mesh.cellsOnEdge[:, 1])
    assert adv.nAdvCellsForEdge.max() <= 15
    assert adv.nAdvCellsForEdge.min() >= 8


def test_reconstruct_uniform_flow(mesh):
    # uniform solid-body zonal flow U0*cos(lat): normal components project as
    # u_e = U . n; LSQ reconstruction must return the vector (near) exactly
    coeffs = mc.compute_reconstruct_coefficients(mesh)
    U0 = 10.0
    # velocity field V = U0 * (zonal unit vector), i.e. rigid rotation about z
    east = np.stack([-np.sin(mesh.lonEdge), np.cos(mesh.lonEdge),
                     np.zeros(mesh.nEdges)], -1)
    # edge normal from cell positions
    pc = np.stack([mesh.xCell, mesh.yCell, mesh.zCell], -1)
    re = np.stack([mesh.xEdge, mesh.yEdge, mesh.zEdge], -1)
    re /= np.linalg.norm(re, axis=-1, keepdims=True)
    d = pc[mesh.cellsOnEdge[:, 1]] - pc[mesh.cellsOnEdge[:, 0]]
    d -= np.einsum("ej,ej->e", d, re)[:, None] * re
    nhat = d / np.linalg.norm(d, axis=-1, keepdims=True)
    clat_e = np.cos(mesh.latEdge)
    u_e = U0 * clat_e * np.einsum("ej,ej->e", east, nhat)       # [E]
    V = np.einsum("cmj,cm->cj", coeffs, u_e[mesh.edgesOnCell])   # [C, 3]
    east_c = np.stack([-np.sin(mesh.lonCell), np.cos(mesh.lonCell),
                       np.zeros(mesh.nCells)], -1)
    zonal = np.einsum("cj,cj->c", V, east_c)
    target = U0 * np.cos(mesh.latCell)
    assert np.abs(zonal - target).max() < 0.05 * U0


def test_deformation_weights_rigid_rotation(mesh):
    # rigid rotation has zero deformation: d_diag = d_off_diag ~ 0
    defc_a, defc_b = mc.compute_deformation_weights(mesh)
    U0 = 10.0
    # normal/tangential components of V = U0 cos(lat) * east at each edge
    u_e = U0 * np.cos(mesh.latEdge) * np.cos(mesh.angleEdge)
    v_e = -U0 * np.cos(mesh.latEdge) * np.sin(mesh.angleEdge)
    ue = u_e[mesh.edgesOnCell]
    ve = v_e[mesh.edgesOnCell]
    d_diag = (defc_a * ue - defc_b * ve).sum(1)
    d_off = (defc_b * ue + defc_a * ve).sum(1)
    # deformation scale of a sheared flow of the same amplitude: U0/dc
    scale = U0 / mesh.dcEdge.mean()
    assert np.abs(d_diag).max() < 0.2 * scale
    assert np.abs(d_off).max() < 0.2 * scale
