"""Spherical centroidal-Voronoi mesh generator.

The reference ships only the bundled x1.2562 grid (mesh_loading/, SURVEY.md
section 2.2); production configurations need the x1.10242/40962/163842
family.  This module generates the same quasi-uniform icosahedral CVT meshes
from scratch: subdivide the icosahedron k times (10*4^k+2 cells), optionally
Lloyd-relax to a CVT, take the spherical Delaunay triangulation (convex
hull), and derive the full MPAS mesh data structure including the Thuburn
tangential-reconstruction weights (validated against the bundled grid's
weightsOnEdge in tests/test_generator.py).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import ConvexHull

from .. import constants
from .loader import Mesh, _compute_signs


# ---------------------------------------------------------------------------
# point generation
# ---------------------------------------------------------------------------

def icosahedron_points():
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    pts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            pts += [(0, a, b), (a, b, 0), (b, 0, a)]
    pts = np.array(pts, dtype=np.float64)
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def _triangulate(points):
    hull = ConvexHull(points)
    # orient all triangles outward (counterclockwise seen from outside)
    tris = hull.simplices.copy()
    normals = np.cross(points[tris[:, 1]] - points[tris[:, 0]],
                       points[tris[:, 2]] - points[tris[:, 0]])
    centers = points[tris].mean(axis=1)
    flip = np.einsum("ij,ij->i", normals, centers) < 0
    tris[flip] = tris[flip][:, [0, 2, 1]]
    return tris


def subdivide(points, levels: int):
    """Loop-style bisection of the icosahedral triangulation `levels` times."""
    for _ in range(levels):
        tris = _triangulate(points)
        edges = set()
        for t in tris:
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edges.add((min(a, b), max(a, b)))
        edges = np.array(sorted(edges))
        mid = points[edges[:, 0]] + points[edges[:, 1]]
        mid /= np.linalg.norm(mid, axis=1, keepdims=True)
        points = np.vstack([points, mid])
    return points


def lloyd_relax(points, iterations: int = 4):
    """Spherical Lloyd iterations toward a centroidal Voronoi tessellation."""
    for _ in range(iterations):
        tris = _triangulate(points)
        # triangle circumcenters (dual vertices)
        cc = _circumcenters(points, tris)
        areas = _triangle_areas(points, tris)
        # Voronoi centroid approximated by the kite-area-weighted mean of
        # circumcenters around each generator
        num = np.zeros_like(points)
        den = np.zeros(len(points))
        for j in range(3):
            np.add.at(num, tris[:, j], cc * areas[:, None])
            np.add.at(den, tris[:, j], areas)
        new = num / den[:, None]
        points = new / np.linalg.norm(new, axis=1, keepdims=True)
    return points


def _circumcenters(points, tris):
    a, b, c = points[tris[:, 0]], points[tris[:, 1]], points[tris[:, 2]]
    cc = np.cross(b - a, c - a)
    cc /= np.linalg.norm(cc, axis=1, keepdims=True)
    # orient outward
    flip = np.einsum("ij,ij->i", cc, (a + b + c) / 3.0) < 0
    cc[flip] *= -1.0
    return cc


def _spherical_angle(a, b, c):
    """Angle at vertex a of the spherical triangle abc (unit vectors)."""
    ab = b - np.einsum("...i,...i->...", a, b)[..., None] * a
    ac = c - np.einsum("...i,...i->...", a, c)[..., None] * a
    ab /= np.maximum(np.linalg.norm(ab, axis=-1, keepdims=True), 1e-300)
    ac /= np.maximum(np.linalg.norm(ac, axis=-1, keepdims=True), 1e-300)
    cosang = np.clip(np.einsum("...i,...i->...", ab, ac), -1.0, 1.0)
    return np.arccos(cosang)


def _triangle_areas(points, tris):
    """Spherical excess of each triangle (unit sphere)."""
    a, b, c = points[tris[:, 0]], points[tris[:, 1]], points[tris[:, 2]]
    return (_spherical_angle(a, b, c) + _spherical_angle(b, c, a)
            + _spherical_angle(c, a, b) - np.pi)


def _arc(a, b):
    return np.arccos(np.clip(np.einsum("...i,...i->...", a, b), -1.0, 1.0))


# ---------------------------------------------------------------------------
# mesh assembly
# ---------------------------------------------------------------------------

def generate_mesh(levels: int = 4, lloyd_iterations: int = 4,
                  sphere_radius: float = constants.sphere_radius) -> Mesh:
    """Generate the x1.{10*4^levels+2} quasi-uniform CVT mesh.

    levels=4 -> 2562 cells (the bundled grid), 5 -> 10242, 6 -> 40962,
    7 -> 163842."""
    pts = subdivide(icosahedron_points(), levels)
    if lloyd_iterations:
        pts = lloyd_relax(pts, lloyd_iterations)

    # order cells for horizontal-gather locality: latitude bands, then lon
    lat = np.arcsin(np.clip(pts[:, 2], -1, 1))
    lon = np.mod(np.arctan2(pts[:, 1], pts[:, 0]), 2 * np.pi)
    nbands = max(int(np.sqrt(len(pts) / 2)), 4)
    band = np.clip(((lat + np.pi / 2) / np.pi * nbands).astype(int), 0, nbands - 1)
    order = np.lexsort((lon, band))
    pts = pts[order]

    C = len(pts)
    tris = _triangulate(pts)                  # [T, 3] CCW from outside
    V = len(tris)
    vxyz = _circumcenters(pts, tris)

    # --- edges from triangle adjacency ---
    edge_map = {}
    cellsOnEdge = []
    verticesOnEdge = []
    for t_idx, t in enumerate(tris):
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            key = (min(a, b), max(a, b))
            if key in edge_map:
                e, first_tri = edge_map[key]
                verticesOnEdge[e][1] = t_idx
            else:
                edge_map[key] = (len(cellsOnEdge), t_idx)
                cellsOnEdge.append([a, b])
                verticesOnEdge.append([t_idx, -1])
    E = len(cellsOnEdge)
    cellsOnEdge = np.array(cellsOnEdge, dtype=np.int64)
    verticesOnEdge = np.array(verticesOnEdge, dtype=np.int64)

    # orientation: v1 -> v2 must be 90 deg counterclockwise from c1 -> c2
    # (t_hat = k_hat x n_hat), matching the bundled grid's convention
    c1p, c2p = pts[cellsOnEdge[:, 0]], pts[cellsOnEdge[:, 1]]
    v1p, v2p = vxyz[verticesOnEdge[:, 0]], vxyz[verticesOnEdge[:, 1]]
    emid = c1p + c2p
    emid /= np.linalg.norm(emid, axis=1, keepdims=True)
    cross = np.cross(c2p - c1p, v2p - v1p)
    wrong = np.einsum("ij,ij->i", cross, emid) < 0
    verticesOnEdge[wrong] = verticesOnEdge[wrong][:, ::-1]

    # --- per-cell orderings (CCW) ---
    maxEdges = 6
    nEdgesOnCell = np.zeros(C, dtype=np.int32)
    edgesOnCell = np.zeros((C, maxEdges), dtype=np.int64)
    cell_edges = [[] for _ in range(C)]
    for e in range(E):
        cell_edges[cellsOnEdge[e, 0]].append(e)
        cell_edges[cellsOnEdge[e, 1]].append(e)

    east = np.cross([0.0, 0.0, 1.0], pts)
    east /= np.maximum(np.linalg.norm(east, axis=1, keepdims=True), 1e-12)
    north = np.cross(pts, east)

    for c in range(C):
        es = np.array(cell_edges[c])
        other = np.where(cellsOnEdge[es, 0] == c, cellsOnEdge[es, 1],
                         cellsOnEdge[es, 0])
        d = pts[other] - pts[c]
        ang = np.arctan2(d @ north[c], d @ east[c])
        o = np.argsort(ang)               # CCW ordering
        es = es[o]
        nEdgesOnCell[c] = len(es)
        edgesOnCell[c, :len(es)] = es

    cellsOnCell = np.zeros((C, maxEdges), dtype=np.int64)
    verticesOnCell = np.zeros((C, maxEdges), dtype=np.int64)
    for c in range(C):
        n = nEdgesOnCell[c]
        es = edgesOnCell[c, :n]
        cellsOnCell[c, :n] = np.where(cellsOnEdge[es, 0] == c,
                                      cellsOnEdge[es, 1], cellsOnEdge[es, 0])
        # vertex i of the cell: shared by edges i and i+1 (CCW)
        for i in range(n):
            e1, e2 = es[i], es[(i + 1) % n]
            shared = set(verticesOnEdge[e1]) & set(verticesOnEdge[e2])
            verticesOnCell[c, i] = shared.pop()

    cellsOnVertex = tris.astype(np.int64)             # [V, 3] CCW
    # edgesOnVertex: edge between consecutive cells of the triangle
    edgesOnVertex = np.zeros((V, 3), dtype=np.int64)
    for v in range(V):
        cs = cellsOnVertex[v]
        for i in range(3):
            a, b = cs[i], cs[(i + 1) % 3]
            edgesOnVertex[v, i] = edge_map[(min(a, b), max(a, b))][0]

    # --- geometry ---
    dcEdge = _arc(c1p, c2p)
    dvEdge = _arc(vxyz[verticesOnEdge[:, 0]], vxyz[verticesOnEdge[:, 1]])
    latEdge = np.arcsin(np.clip(emid[:, 2], -1, 1))
    lonEdge = np.mod(np.arctan2(emid[:, 1], emid[:, 0]), 2 * np.pi)
    latV = np.arcsin(np.clip(vxyz[:, 2], -1, 1))
    lonV = np.mod(np.arctan2(vxyz[:, 1], vxyz[:, 0]), 2 * np.pi)

    # angleEdge: azimuth of the edge normal (c1->c2 direction) at the edge
    east_e = np.cross([0.0, 0.0, 1.0], emid)
    east_e /= np.maximum(np.linalg.norm(east_e, axis=1, keepdims=True), 1e-12)
    north_e = np.cross(emid, east_e)
    dce = c2p - c1p
    dce -= np.einsum("ij,ij->i", dce, emid)[:, None] * emid
    angleEdge = np.arctan2(np.einsum("ij,ij->i", dce, north_e),
                           np.einsum("ij,ij->i", dce, east_e))

    areaTriangle = np.zeros(V)
    kiteAreasOnVertex = np.zeros((V, 3))
    for i in range(3):
        # kite of cell i at vertex v: quadrilateral (cell_i, em1, v, em2)
        # computed as two spherical triangles
        ci = pts[cellsOnVertex[:, i]]
        cprev = pts[cellsOnVertex[:, (i + 2) % 3]]
        cnext = pts[cellsOnVertex[:, (i + 1) % 3]]
        m1 = ci + cprev
        m1 /= np.linalg.norm(m1, axis=1, keepdims=True)
        m2 = ci + cnext
        m2 /= np.linalg.norm(m2, axis=1, keepdims=True)
        t1 = np.stack([ci, m2, vxyz], axis=1)
        t2 = np.stack([ci, vxyz, m1], axis=1)

        def excess(t):
            a, b, c_ = t[:, 0], t[:, 1], t[:, 2]
            return (_spherical_angle(a, b, c_) + _spherical_angle(b, c_, a)
                    + _spherical_angle(c_, a, b) - np.pi)
        kiteAreasOnVertex[:, i] = excess(t1) + excess(t2)
    areaTriangle = kiteAreasOnVertex.sum(axis=1)

    areaCell = np.zeros(C)
    np.add.at(areaCell, cellsOnVertex.ravel(), kiteAreasOnVertex.ravel())

    # --- Thuburn tangential weights (Ringler et al 2010 eq 33) ---
    maxEdges2 = 2 * maxEdges
    nEdgesOnEdge = np.zeros(E, dtype=np.int32)
    edgesOnEdge = np.zeros((E, maxEdges2), dtype=np.int64)
    weightsOnEdge = np.zeros((E, maxEdges2))
    # per-cell kite area share of each vertex slot
    kite_for = {}
    for v in range(V):
        for i in range(3):
            kite_for[(int(cellsOnVertex[v, i]), v)] = kiteAreasOnVertex[v, i]

    for e in range(E):
        slot = 0
        for side, c in enumerate(cellsOnEdge[e]):
            n = nEdgesOnCell[c]
            es = edgesOnCell[c, :n]
            j0 = int(np.nonzero(es == e)[0][0])
            R = 0.0
            for j in range(1, n):
                f = int(es[(j0 + j) % n])
                # vertex between previous edge and f (CCW): vertex index
                # (j0 + j - 1) mod n of the cell
                v = int(verticesOnCell[c, (j0 + j - 1) % n])
                R += kite_for[(c, v)] / areaCell[c]
                # orientation factors: +1 if c is cellsOnEdge[0] of the
                # respective edge
                ne_c = 1.0 if cellsOnEdge[e, 0] == c else -1.0
                nf_c = 1.0 if cellsOnEdge[f, 0] == c else -1.0
                w = ne_c * nf_c * (0.5 - R) * dvEdge[f] / dcEdge[e]
                edgesOnEdge[e, slot] = f
                weightsOnEdge[e, slot] = w
                slot += 1
        nEdgesOnEdge[e] = slot

    # --- assemble Mesh (scaled to sphere_radius) ---
    a = sphere_radius
    m = Mesh(nCells=C, nEdges=E, nVertices=V, maxEdges=maxEdges,
             maxEdges2=maxEdges2, vertexDegree=3, sphere_radius=a)
    m.latCell = np.arcsin(np.clip(pts[:, 2], -1, 1))
    m.lonCell = np.mod(np.arctan2(pts[:, 1], pts[:, 0]), 2 * np.pi)
    m.xCell, m.yCell, m.zCell = (pts * a).T
    m.latEdge, m.lonEdge = latEdge, lonEdge
    m.xEdge, m.yEdge, m.zEdge = (emid * a).T
    m.latVertex, m.lonVertex = latV, lonV
    m.xVertex, m.yVertex, m.zVertex = (vxyz * a).T
    m.areaCell = areaCell * a ** 2
    m.areaTriangle = areaTriangle * a ** 2
    m.kiteAreasOnVertex = kiteAreasOnVertex * a ** 2
    m.dvEdge = dvEdge * a
    m.dcEdge = dcEdge * a
    m.angleEdge = angleEdge
    m.meshDensity = np.ones(C)
    m.weightsOnEdge = weightsOnEdge
    m.invAreaCell = 1.0 / m.areaCell
    m.invAreaTriangle = 1.0 / m.areaTriangle
    m.invDvEdge = 1.0 / m.dvEdge
    m.invDcEdge = 1.0 / m.dcEdge
    m.nEdgesOnCell = nEdgesOnCell
    m.nEdgesOnEdge = nEdgesOnEdge
    m.cellsOnCell = cellsOnCell.astype(np.int32)
    m.edgesOnCell = edgesOnCell.astype(np.int32)
    m.verticesOnCell = verticesOnCell.astype(np.int32)
    m.cellsOnEdge = cellsOnEdge.astype(np.int32)
    m.verticesOnEdge = verticesOnEdge.astype(np.int32)
    m.edgesOnEdge = edgesOnEdge.astype(np.int32)
    m.cellsOnVertex = cellsOnVertex.astype(np.int32)
    m.edgesOnVertex = edgesOnVertex.astype(np.int32)
    cols = np.arange(maxEdges)[None, :]
    m.edgesOnCell_mask = (cols < nEdgesOnCell[:, None]).astype(np.float64)
    cols2 = np.arange(maxEdges2)[None, :]
    m.edgesOnEdge_mask = (cols2 < nEdgesOnEdge[:, None]).astype(np.float64)
    _compute_signs(m)
    return m
