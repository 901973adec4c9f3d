"""Gather-based stencil primitives for the unstructured C-grid.

All horizontal indirection in the dycore reduces to a handful of patterns,
expressed scatter-free (every output column *pulls* its inputs) so they
vectorize on the TPU VPU, shard cleanly under shard_map, and fuse under XLA:

  - cell -> edge gathers via cellsOnEdge
  - edge -> cell weighted sums via edgesOnCell (+ sign/mask weights)
  - edge -> vertex sums via edgesOnVertex
  - the <=10-cell advection stencil gather via advCellsForEdge
  - vertical interface/mass interpolation and 3rd/4th-order vertical fluxes
    (flux3/flux4, dynamics_tasks.rg:780-789)

Layout convention (round 3, docs/PERF.md lever 3): every per-column field is
LEVEL-MAJOR — cell fields [K, C], interface fields [K+1, C], edge fields
[K, E], vertex fields [K, V] — so the horizontal entity index lives in the
TPU lane dimension.  Measured on v5e (tools/layout_study*.py):

  - an axis-1 (lane) gather from a narrow [K, C] table costs ~2 ns per
    gathered column vs ~5 ns per row for the [C, K] row gather (whose K=41
    minor axis also pads to 128 lanes in every intermediate);
  - fields sharing an index vector stack along axis 0 ([K1+K2+..., C]) and
    gather TOGETHER: 3 stacked fields cost ~1.15x one field, vs 3x for
    separate gathers (edge pairs x3: 1.48 ms stacked vs 2.41 separate vs
    1.70 packed-row at C=40962, E=122880, K=41);
  - vertical interface patches (.at[k].set) land on the cheap MAJOR axis;
  - the tridiagonal lax.scan runs directly over axis 0 with [C]-wide
    carries — no transposes anywhere in the step.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# horizontal gathers
# ---------------------------------------------------------------------------

def gather(f, idx):
    """Column gather: f [K, N] indexed by idx [R] -> [K, R] (lane gather)."""
    return jnp.take(f, idx, axis=1)


def take_packed(idx, *fields):
    """One lane gather serving several fields that share the index vector.

    fields: arrays [K_i, N] (K_i may differ) stacked along axis 0 into one
    [sum K_i, N] table; a single axis-1 gather costs ~1.15x a one-field
    gather vs len(fields)x for separate gathers (tools/layout_study2.py).

    Only pack fields that change together: packing a loop-invariant field
    (zz, exner within the acoustic loop) with a per-iteration field defeats
    XLA's CSE of the invariant gather across the unrolled loop.

    Returns a list of gathered arrays, each [K_i] + idx.shape."""
    if len(fields) == 1:
        return [jnp.take(fields[0], idx, axis=1)]
    heights = [f.shape[0] for f in fields]
    g = jnp.take(jnp.concatenate(fields, axis=0), idx, axis=1)
    outs, off = [], 0
    for h in heights:
        outs.append(g[off:off + h])
        off += h
    return outs


def edge_pairs(cellsOnEdge, *fields):
    """Packed edge pairs: one stacked lane gather per edge side.

    Returns [(f(cell1), f(cell2)), ...] per field, each side [K_i, E]."""
    g1 = take_packed(cellsOnEdge[:, 0], *fields)
    g2 = take_packed(cellsOnEdge[:, 1], *fields)
    return list(zip(g1, g2))


def edge_pair(f_c, cellsOnEdge):
    """Cell field [K, C] -> (f(cell1), f(cell2)) each [K, E]."""
    return (jnp.take(f_c, cellsOnEdge[:, 0], axis=1),
            jnp.take(f_c, cellsOnEdge[:, 1], axis=1))


def owner_tile(f_c, n_slots: int = 3):
    """Owner-side edge values of a cell field on an ownership-aligned mesh
    (mesh/orient.py: edge_id = slot*C + owner, so cellsOnEdge[e, 0] ==
    e % C): f [K, C] -> [K, n_slots*C] by lane tiling — three full-width
    copies at streaming bandwidth instead of a per-column lane gather."""
    return jnp.concatenate((f_c,) * n_slots, axis=1)


def _aligned(mesh) -> bool:
    return bool(getattr(mesh, "owner_aligned", False))


def edge_pairs_m(mesh, *fields):
    """edge_pairs keyed off the MeshArrays: on an ownership-aligned mesh
    the cell1 side is owner_tile (no gather); only cell2 gathers."""
    if _aligned(mesh):
        g1 = [owner_tile(f) for f in fields]
        g2 = take_packed(mesh.cellsOnEdge[:, 1], *fields)
        return list(zip(g1, g2))
    return edge_pairs(mesh.cellsOnEdge, *fields)


def edge_pair_m(mesh, f_c):
    if _aligned(mesh):
        return owner_tile(f_c), jnp.take(f_c, mesh.cellsOnEdge[:, 1], axis=1)
    return edge_pair(f_c, mesh.cellsOnEdge)


def avg_cell_to_edge(f_c, cellsOnEdge):
    c1, c2 = edge_pair(f_c, cellsOnEdge)
    return 0.5 * (c1 + c2)


def avg_cell_to_edge_m(mesh, f_c):
    c1, c2 = edge_pair_m(mesh, f_c)
    return 0.5 * (c1 + c2)


def diff_cell_to_edge(f_c, cellsOnEdge):
    """f(cell2) - f(cell1): the gradient numerator along the edge normal."""
    c1, c2 = edge_pair(f_c, cellsOnEdge)
    return c2 - c1


def diff_cell_to_edge_m(mesh, f_c):
    c1, c2 = edge_pair_m(mesh, f_c)
    return c2 - c1


def slot_reduce(idx, specs):
    """Weighted neighborhood reduction over the M stencil slots:
        out[i][j][:, r] = sum_m specs[i].weights[j][r, m] * field_i[:, idx[r, m]]

    `idx` [R, M]; specs = list of (field [K_i, N], [w_0 [R, M], w_1, ...]).
    Returns a list (per field) of lists (per weight set) of [K_i, R] arrays.

    All fields stack along axis 0 so each slot costs ONE lane gather from a
    narrow [sum K_i, N] table (~2 ns per gathered column; see module doc).
    Weight sets of the same field share the per-slot gathers."""
    R, M = idx.shape
    fields = [f for f, _ in specs]
    heights = [f.shape[0] for f in fields]
    tbl = fields[0] if len(fields) == 1 else jnp.concatenate(fields, axis=0)
    offs = [0]
    for h in heights:
        offs.append(offs[-1] + h)
    accs = [[None] * len(wl) for _, wl in specs]
    for m in range(M):
        g = jnp.take(tbl, idx[:, m], axis=1)            # [sum K_i, R]
        for i, (_, wl) in enumerate(specs):
            gi = g[offs[i]:offs[i + 1]]
            for j, w in enumerate(wl):
                t = w[:, m][None, :] * gi
                accs[i][j] = t if accs[i][j] is None else accs[i][j] + t
    return accs


_eoc_split_cache: dict = {}


def _eoc_split(mesh):
    """Host-side static split of edgesOnCell into the 3 OWNED slot planes
    and the compacted non-owned slots, for ownership-aligned meshes
    (mesh/orient.py: cell c's owned edges are s*C + c, s in 0..2).

    Returns dict with, per plane s: pos_s [C] (slot index of the plane-s
    owned edge in the row, 0 where absent) and pres_s [C] (1.0/0.0); and
    for the non-owned remainder: sel [C, Mn] (row slot positions),
    idx [C, Mn] (edge ids), pres [C, Mn].  All numpy (statics are host
    numpy by design — docs/PERF.md round-4 finding 1)."""
    eoc = np.asarray(mesh.edgesOnCell)
    key = (hashlib.sha1(eoc.tobytes()).digest(), eoc.shape)
    hit = _eoc_split_cache.get(key)
    if hit is not None:
        return hit
    mask = np.asarray(mesh.edgesOnCell_mask) > 0
    C, M = eoc.shape
    cid = np.arange(C)
    owned = mask & ((eoc % C) == cid[:, None])
    plane = eoc // C                                       # [C, M]
    planes = []
    for s in range(3):
        sel_s = owned & (plane == s)
        pres = sel_s.any(axis=1)
        pos = np.where(pres, sel_s.argmax(axis=1), 0)
        planes.append((pos.astype(np.int64), pres.astype(np.float64)))
    non = mask & ~owned
    Mn = int(non.sum(axis=1).max())
    order = np.argsort(~non, axis=1, kind="stable")        # non-owned first
    sel = order[:, :Mn]
    pres = np.take_along_axis(non, sel, axis=1)
    idx = np.take_along_axis(eoc, sel, axis=1)
    # absent entries point at the row's own first edge (benign; weight 0)
    idx = np.where(pres, idx, eoc[:, :1])
    out = dict(planes=planes, sel=sel.astype(np.int64),
               idx=idx.astype(np.int32), pres=pres.astype(np.float64))
    _eoc_split_cache[key] = out
    return out


def _split_weights(w, split):
    """Per-plane owned weights [3 x [C]] and compacted non-owned weights
    [C, Mn] from a [C, M] weight array (numpy -> free at trace time;
    traced -> tiny take_along_axis ops)."""
    xp = np if isinstance(w, np.ndarray) else jnp
    w_planes = []
    for pos, pres in split["planes"]:
        ws = xp.take_along_axis(w, xp.asarray(pos[:, None]), axis=1)[:, 0]
        w_planes.append(ws * xp.asarray(pres.astype(w.dtype)))
    w_no = (xp.take_along_axis(w, xp.asarray(split["sel"]), axis=1)
            * xp.asarray(split["pres"].astype(w.dtype)))
    return w_planes, w_no


def slot_reduce_m(mesh, idx, specs):
    """slot_reduce with the ownership-aligned fast path when `idx` is the
    edgesOnCell table of an aligned mesh: each cell's 3 OWNED edges are the
    lane slices [:, s*C:(s+1)*C] of the edge table (no gather); only the
    ~3 non-owned slots gather.  Falls back to slot_reduce otherwise."""
    if not (_aligned(mesh) and idx is mesh.edgesOnCell):
        return slot_reduce(idx, specs)
    split = _eoc_split(mesh)
    C = idx.shape[0]
    fields = [f for f, _ in specs]
    heights = [f.shape[0] for f in fields]
    tbl = fields[0] if len(fields) == 1 else jnp.concatenate(fields, axis=0)
    offs = [0]
    for h in heights:
        offs.append(offs[-1] + h)
    accs = [[None] * len(wl) for _, wl in specs]

    def add(i, j, term):
        accs[i][j] = term if accs[i][j] is None else accs[i][j] + term

    w_split = [[_split_weights(w, split) for w in wl] for _, wl in specs]
    # owned planes: pure lane slices of the stacked table
    for s in range(3):
        g = tbl[:, s * C:(s + 1) * C]
        for i, (_, wl) in enumerate(specs):
            gi = g[offs[i]:offs[i + 1]]
            for j in range(len(wl)):
                add(i, j, jnp.asarray(w_split[i][j][0][s])[None, :] * gi)
    # compacted non-owned slots: one gather each
    idx_no = split["idx"]
    for m in range(idx_no.shape[1]):
        g = jnp.take(tbl, idx_no[:, m], axis=1)
        for i, (_, wl) in enumerate(specs):
            gi = g[offs[i]:offs[i + 1]]
            for j in range(len(wl)):
                add(i, j, jnp.asarray(w_split[i][j][1][:, m])[None, :] * gi)
    return accs


def sum_edges_to_cell_m(mesh, f_e, weights):
    ((out,),) = slot_reduce_m(mesh, mesh.edgesOnCell, [(f_e, [weights])])
    return out


def slot_gather(idx, field):
    """Per-slot lane gathers: list of M arrays [K, R] with slot m holding
    field[:, idx[:, m]].  Share these across several weighted reductions of
    the same field (see slot_reduce)."""
    return [jnp.take(field, idx[:, m], axis=1) for m in range(idx.shape[1])]


def dir_second_deriv(dirHess, cellsOnCell, *fields):
    """Directional second derivatives (cell-form advection operator,
    mesh/coefficients.compute_dir_hessian): per field, a list of M arrays
    [K, C] — D_m = dirHess[m, 0]*q + sum_i dirHess[m, 1+i]*q[nbr_i].

    dirHess is stored slot-major [M, 1+M, C] so each weight row is a
    contiguous [C] lane vector; the neighborhood gathers stack all fields
    (one lane gather per neighbor slot)."""
    M = cellsOnCell.shape[1]
    heights = [f.shape[0] for f in fields]
    tbl = fields[0] if len(fields) == 1 else jnp.concatenate(fields, axis=0)
    gs = [jnp.take(tbl, cellsOnCell[:, i], axis=1) for i in range(M)]
    offs = [0]
    for h in heights:
        offs.append(offs[-1] + h)
    outs = []
    for fi, f in enumerate(fields):
        sl = slice(offs[fi], offs[fi + 1])
        D = []
        for m in range(M):
            acc = dirHess[m, 0][None, :] * f
            for i in range(M):
                acc = acc + dirHess[m, 1 + i][None, :] * gs[i][sl]
            D.append(acc)
        outs.append(D)
    return outs


def edge_slot_pair(slots, cellsOnEdge, slotOnCell):
    """Read per-(cell, edge-slot) values at both sides of every edge:
    `slots` is a list of M [K, C] arrays; returns (tbl[c1, slot1],
    tbl[c2, slot2]) each [K, E] via two lane gathers from the [K, M*C]
    concatenation."""
    ((s1, s2),) = edge_slot_pairs(cellsOnEdge, slotOnCell, slots)
    return s1, s2


def edge_slot_pairs(cellsOnEdge, slotOnCell, *slot_lists):
    """Stacked edge_slot_pair over several per-field slot-table lists
    sharing the (cell, slot) index: the M*C-wide gather is the expensive
    lane-gather shape (~10 ns per gathered column vs ~2 ns from a [K, C]
    table — docs/PERF.md), so fields that read the same slots MUST share it.
    Each slot m stacks all fields along the level axis; two wide gathers
    serve every field.  Returns [(f_side1 [K_i, E], f_side2), ...]."""
    C = slot_lists[0][0].shape[1]
    M = len(slot_lists[0])
    heights = [sl[0].shape[0] for sl in slot_lists]
    if len(slot_lists) == 1:
        stacked = slot_lists[0]
    else:
        stacked = [jnp.concatenate([sl[m] for sl in slot_lists], axis=0)
                   for m in range(M)]
    flat = jnp.concatenate(stacked, axis=1)               # [sum K_i, M*C]
    i1 = slotOnCell[:, 0].astype(jnp.int32) * C + cellsOnEdge[:, 0]
    i2 = slotOnCell[:, 1].astype(jnp.int32) * C + cellsOnEdge[:, 1]
    g1 = jnp.take(flat, i1, axis=1)
    g2 = jnp.take(flat, i2, axis=1)
    outs, off = [], 0
    for h in heights:
        outs.append((g1[off:off + h], g2[off:off + h]))
        off += h
    return outs


def cell_tangential(tanWeights, g_slots):
    """Per-cell tangential (Thuburn) matrices: g_slots = slot_gather(
    edgesOnCell, u); tanWeights [M, M, C]; returns list of M arrays [K, C]:
    t_i = sum_j tanW[i, j] * g_j."""
    M = len(g_slots)
    return [sum(tanWeights[i, j][None, :] * g_slots[j] for j in range(M))
            for i in range(M)]


def sum_edges_to_cell(f_e, edgesOnCell, weights):
    """sum_m weights[c, m] * f_e[:, edgesOnCell[c, m]] -> [K, C].

    `weights` [C, M] already folds in sign/mask/length factors."""
    ((out,),) = slot_reduce(edgesOnCell, [(f_e, [weights])])
    return out


def zb_metric(flux_e, edgesOnCell, sign, zb_cell, zb3_cell):
    """Sloping-coordinate metric transport (the zb/zb3 omega correction,
    dynamics_tasks.rg:1503-1538, 1766-1887):
        sum_m sign[c,m] * (zb[m,:,c] + sgn(F) * zb3[m,:,c]) * F[:, eoc[c,m]]
    zb_cell/zb3_cell are slot-major [M, K+1, C]; the per-slot gather of
    flux_e [K+1, E] also feeds its own upwinding sign, so no separate
    sign-field gather is needed."""
    acc = None
    for m in range(edgesOnCell.shape[1]):
        g = jnp.take(flux_e, edgesOnCell[:, m], axis=1)      # [K+1, C]
        zb = zb_cell[m] + jnp.sign(g) * zb3_cell[m]
        t = sign[:, m][None, :] * zb * g
        acc = t if acc is None else acc + t
    return acc


def zb_metric_m(mesh, flux_e, sign, zb_cell, zb3_cell):
    """zb_metric with the ownership-aligned fast path: the 3 owned slots
    are lane slices; zb/zb3/sign slot tables are host-numpy statics, so
    their per-plane re-indexing happens at trace time for free."""
    if not _aligned(mesh):
        return zb_metric(flux_e, mesh.edgesOnCell, sign, zb_cell, zb3_cell)
    split = _eoc_split(mesh)
    C = mesh.edgesOnCell.shape[0]
    cid = np.arange(C)
    zbc = np.asarray(zb_cell)                   # [M, K+1, C] static
    zb3c = np.asarray(zb3_cell)
    sgn = np.asarray(sign)                      # [C, M] static
    acc = None

    def term(g, pos, pres):
        zb_s = np.ascontiguousarray(zbc[pos, :, cid].T)      # [K+1, C]
        zb3_s = np.ascontiguousarray(zb3c[pos, :, cid].T)
        s_s = (sgn[cid, pos] * pres).astype(zbc.dtype)       # [C]
        return s_s[None, :] * (zb_s + jnp.sign(g) * zb3_s) * g

    for s, (pos, pres) in enumerate(split["planes"]):
        t = term(flux_e[:, s * C:(s + 1) * C], pos, pres)
        acc = t if acc is None else acc + t
    idx_no, sel, pres_no = split["idx"], split["sel"], split["pres"]
    for m in range(idx_no.shape[1]):
        g = jnp.take(flux_e, idx_no[:, m], axis=1)
        acc = acc + term(g, sel[:, m], pres_no[:, m])
    return acc


def sum_edges_to_vertex(f_e, edgesOnVertex, weights):
    ((out,),) = slot_reduce(edgesOnVertex, [(f_e, [weights])])
    return out


def sum_vertices_to_edge(f_v, verticesOnEdge):
    return 0.5 * (jnp.take(f_v, verticesOnEdge[:, 0], axis=1)
                  + jnp.take(f_v, verticesOnEdge[:, 1], axis=1))


def edges_on_edge_sum(f_e, edgesOnEdge, weightsOnEdge, mask):
    """Tangential reconstruction: sum_j w[e,j] * f_e[:, edgesOnEdge[e,j]]
    (Thuburn 2009 weights; dynamics_tasks.rg:430-439 with the reference's
    off-by-one loop start corrected to include all nEdgesOnEdge terms)."""
    ((out,),) = slot_reduce(edgesOnEdge, [(f_e, [weightsOnEdge * mask])])
    return out


def adv_flux_on_edge(q_c, flow_sign, adv_cells, adv_coefs, adv_coefs_3rd):
    """Horizontal 3rd/4th-order advective edge value:
    F[k, e] = sum_j (adv_coefs[e,j] + sign(flow[k,e]) * adv_coefs_3rd[e,j]) * q[k, advCells[e,j]]
    `flow_sign` [K, E] is sign(ru) (+-1).  Padding slots carry zero coefs."""
    ((base, third),) = slot_reduce(adv_cells,
                                   [(q_c, [adv_coefs, adv_coefs_3rd])])
    return base + flow_sign * third


def adv_flux_on_edge_cellform(q, flow_sign, mesh, coef3):
    """Cell-form equivalent of adv_flux_on_edge: same 3rd/4th-order edge
    value via per-cell directional Hessians + slot gathers (exact algebraic
    identity; see mesh/coefficients.compute_dir_hessian)."""
    (Dc,) = dir_second_deriv(mesh.dirHess, mesh.cellsOnCell, q)
    D1, D2 = edge_slot_pair(Dc, mesh.cellsOnEdge, mesh.slotOnCell)
    q1, q2 = edge_pair(q, mesh.cellsOnEdge)
    scale = (mesh.dvEdge * mesh.dcEdge ** 2 / 12.0)[None, :]
    return (0.5 * mesh.dvEdge[None, :] * (q1 + q2)
            - scale * ((D1 + D2) + flow_sign * coef3 * (D1 - D2)))


# ---------------------------------------------------------------------------
# vertical operators (K major axis: shifts and patches are cheap
# major-axis slices/updates)
# ---------------------------------------------------------------------------

def interface_interp(f, fzm, fzp):
    """Mass-level field [K, N] -> interface values [K+1, N];
    interior k: fzm[k]*f[k] + fzp[k]*f[k-1]; rows 0 and K are zero."""
    K = f.shape[0]
    interior = fzm[1:K, None] * f[1:] + fzp[1:K, None] * f[:-1]
    zero = jnp.zeros_like(f[:1])
    return jnp.concatenate([zero, interior, zero], axis=0)


def delta(g):
    """Difference along the level axis: g[1:] - g[:-1]."""
    return g[1:] - g[:-1]


def flux4(q_im2, q_im1, q_i, q_ip1, ua):
    """4th-order flux (dynamics_tasks.rg:781-783)."""
    return ua * (7.0 * (q_i + q_im1) - (q_ip1 + q_im2)) / 12.0


def flux3(q_im2, q_im1, q_i, q_ip1, ua, coef3):
    """3rd-order upwind-biased flux (dynamics_tasks.rg:785-789)."""
    return (flux4(q_im2, q_im1, q_i, q_ip1, ua)
            + coef3 * jnp.abs(ua) * ((q_ip1 - q_im2) - 3.0 * (q_i - q_im1)) / 12.0)


def vflux_mass_to_iface(q, m_iface, fzm, fzp, coef3):
    """Vertical flux of a mass-level quantity q [K, N] through interfaces,
    advected by m_iface [K+1, N] (e.g. rw): returns [K+1, N].

    MPAS semantics (theta wdtz / u wduz): 0 at interfaces 0 and K; 2nd-order
    fzm/fzp interpolation at interfaces 1 and K-1; flux3 at 2..K-2."""
    K = q.shape[0]
    out = m_iface * interface_interp(q, fzm, fzp)            # 2nd order everywhere
    if K >= 4:
        ua = m_iface[2:K - 1]                                # interior interfaces
        f3 = flux3(q[0:K - 3], q[1:K - 2], q[2:K - 1], q[3:K], ua, coef3)
        out = out.at[2:K - 1].set(f3)
    return out


def vflux_iface_to_mass(w, rw, coef3):
    """Vertical flux of the interface quantity w [K+1, N] at mass levels,
    advected by rw [K+1, N]: returns [K, N] (the wdwz array,
    dynamics_tasks.rg:1277-1287).

    Mass level j uses advector 0.5*(rw[j] + rw[j+1]); 2nd-order average of w
    at j=0 and j=K-1, flux3 on the 4-point interface stencil in between."""
    K = w.shape[0] - 1
    ua = 0.5 * (rw[:-1] + rw[1:])                            # [K, N]
    out = ua * 0.5 * (w[:-1] + w[1:])                        # 2nd order everywhere
    if K >= 4:
        # flux3 on interior mass levels j = 1 .. K-3 (stencil w[j-1..j+2])
        f3 = flux3(w[0:K - 3], w[1:K - 2], w[2:K - 1], w[3:K],
                   ua[1:K - 2], coef3)
        out = out.at[1:K - 2].set(f3)
    # MPAS zeroes the top mass-level flux (wdwz(nVertLevels+1) = 0)
    out = out.at[K - 1].set(0.0)
    return out
