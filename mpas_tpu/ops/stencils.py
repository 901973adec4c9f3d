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

import jax
import jax.numpy as jnp


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


def avg_cell_to_edge(f_c, cellsOnEdge):
    c1, c2 = edge_pair(f_c, cellsOnEdge)
    return 0.5 * (c1 + c2)


def diff_cell_to_edge(f_c, cellsOnEdge):
    """f(cell2) - f(cell1): the gradient numerator along the edge normal."""
    c1, c2 = edge_pair(f_c, cellsOnEdge)
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
