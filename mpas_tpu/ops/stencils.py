"""Gather-based stencil primitives for the unstructured C-grid.

All horizontal indirection in the dycore reduces to a handful of patterns,
expressed scatter-free (every output row *pulls* its inputs) so they vectorize
on the TPU VPU, shard cleanly under shard_map, and fuse under XLA:

  - cell -> edge gathers via cellsOnEdge
  - edge -> cell weighted sums via edgesOnCell (+ sign/mask weights)
  - edge -> vertex sums via edgesOnVertex
  - the <=10-cell advection stencil gather via advCellsForEdge
  - vertical interface/mass interpolation and 3rd/4th-order vertical fluxes
    (flux3/flux4, dynamics_tasks.rg:780-789)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# horizontal gathers
# ---------------------------------------------------------------------------

def gather(f, idx):
    """Row gather: f [N, ...] indexed by idx [...] -> f[idx]."""
    return jnp.take(f, idx, axis=0)


def take_packed(idx, *fields):
    """One row gather serving several fields that share the index array.

    TPU row gathers are latency-bound per ROW (~5 ns/row measured on v5e,
    flat for row widths up to 128 lanes — tools/layout_study.py), so
    gathering N fields [C, K] with the same idx costs N gathers separately
    but ~1 gather when concatenated along the minor axis.  The concat and
    split are streaming-speed (>600 GB/s) and fuse under XLA.

    Only pack fields that change together: packing a loop-invariant field
    (zz, exner within the acoustic loop) with a per-iteration field defeats
    XLA's CSE of the invariant gather across the unrolled loop.

    fields: arrays [N, K_i] (K_i may differ).  Returns a list of gathered
    arrays, each idx.shape + (K_i,).
    """
    if len(fields) == 1:
        return [jnp.take(fields[0], idx, axis=0)]
    widths = [f.shape[1] for f in fields]
    g = jnp.take(jnp.concatenate(fields, axis=1), idx, axis=0)
    outs, off = [], 0
    for w in widths:
        outs.append(g[..., off:off + w])
        off += w
    return outs


def edge_pairs(cellsOnEdge, *fields):
    """Packed edge_pair: returns [(f(cell1), f(cell2)), ...] per field."""
    gs = take_packed(cellsOnEdge, *fields)
    return [(g[:, 0], g[:, 1]) for g in gs]


def edge_pair(f_c, cellsOnEdge):
    """Cell field [C, K] -> (f(cell1), f(cell2)) each [E, K]."""
    g = jnp.take(f_c, cellsOnEdge, axis=0)      # [E, 2, K]
    return g[:, 0], g[:, 1]


def avg_cell_to_edge(f_c, cellsOnEdge):
    c1, c2 = edge_pair(f_c, cellsOnEdge)
    return 0.5 * (c1 + c2)


def diff_cell_to_edge(f_c, cellsOnEdge):
    """f(cell2) - f(cell1): the gradient numerator along the edge normal."""
    c1, c2 = edge_pair(f_c, cellsOnEdge)
    return c2 - c1


def slot_reduce(idx, specs):
    """Column-form weighted neighborhood reduction:
        out[i][j][r, :] = sum_m specs[i].weights[j][r, m] * field_i[idx[r, m], :]

    `idx` [R, M]; specs = list of (field [N, K_i], [w_0 [R, M], w_1, ...]).
    Returns a list (per field) of lists (per weight set) of [R, K_i] arrays.

    Why not take+einsum: a TPU row gather costs ~5 ns/row regardless of row
    width (the row is one 164-byte random HBM access at K=41), and the
    einsum runs over a [R, M, K->128]-lane-padded temporary.  Gathering
    slot-wise along the minor axis of the TRANSPOSED field costs ~2.2 ns
    /index, intermediates are unpadded [K, R], transposes are free on TPU
    (measured: divergence-style reduce 1.12 -> 0.47 ms, [E,10] advection
    reduce 6.25 -> 3.12 ms at 40962 cells, 41 levels, v5e — docs/PERF.md).
    Weight sets of the same field share the per-slot gathers."""
    R, M = idx.shape
    outs = []
    for f, wlist in specs:
        fT = f.T                                        # [K, N] (free)
        accs = [None] * len(wlist)
        for m in range(M):
            g = jnp.take(fT, idx[:, m], axis=1)         # [K, R]
            for j, w in enumerate(wlist):
                t = w[:, m][None, :] * g
                accs[j] = t if accs[j] is None else accs[j] + t
        outs.append([a.T for a in accs])
    return outs


def slot_gather(idx, field):
    """Per-slot column-form gathers: list of M arrays [K, R] (transposed!)
    with slot m holding field[idx[:, m], :].T.  Share these across several
    weighted reductions of the same field (see slot_reduce's rationale)."""
    fT = field.T
    return [jnp.take(fT, idx[:, m], axis=1) for m in range(idx.shape[1])]


def dir_second_deriv_col(dirHess, cellsOnCell, *fields):
    """Column-form directional second derivatives (see dir_second_deriv):
    per field, a list of M arrays [K, C] — D_m = dirHess[:,m,0]*q
    + sum_i dirHess[:,m,1+i]*q[nbr_i].  The neighborhood gathers are
    slot-wise axis-1 gathers; downstream edge reads use
    edge_slot_pair_col without materializing (or relayouting) [C*M, K]."""
    M = cellsOnCell.shape[1]
    outs = []
    for f in fields:
        fT = f.T
        gs = [jnp.take(fT, cellsOnCell[:, i], axis=1) for i in range(M)]
        D = []
        for m in range(M):
            acc = dirHess[:, m, 0][None, :] * fT
            for i in range(M):
                acc = acc + dirHess[:, m, 1 + i][None, :] * gs[i]
            D.append(acc)
        outs.append(D)
    return outs


def edge_slot_pair_col(slots, cellsOnEdge, slotOnCell):
    """Column-form edge_slot_pair: `slots` is a list of M [K, C] arrays;
    returns (tbl[c1, slot1], tbl[c2, slot2]) each [E, K] via two axis-1
    gathers from the [K, M*C] concatenation (no [C*M, K] relayout)."""
    C = slots[0].shape[1]
    flat = jnp.concatenate(slots, axis=1)                 # [K, M*C]
    i1 = slotOnCell[:, 0].astype(jnp.int32) * C + cellsOnEdge[:, 0]
    i2 = slotOnCell[:, 1].astype(jnp.int32) * C + cellsOnEdge[:, 1]
    return jnp.take(flat, i1, axis=1).T, jnp.take(flat, i2, axis=1).T


def cell_tangential_col(tanWeights, g_slots):
    """Column-form cell_tangential: g_slots = slot_gather(edgesOnCell, u);
    returns list of M arrays [K, C]: t_i = sum_j tanW[:, i, j] * g_j."""
    M = len(g_slots)
    return [sum(tanWeights[:, i, j][None, :] * g_slots[j] for j in range(M))
            for i in range(M)]


def sum_edges_to_cell(f_e, edgesOnCell, weights):
    """sum_i weights[c, i] * f_e[edgesOnCell[c, i]] -> [C, K].

    `weights` [C, M] already folds in sign/mask/length factors."""
    ((out,),) = slot_reduce(edgesOnCell, [(f_e, [weights])])
    return out


def zb_metric(flux_e, edgesOnCell, sign, zb_cell, zb3_cell):
    """Sloping-coordinate metric transport (the zb/zb3 omega correction,
    dynamics_tasks.rg:1503-1538, 1766-1887):
        sum_m sign[c,m] * (zb[c,m,:] + sgn(F) * zb3[c,m,:]) * F[eoc[c,m], :]
    Column-form: the per-slot gather of flux_e also feeds its own upwinding
    sign, so no separate sign-field gather is needed."""
    fT = flux_e.T
    acc = None
    for m in range(edgesOnCell.shape[1]):
        g = jnp.take(fT, edgesOnCell[:, m], axis=1)          # [K+1, C]
        zb = zb_cell[:, m, :].T + jnp.sign(g) * zb3_cell[:, m, :].T
        t = sign[:, m][None, :] * zb * g
        acc = t if acc is None else acc + t
    return acc.T


def sum_edges_to_vertex(f_e, edgesOnVertex, weights):
    ((out,),) = slot_reduce(edgesOnVertex, [(f_e, [weights])])
    return out


def sum_vertices_to_edge(f_v, verticesOnEdge):
    g = jnp.take(f_v, verticesOnEdge, axis=0)   # [E, 2, K]
    return 0.5 * (g[:, 0] + g[:, 1])


def edges_on_edge_sum(f_e, edgesOnEdge, weightsOnEdge, mask):
    """Tangential reconstruction: sum_j w[e,j] * f_e[edgesOnEdge[e,j]]
    (Thuburn 2009 weights; dynamics_tasks.rg:430-439 with the reference's
    off-by-one loop start corrected to include all nEdgesOnEdge terms)."""
    ((out,),) = slot_reduce(edgesOnEdge, [(f_e, [weightsOnEdge * mask])])
    return out


def adv_flux_on_edge(q_c, flow_sign, adv_cells, adv_coefs, adv_coefs_3rd):
    """Horizontal 3rd/4th-order advective edge value:
    F[e, k] = sum_j (adv_coefs[e,j] + sign(flow[e,k]) * adv_coefs_3rd[e,j]) * q[advCells[e,j], k]
    `flow_sign` [E, K] is sign(ru) (+-1).  Padding slots carry zero coefs."""
    ((base, third),) = slot_reduce(adv_cells,
                                   [(q_c, [adv_coefs, adv_coefs_3rd])])
    return base + flow_sign * third


# ---------------------------------------------------------------------------
# cell-form operators (see mesh/coefficients.py compute_dir_hessian /
# compute_tangential_matrix): per-cell einsums + flat slot gathers replacing
# the [E, 10]-row advection and Thuburn gathers
# ---------------------------------------------------------------------------

def dir_second_deriv(dirHess, cellsOnCell, *fields):
    """Directional second derivatives D_f [C, M, K_f] per field: one packed
    [C, M]-row neighborhood gather + a per-cell batched matmul.

    D[c, m] = dirHess[c, m, 0] * q[c] + sum_i dirHess[c, m, 1+i] * q[nbr_i]."""
    gs = take_packed(cellsOnCell, *fields)        # list of [C, M, K_f]
    outs = []
    for f, g in zip(fields, gs):
        nbh = jnp.concatenate([f[:, None, :], g], axis=1)     # [C, 1+M, K]
        outs.append(jnp.einsum("cmp,cpk->cmk", dirHess, nbh))
    return outs


def edge_slot_pair(tbl, cellsOnEdge, slotOnCell):
    """Read a per-(cell, edge-slot) table [C, M, X] at both sides of every
    edge: returns (tbl[c1, slot1], tbl[c2, slot2]), each [E, X].  Two
    single-row flat gathers (2E rows) regardless of the stencil width."""
    C, M = tbl.shape[0], tbl.shape[1]
    flat = tbl.reshape(C * M, *tbl.shape[2:])
    s1 = jnp.take(flat, cellsOnEdge[:, 0] * M + slotOnCell[:, 0], axis=0)
    s2 = jnp.take(flat, cellsOnEdge[:, 1] * M + slotOnCell[:, 1], axis=0)
    return s1, s2


def edge_slot_pairs(cellsOnEdge, slotOnCell, *tables):
    """Packed edge_slot_pair over several [C, M, K_i] tables sharing the
    slot index: concatenates along the minor axis so both sides cost one
    row gather each."""
    if len(tables) == 1:
        return [edge_slot_pair(tables[0], cellsOnEdge, slotOnCell)]
    widths = [t.shape[2] for t in tables]
    s1, s2 = edge_slot_pair(jnp.concatenate(tables, axis=2),
                            cellsOnEdge, slotOnCell)
    outs, off = [], 0
    for w in widths:
        outs.append((s1[..., off:off + w], s2[..., off:off + w]))
        off += w
    return outs


def cell_tangential(tanWeights, u_on_cell_edges):
    """t[c, i] = sum_j tanWeights[c, i, j] * u_e[edgesOnCell[c, j]] given the
    already-gathered per-cell edge values [C, M, K] -> [C, M, K]."""
    return jnp.einsum("cij,cjk->cik", tanWeights, u_on_cell_edges)


def adv_flux_on_edge_cellform(q, flow_sign, mesh, coef3):
    """Cell-form equivalent of adv_flux_on_edge: same 3rd/4th-order edge
    value via per-cell directional Hessians + slot gathers (exact algebraic
    identity; see mesh/coefficients.compute_dir_hessian), column-form."""
    (Dc,) = dir_second_deriv_col(mesh.dirHess, mesh.cellsOnCell, q)
    D1, D2 = edge_slot_pair_col(Dc, mesh.cellsOnEdge, mesh.slotOnCell)
    q1, q2 = edge_pair(q, mesh.cellsOnEdge)
    scale = (mesh.dvEdge * mesh.dcEdge ** 2 / 12.0)[:, None]
    return (0.5 * mesh.dvEdge[:, None] * (q1 + q2)
            - scale * ((D1 + D2) + flow_sign * coef3 * (D1 - D2)))


# ---------------------------------------------------------------------------
# vertical operators (K minor axis)
# ---------------------------------------------------------------------------

def interface_interp(f, fzm, fzp):
    """Mass-level field [N, K] -> interface values [N, K+1];
    interior k: fzm[k]*f[:,k] + fzp[k]*f[:,k-1]; rows 0 and K are zero."""
    K = f.shape[-1]
    interior = fzm[1:K] * f[:, 1:] + fzp[1:K] * f[:, :-1]
    zero = jnp.zeros_like(f[:, :1])
    return jnp.concatenate([zero, interior, zero], axis=-1)


def delta(g):
    """Difference along the minor axis: g[:, 1:] - g[:, :-1]."""
    return g[:, 1:] - g[:, :-1]


def flux4(q_im2, q_im1, q_i, q_ip1, ua):
    """4th-order flux (dynamics_tasks.rg:781-783)."""
    return ua * (7.0 * (q_i + q_im1) - (q_ip1 + q_im2)) / 12.0


def flux3(q_im2, q_im1, q_i, q_ip1, ua, coef3):
    """3rd-order upwind-biased flux (dynamics_tasks.rg:785-789)."""
    return (flux4(q_im2, q_im1, q_i, q_ip1, ua)
            + coef3 * jnp.abs(ua) * ((q_ip1 - q_im2) - 3.0 * (q_i - q_im1)) / 12.0)


def vflux_mass_to_iface(q, m_iface, fzm, fzp, coef3):
    """Vertical flux of a mass-level quantity q [N, K] through interfaces,
    advected by m_iface [N, K+1] (e.g. rw): returns [N, K+1].

    MPAS semantics (theta wdtz / u wduz): 0 at interfaces 0 and K; 2nd-order
    fzm/fzp interpolation at interfaces 1 and K-1; flux3 at 2..K-2."""
    N, K = q.shape
    out = m_iface * interface_interp(q, fzm, fzp)            # 2nd order everywhere
    if K >= 4:
        ua = m_iface[:, 2:K - 1]                             # interior interfaces
        f3 = flux3(q[:, 0:K - 3], q[:, 1:K - 2], q[:, 2:K - 1], q[:, 3:K], ua, coef3)
        out = out.at[:, 2:K - 1].set(f3)
    return out


def vflux_iface_to_mass(w, rw, coef3):
    """Vertical flux of the interface quantity w [N, K+1] at mass levels,
    advected by rw [N, K+1]: returns [N, K] (the wdwz array,
    dynamics_tasks.rg:1277-1287).

    Mass level j uses advector 0.5*(rw[j] + rw[j+1]); 2nd-order average of w
    at j=0 and j=K-1, flux3 on the 4-point interface stencil in between."""
    N, Kp1 = w.shape
    K = Kp1 - 1
    ua = 0.5 * (rw[:, :-1] + rw[:, 1:])                      # [N, K]
    out = ua * 0.5 * (w[:, :-1] + w[:, 1:])                  # 2nd order everywhere
    if K >= 4:
        # flux3 on interior mass levels j = 1 .. K-3 (stencil w[j-1..j+2])
        f3 = flux3(w[:, 0:K - 3], w[:, 1:K - 2], w[:, 2:K - 1], w[:, 3:K],
                   ua[:, 1:K - 2], coef3)
        out = out.at[:, 1:K - 2].set(f3)
    # MPAS zeroes the top mass-level flux (wdwz(nVertLevels+1) = 0)
    out = out.at[:, K - 1].set(0.0)
    return out
