"""Windowed gather-reduce: block-local MXU matmuls replacing lane gathers.

XLA lowers every horizontal stencil gather on TPU as transpose-in / gather /
transpose-out, and the stacked-table packs (stencils.take_packed) each
materialize a concatenate — together the `copy` + gather share of the step
profile (docs/PERF.md).  With the RCM renumbering (mesh/renumber.py) every
128-output block's indices fall in a narrow window W of the source table, so
a weighted M-slot reduction becomes, per block,

    out[:, c] = (tbl[:, ws:ws+W] @ B)[:, c],
    B[j, c]   = sum_m w[c, m] * (j == idx_local[c, m]),

with B built on the VPU from the (static) local indices and (traced) weights
and the window streamed by DMA — no gathers, no layout copies, and the
field "concat" happens inside the per-field window DMAs for free.  The dot
runs at Precision.HIGHEST by default (exact-f32-grade; equivalence to the
gather path at f32 roundoff is asserted in tests/test_windowed.py).

Only meaningful after renumbering: plan_windows() asserts the spans fit.
Status: a STUDY module (round-5 decision, docs/PERF.md "Windowed
gather-reduce study") — on-device measurement found edge-output reductions
lose to the gather path and cell-output reductions win only 1.12x on a
~3% step-time category, and the Mosaic dynamic gather is still
single-vreg-only in jax 0.9, so this lives in tools/ (equivalence-tested
by tests/test_windowed.py, measured by tools/windowed_study.py) rather
than in the production package.  Revisit when Mosaic grows multi-vreg
gather-table support.
"""

from __future__ import annotations

import functools
import hashlib
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
_plan_cache: dict = {}


class WindowPlan:
    """Host-side planning of one index array: per-block window starts
    (128-quantized), the common window width W, and local indices."""

    def __init__(self, idx_np: np.ndarray, block: int = BLOCK):
        idx_np = np.asarray(idx_np)
        if idx_np.ndim == 1:
            idx_np = idx_np[:, None]
        R, M = idx_np.shape
        nb = (R + block - 1) // block
        Rp = nb * block
        pad = Rp - R
        idx_p = np.concatenate([idx_np, idx_np[-1:].repeat(pad, 0)], 0) \
            if pad else idx_np
        ws = (idx_p.reshape(nb, -1).min(axis=1) // 128).astype(np.int32)
        span = (idx_p.reshape(nb, -1).max(axis=1)
                - ws.astype(np.int64) * 128 + 1)
        W = int(np.ceil(span.max() / 128) * 128)
        local = idx_p - np.repeat(ws.astype(np.int64) * 128, block)[:, None]
        assert local.min() >= 0 and local.max() < W
        self.R, self.M, self.nb, self.Rp, self.W = R, M, nb, Rp, W
        self.block = block
        self.ws = ws                                     # [nb] int32
        self.pad = pad
        self.idx_localT = np.ascontiguousarray(
            local.T.astype(np.int32))                    # [M, Rp]
        # table must be padded so ws*128 + W never overruns
        self.min_table_width = int(ws.max()) * 128 + W


def plan_windows(idx_arr, block: int = BLOCK) -> WindowPlan:
    """Cached planner; `idx_arr` may be a jnp constant (static mesh data).

    Keyed by a content digest (not id()): id-keying can silently alias two
    distinct index arrays if the first is garbage-collected and the second
    reuses its address (round-4 advisor finding)."""
    idx_np = np.ascontiguousarray(np.asarray(idx_arr))
    key = (hashlib.sha1(idx_np.tobytes()).digest(), idx_np.shape, block)
    plan = _plan_cache.get(key)
    if plan is None:
        plan = WindowPlan(idx_np, block)
        _plan_cache[key] = plan
    return plan


def _pad_weights(plan: WindowPlan, w):
    """[R, M] (traced ok) -> [M, Rp] f32 with zero padding rows."""
    w = jnp.asarray(w, jnp.float32)
    if w.ndim == 1:
        w = w[:, None]
    if plan.pad:
        w = jnp.concatenate(
            [w, jnp.zeros((plan.pad, w.shape[1]), w.dtype)], axis=0)
    return w.T


def windowed_reduce(plan: WindowPlan, fields: Sequence[Any],
                    weight_sets: Sequence[Any],
                    entries: Sequence[tuple[int, int]],
                    precision=jax.lax.Precision.HIGHEST,
                    interpret: bool = False):
    """out[e][:, r] = sum_m weight_sets[s_e][r, m] * fields[f_e][:, idx[r, m]]
    for each entry e = (f_e, s_e).

    fields: arrays [K_i, N] sharing the planned index array (N can be
    anything >= the index range; each field is window-DMA'd exactly once per
    block).  Entries reading adjacent scratch rows with the same weight set
    coalesce into one MXU dot.  Returns a list of [K_i, R] arrays in entry
    order."""
    M, nb, W = plan.M, plan.nb, plan.W
    S = len(weight_sets)
    n_f = len(fields)

    # unique-field scratch stack, every range 8-aligned
    f_heights = [int(f.shape[0]) for f in fields]
    f_pads = [-h % 8 for h in f_heights]
    f_offs = np.cumsum([0] + [h + p for h, p in zip(f_heights, f_pads)])
    Kin = int(f_offs[-1])

    # output stack: one range per entry, coalescing adjacent same-set entries
    # whose fields are adjacent in the scratch into a single dot
    out_offs, out_heights = [], []
    dots = []                        # (set, scratch_row0, out_row0, rows)
    off = 0
    for f_i, s_i in entries:
        hp = f_heights[f_i] + f_pads[f_i]
        if (dots and dots[-1][0] == s_i
                and dots[-1][1] + dots[-1][3] == f_offs[f_i]
                and dots[-1][2] + dots[-1][3] == off):
            s0, sr, orow, rows = dots[-1]
            dots[-1] = (s0, sr, orow, rows + hp)
        else:
            dots.append((s_i, int(f_offs[f_i]), off, hp))
        out_offs.append(off)
        out_heights.append(f_heights[f_i])
        off += hp
    Kout = off

    idxT = jnp.asarray(plan.idx_localT)
    wT = jnp.concatenate([_pad_weights(plan, w) for w in weight_sets],
                         axis=0)                          # [S*M, Rp]
    ws = jnp.asarray(plan.ws)

    # pad fields: rows to the 8-aligned range (zero rows -> zero outputs),
    # columns so every window slice is in-bounds
    need = plan.min_table_width
    ins = []
    for f, hpad in zip(fields, f_pads):
        f = jnp.asarray(f, jnp.float32)
        n = f.shape[1]
        if n < need or hpad:
            f = jnp.pad(f, ((0, hpad), (0, max(0, need - n))))
        ins.append(f)

    def kernel(ws_ref, idxT_ref, wT_ref, *refs):
        tbl_refs = refs[:n_f]
        out_ref = refs[n_f]
        twin = refs[n_f + 1]
        sems = refs[n_f + 2]
        b = pl.program_id(0)
        start = ws_ref[b] * 128
        cps = []
        for i in range(n_f):
            r0 = int(f_offs[i])
            ke = int(ins[i].shape[0])
            cp = pltpu.make_async_copy(
                tbl_refs[i].at[:, pl.ds(start, W)],
                twin.at[r0:r0 + ke, :], sems.at[i])
            cp.start()
            cps.append(cp)
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
        Bs = [jnp.zeros((W, 128), jnp.float32)] * S
        for m in range(M):
            hit = iota == idxT_ref[m, :][None, :]     # shared across sets
            for s in range(S):
                Bs[s] = Bs[s] + jnp.where(hit, wT_ref[s * M + m, :][None, :],
                                          0.0)
        for cp in cps:
            cp.wait()
        for s_i, sr, orow, rows in dots:
            out_ref[orow:orow + rows, :] = jax.lax.dot_general(
                twin[sr:sr + rows, :], Bs[s_i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((M, BLOCK), lambda b, ws: (0, b)),
                  pl.BlockSpec((S * M, BLOCK), lambda b, ws: (0, b))]
                 + [pl.BlockSpec(memory_space=pl.ANY)] * n_f,
        out_specs=pl.BlockSpec((Kout, BLOCK), lambda b, ws: (0, b)),
        scratch_shapes=[pltpu.VMEM((Kin, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((n_f,))],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kout, plan.Rp), jnp.float32),
        interpret=interpret,
    )(ws, idxT, wT, *ins)

    return [out[o:o + h, :plan.R] for o, h in zip(out_offs, out_heights)]


def slot_reduce_windowed(idx_arr, specs, interpret: bool = False):
    """Drop-in for stencils.slot_reduce via windowed_reduce.

    specs: [(field [K_i, N], [w_0 [R, M], ...]), ...]; returns the same
    nested list structure of [K_i, R] arrays."""
    plan = plan_windows(idx_arr)
    fields, weight_sets, entries, shape = [], [], [], []
    set_ids: dict = {}          # dedupe shared weight arrays -> shared B
    for f, wl in specs:
        fi = len(fields)
        fields.append(f)
        row = []
        for w in wl:
            si = set_ids.get(id(w))
            if si is None:
                si = len(weight_sets)
                weight_sets.append(w)
                set_ids[id(w)] = si
            entries.append((fi, si))
            row.append(len(entries) - 1)
        shape.append(row)
    flat = windowed_reduce(plan, fields, weight_sets, entries,
                           interpret=interpret)
    return [[flat[e] for e in row] for row in shape]


def edge_pairs_windowed(cellsOnEdge, *fields, interpret: bool = False):
    """Drop-in for stencils.edge_pairs: per field, (f(cell1), f(cell2)) each
    read through a windowed one-hot dot (weight sets = the two edge sides,
    applied to the full field stack in two dots)."""
    plan = plan_windows(cellsOnEdge)        # [E, 2] -> M=2
    R = plan.R
    ones = _pair_ones(R)
    # side s uses slot s: weight set s = one-hot on slot s
    entries = [(f, s) for s in (0, 1) for f in range(len(fields))]
    flat = windowed_reduce(plan, list(fields), [ones[0], ones[1]], entries,
                           interpret=interpret)
    n = len(fields)
    return [(flat[f], flat[n + f]) for f in range(n)]


@functools.lru_cache(maxsize=8)
def _pair_ones(R: int):
    w0 = np.zeros((R, 2), np.float32)
    w0[:, 0] = 1.0
    w1 = np.zeros((R, 2), np.float32)
    w1[:, 1] = 1.0
    return jnp.asarray(w0), jnp.asarray(w1)
