"""Device-side halo exchange over the JAX device mesh.

One exchange = gather the send buffers (precomputed local index tables),
one lax.all_to_all over the 'dom' mesh axis, and a gather-based reassembly
(scatter-free: each local slot pulls its refreshed value from the receive
buffer).  This is the TPU-native equivalent of Legion's ghost-region
coherence (SURVEY.md section 2.8): the communication topology is computed
once host-side (parallel/partition.py) and the runtime exchange is a single
XLA collective that rides ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ExchangeRound:
    """One neighbor-only ppermute round (see partition._build_exchange):
    every shard sends to <=1 peer and receives from <=1 peer."""
    perm: Any = struct.field(pytree_node=False)  # tuple[(src, dst), ...]
    send_idx: Any = None    # [m] this shard's send rows (0-padded)
    send_mask: Any = None   # [m]
    recv_slot: Any = None   # [m] local slot to write; >=L rows are dropped


@struct.dataclass
class ExchangeArrays:
    """Device-side exchange plan for one entity type (per-shard block)."""
    send_idx: Any     # [S, max_send] int32 (this shard's sends to each peer)
    send_mask: Any    # [S, max_send]
    recv_pos: Any     # [L] int32
    recv_is_halo: Any  # [L]
    # neighbor-only schedule; when non-empty the ppermute path is used
    rounds: Any = struct.field(pytree_node=True, default=())


@struct.dataclass
class HaloTables:
    cell: ExchangeArrays
    edge: ExchangeArrays
    vertex: ExchangeArrays


class HaloExchange:
    """Bound to a shard inside shard_map; refreshes halo slots from owners.

    `n_rings` is the halo depth the partition was built with
    (partition.HALO_RINGS); the solver uses it to decide when redundant
    ring compute can replace intra-loop exchanges (dynamics/srk3.py)."""

    def __init__(self, tables: HaloTables, axis_name: str = "dom",
                 n_rings: int = 3):
        self.t = tables
        self.axis = axis_name
        self.n_rings = n_rings

    def _exchange(self, x, tbl: ExchangeArrays):
        """Fields are level-major [K, L] (core/state.py): the entity axis is
        the LAST axis, so sends/reassembly are lane gathers/updates."""
        vec = x.ndim > 1
        xb = x if vec else x[None, :]
        if len(tbl.rounds):
            out = self._exchange_ppermute(xb, tbl)
        else:
            out = self._exchange_all_to_all(xb, tbl)
        return out if vec else out[0]

    def _exchange_all_to_all(self, xb, tbl: ExchangeArrays):
        K = xb.shape[0]
        send = jnp.take(xb, tbl.send_idx.reshape(-1), axis=1)
        send = send.reshape((K,) + tbl.send_idx.shape)                # [K, S, m]
        send = send * tbl.send_mask[None]
        recv = jax.lax.all_to_all(send, self.axis, split_axis=1, concat_axis=1,
                                  tiled=False)
        # all_to_all split/concat on the shard axis: recv[:, d] = what shard
        # d sent us
        recv_flat = recv.reshape(K, -1)                               # [K, S*m]
        new_vals = jnp.take(recv_flat, tbl.recv_pos, axis=1)          # [K, L]
        return jnp.where(tbl.recv_is_halo[None, :] > 0, new_vals, xb)

    def _exchange_ppermute(self, xb, tbl: ExchangeArrays):
        """Neighbor-only exchange: one lax.ppermute per schedule round, each
        sized to that round's largest pair (no all-pairs padding).  Padding
        slots carry recv_slot >= L and are dropped by the scatter."""
        out = xb
        for rnd in tbl.rounds:
            send = jnp.take(xb, rnd.send_idx, axis=1) * rnd.send_mask[None, :]
            recv = jax.lax.ppermute(send, self.axis, perm=rnd.perm)
            out = out.at[:, rnd.recv_slot].set(recv, mode="drop")
        return out

    def _exchange_packed(self, fields, tbl: ExchangeArrays):
        """ONE collective per refresh: all fields sharing an entity type
        stack along the level axis into a single [sum K_i, L] buffer (the
        same take_packed trick as ops/stencils — docs/PERF.md), so a
        refresh_state costs 2 exchanges (cell + edge) instead of 10 and the
        per-collective ICI latency is paid once."""
        if len(fields) == 1:
            return (self._exchange(fields[0], tbl),)
        blocks = [f if f.ndim > 1 else f[None, :] for f in fields]
        heights = [b.shape[0] for b in blocks]
        out = self._exchange(jnp.concatenate(blocks, axis=0), tbl)
        outs, off = [], 0
        for f, h in zip(fields, heights):
            o = out[off:off + h]
            outs.append(o if f.ndim > 1 else o[0])
            off += h
        return tuple(outs)

    def cell(self, *fields):
        out = self._exchange_packed(fields, self.t.cell)
        return out if len(out) > 1 else out[0]

    def edge(self, *fields):
        out = self._exchange_packed(fields, self.t.edge)
        return out if len(out) > 1 else out[0]

    def vertex(self, *fields):
        out = self._exchange_packed(fields, self.t.vertex)
        return out if len(out) > 1 else out[0]

    # ---- solver-level bundles ----

    def refresh_state(self, state):
        """Refresh all prognostic + physics-coupling halos (stage start)."""
        w, theta_m, rho_zz, rho_p, rtheta_p, exner, pressure_p, rw = self.cell(
            state.w, state.theta_m, state.rho_zz, state.rho_p, state.rtheta_p,
            state.exner, state.pressure_p, state.rw)
        u, ru = self.edge(state.u, state.ru)
        return state.replace(w=w, theta_m=theta_m, rho_zz=rho_zz, rho_p=rho_p,
                             rtheta_p=rtheta_p, exner=exner,
                             pressure_p=pressure_p, rw=rw, u=u, ru=ru)

    def refresh_acoustic(self, ac):
        """Refresh acoustic perturbation halos (once per substep)."""
        rho_pp, rtheta_pp, rtheta_pp_old, rw_p = self.cell(
            ac.rho_pp, ac.rtheta_pp, ac.rtheta_pp_old, ac.rw_p)
        ru_p = self.edge(ac.ru_p)
        return ac.replace(rho_pp=rho_pp, rtheta_pp=rtheta_pp,
                          rtheta_pp_old=rtheta_pp_old, rw_p=rw_p, ru_p=ru_p)

    def refresh_tend(self, tend):
        """Refresh the large-step tendencies once per RK stage (2 packed
        collectives).  With tendencies valid over the FULL halo, the acoustic
        loop needs NO exchanges at all when n_rings > number_sub_steps: each
        substep consumes one ring of acoustic-perturbation validity and the
        post-loop recovery one more, so owned outputs stay exact while the
        outer-ring garbage is healed by the next stage-top refresh_state.
        This moves every collective out of the latency-critical loop
        (BASELINE north star; the reference relies on Legion task-graph
        overlap here, mesh_loading.rg:399-483)."""
        tend_w, tend_theta, tend_rho = self.cell(
            tend.tend_w, tend.tend_theta, tend.tend_rho)
        tend_u = self.edge(tend.tend_u)
        return tend.replace(tend_u=tend_u, tend_w=tend_w,
                            tend_theta=tend_theta, tend_rho=tend_rho)
