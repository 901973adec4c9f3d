"""Sharded model assembly: global arrays -> per-shard local blocks ->
shard_map'd SRK3 step over a jax.sharding.Mesh.

The horizontal domain is the sharded axis ('dom'); the vertical stays
on-chip (SURVEY.md section 2.7).  Each shard holds its owned entities plus a
3-ring halo; the same ops/ kernels run unmodified on the local arrays, with
halos refreshed by parallel/halo.py at the exchange points wired into
dynamics/srk3.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core import state as core_state
from . import partition as part_mod
from .halo import ExchangeArrays, HaloExchange, HaloTables
from ..dynamics import srk3


def _put_global(x, sharding):
    """Place a host-replicated numpy array as a (possibly multi-host) global
    jax.Array with the given sharding."""
    x = np.asarray(x)
    if jax.process_count() > 1:
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.device_put(jnp.asarray(x), sharding)


# field -> (entity of its first axis, remap target for index arrays or None)
_MESH_FIELDS = {
    "cellsOnEdge": ("edge", "cell"), "verticesOnEdge": ("edge", "vertex"),
    "edgesOnCell": ("cell", "edge"), "cellsOnCell": ("cell", "cell"),
    "verticesOnCell": ("cell", "vertex"),
    "edgesOnCell_mask": ("cell", None), "edgesOnCellSign": ("cell", None),
    "cellsOnVertex": ("vertex", "cell"), "edgesOnVertex": ("vertex", "edge"),
    "edgesOnVertexSign": ("vertex", None),
    "edgesOnEdge": ("edge", "edge"), "edgesOnEdge_mask": ("edge", None),
    "weightsOnEdge": ("edge", None),
    "kiteForCell": ("cell", None), "kiteAreasOnVertex": ("vertex", None),
    "latCell": ("cell", None), "lonCell": ("cell", None),
    "latEdge": ("edge", None), "lonEdge": ("edge", None),
    "angleEdge": ("edge", None), "dvEdge": ("edge", None),
    "dcEdge": ("edge", None), "invDvEdge": ("edge", None),
    "invDcEdge": ("edge", None), "areaCell": ("cell", None),
    "invAreaCell": ("cell", None), "invAreaTriangle": ("vertex", None),
    "meshScalingDel2": ("edge", None), "meshScalingDel4": ("edge", None),
    "meshScalingRegionalCell": ("cell", None),
    "meshScalingRegionalEdge": ("edge", None),
    "bdyMaskCell": ("cell", None), "bdyMaskEdge": ("edge", None),
    "advCellsForEdge": ("edge", "cell"), "advMaskForEdge": ("edge", None),
    "adv_coefs": ("edge", None), "adv_coefs_3rd": ("edge", None),
    "dirHess": ("cell", None), "tanWeights": ("cell", None),
    "slotOnCell": ("edge", None),
    "coeffs_reconstruct": ("cell", None), "defc_a": ("cell", None),
    "defc_b": ("cell", None), "fEdge": ("edge", None), "fVertex": ("vertex", None),
}

_STATIC_ENTITY = {
    "zgrid": "cell", "zz": "cell", "dss": "cell", "zxu": "edge",
    "zb_cell": "cell", "zb3_cell": "cell", "rho_base": "cell",
    "theta_base": "cell", "rtheta_base": "cell", "exner_base": "cell",
    "pressure_base": "cell", "t_init": "cell",
}


def _state_entity(name: str, C: int, E: int, V: int, arr) -> str:
    n = arr.shape[-1]          # level-major layout: entity axis is LAST
    if n == C:
        return "cell"
    if n == E:
        return "edge"
    if n == V:
        return "vertex"
    raise ValueError(f"cannot classify state field {name} with trailing dim {n}")


@dataclasses.dataclass
class ShardedModel:
    n_shards: int
    partition: part_mod.ShardedPartition
    jax_mesh: JaxMesh
    mesh_arrays: Any      # MeshArrays with leading [S] axis, sharded
    static: Any           # StaticState with leading [S] axis
    vert: Any             # replicated VerticalArrays
    tables: Any           # HaloTables with leading [S] axis
    state: Any            # State with leading [S] axis
    namelist: Any
    step_fn: Any = None
    summarize_fn: Any = None
    radiation_fn: Any = None
    step_count: int = 0

    def step(self, n: int = 1):
        for _ in range(n):
            self.state = self.step_fn(self.state)
            self.step_count += 1
        return self.state

    @property
    def dtype(self):
        return self.state.theta_m.dtype

    def apply_physics(self, phys, julian: float | None = None):
        """Sharded physics coupling: the jitted columnar radiation runs
        inside a shard_map over 'dom' (embarrassingly parallel, zero
        collectives) and writes rt_diabatic_tend — physics is no longer
        gated to single-device runs (atmphys_driver.rg:23-62)."""
        from ..physics.driver import time_params
        if julian is None:
            julian = self.step_count * self.namelist.config_dt / 86400.0
        if self.radiation_fn is None:
            raise RuntimeError("call enable_physics(phys) first")
        tp = time_params(phys, julian, self.dtype)
        rthraten = self.radiation_fn(self.state, tp)
        self.state = self.state.replace(
            rt_diabatic_tend=rthraten.astype(self.dtype))

    def enable_physics(self, phys):
        if self.radiation_fn is None:
            self.radiation_fn = make_sharded_radiation(self, phys)

    def gather_state(self, model_mesh) -> dict:
        """Collect owned entries back into global arrays (host-side).

        Multi-host runs first allgather every process's addressable shard
        blocks over DCN (jax.experimental.multihost_utils), so every process
        returns the same full global arrays — the path history/restart
        output takes on a real pod slice (verified cross-process in
        tools/multihost_demo.py)."""
        state = self.state
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            state = jax.tree.map(
                lambda x: multihost_utils.process_allgather(x, tiled=True),
                state)
        p = self.partition
        out = {}
        C, E, V = model_mesh.nCells, model_mesh.nEdges, model_mesh.nVertices
        for f in dataclasses.fields(state):
            x = getattr(state, f.name)
            if x is None:
                out[f.name] = None
                continue
            x = np.asarray(x)
            L = x.shape[-1]                  # entity axis is last
            if L == p.cell_l2g.shape[1]:
                l2g, om, N = p.cell_l2g, p.cell_owned_mask, C
            elif L == p.edge_l2g.shape[1]:
                l2g, om, N = p.edge_l2g, p.edge_owned_mask, E
            elif L == p.vertex_l2g.shape[1]:
                l2g, om, N = p.vertex_l2g, p.vertex_owned_mask, V
            else:
                out[f.name] = None
                continue
            g = np.zeros(x.shape[1:-1] + (N,), x.dtype)
            for s in range(p.n_shards):
                sel = om[s] > 0
                g[..., l2g[s][sel]] = x[s][..., sel]
            out[f.name] = g
        return out


def shard_model(model, n_shards: int, metis_path: str | None = None,
                devices=None) -> ShardedModel:
    """Build a ShardedModel from a (single-device) Model."""
    mesh = model.mesh
    nl = model.namelist
    dtype = model.state.theta_m.dtype
    p = part_mod.build_partition(mesh, n_shards, metis_path=metis_path)
    S = n_shards
    C, E, V = mesh.nCells, mesh.nEdges, mesh.nVertices

    l2g = {"cell": p.cell_l2g, "edge": p.edge_l2g, "vertex": p.vertex_l2g}
    g2l = {"cell": p.cell_g2l, "edge": p.edge_g2l, "vertex": p.vertex_g2l}

    def shard_field(arr, entity, remap_to=None, axis=0):
        """Per-shard blocks: mesh adjacency keeps the entity on axis 0;
        state/static fields are level-major with the entity LAST (axis=-1),
        yielding [S, ..., L] blocks."""
        arr = np.asarray(arr)
        if axis == 0:
            out = arr[l2g[entity]]                   # [S, L, ...]
        else:
            out = np.moveaxis(np.take(arr, l2g[entity], axis=-1), -2, 0)
        if remap_to is not None:
            res = np.empty_like(out)
            for s in range(S):
                res[s] = part_mod.remap(g2l[remap_to][s], out[s])
            out = res
        return out

    # ---- mesh arrays (slot-major coefficient tables carry the entity on
    # their LAST axis; adjacency/weights keep it on axis 0) ----
    _LAST_AXIS_MESH = {"dirHess", "tanWeights"}
    marr_np = {}
    for name, (entity, remap_to) in _MESH_FIELDS.items():
        ax = -1 if name in _LAST_AXIS_MESH else 0
        marr_np[name] = shard_field(np.asarray(getattr(model.mesh_arrays, name)),
                                    entity, remap_to, axis=ax)
    # ---- static state (level-major: entity axis is last) ----
    static_np = {name: shard_field(np.asarray(getattr(model.static, name)),
                                   ent, axis=-1)
                 for name, ent in _STATIC_ENTITY.items()}
    # ---- prognostic state ----
    state_np = {}
    for f in dataclasses.fields(model.state):
        x = getattr(model.state, f.name)
        if x is None:
            state_np[f.name] = None
            continue
        ent = _state_entity(f.name, C, E, V, x)
        state_np[f.name] = shard_field(np.asarray(x), ent, axis=-1)

    # ---- halo tables ----
    def table_np(xt):
        return dict(send_idx=xt.send_idx, send_mask=xt.send_mask,
                    recv_pos=xt.recv_pos, recv_is_halo=xt.recv_is_halo)

    if devices is None:
        devices = jax.devices()[:S]
    if len(devices) < S:
        raise ValueError(
            f"shard_model({S}) needs {S} devices but only {len(devices)} are "
            f"visible ({jax.devices()[0].platform}); for CPU testing set "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={S}")
    jmesh = JaxMesh(np.array(devices), ("dom",))
    sh = NamedSharding(jmesh, P("dom"))
    rep = NamedSharding(jmesh, P())
    multihost = jax.process_count() > 1

    def put(x, float_ok=True):
        x = np.asarray(x)
        if x.dtype in (np.float64, np.float32):
            x = x.astype(dtype)
        if multihost:
            # every process holds the same full host-side array (the mesh
            # preprocessing is deterministic and replicated); each provides
            # the blocks belonging to its addressable devices
            # (Parallelization in Regent.md:150-173 — the Legion multi-node
            # distribution slot)
            return jax.make_array_from_callback(x.shape, sh,
                                                lambda idx: x[idx])
        return jax.device_put(jnp.asarray(x), sh)

    # owner_aligned never holds for the per-shard LOCAL numbering (the
    # global slot-major invariant does not survive the local remap), so the
    # sharded step always takes the gather path for cell1 reads
    marr = core_state.MeshArrays(**{k: put(v) for k, v in marr_np.items()},
                                 owner_aligned=False)
    static = core_state.StaticState(**{k: put(v) for k, v in static_np.items()})
    state = core_state.State(**{k: (None if v is None else put(v))
                                for k, v in state_np.items()})
    if multihost:
        vert = jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), rep, lambda idx, _x=x: np.asarray(_x)[idx]),
            model.vert)
    else:
        vert = jax.tree.map(lambda x: jax.device_put(x, rep), model.vert)

    def make_rounds(xt):
        """Device-side neighbor-only ppermute schedule (halo.ExchangeRound)."""
        if getattr(nl, "config_halo_exchange", "ppermute") != "ppermute":
            return ()
        from .halo import ExchangeRound
        return tuple(
            ExchangeRound(perm=r["perm"], send_idx=put(r["send_idx"]),
                          send_mask=put(r["send_mask"]),
                          recv_slot=put(r["recv_slot"]))
            for r in (xt.rounds or []))

    tables = HaloTables(
        cell=ExchangeArrays(**{k: put(v) for k, v in table_np(p.cell_x).items()},
                            rounds=make_rounds(p.cell_x)),
        edge=ExchangeArrays(**{k: put(v) for k, v in table_np(p.edge_x).items()},
                            rounds=make_rounds(p.edge_x)),
        vertex=ExchangeArrays(**{k: put(v) for k, v in table_np(p.vertex_x).items()},
                              rounds=make_rounds(p.vertex_x)),
    )

    sm = ShardedModel(n_shards=S, partition=p, jax_mesh=jmesh,
                      mesh_arrays=marr, static=static, vert=vert,
                      tables=tables, state=state, namelist=nl)
    sm.step_fn = make_sharded_step(sm, dt=nl.config_dt)
    sm.summarize_fn = make_sharded_summarize(sm)
    return sm


def _sharded_step_jit(nl, dt: float, jax_mesh):
    """The jitted shard_map'd SRK3 step over `jax_mesh`, taking every operand
    as an argument (multi-host arrays spanning non-addressable devices cannot
    be closed over; and argument form enables deviceless topology AOT)."""
    sq = lambda t: jax.tree.map(lambda x: x[0], t)
    ex = lambda t: jax.tree.map(lambda x: x[None], t)

    def local_step(marr, static, vert, tables, state):
        halo = HaloExchange(sq(tables))
        out = srk3.atm_srk3(sq(state), sq(static), sq(marr), vert, nl, dt,
                            halo=halo)
        return ex(out)

    mapped = jax.shard_map(
        local_step, mesh=jax_mesh,
        in_specs=(P("dom"), P("dom"), P(), P("dom"), P("dom")),
        out_specs=P("dom"))
    return jax.jit(mapped)


def make_sharded_step(sm: ShardedModel, dt: float):
    step_jit = _sharded_step_jit(sm.namelist, dt, sm.jax_mesh)

    def step(state):
        return step_jit(sm.mesh_arrays, sm.static, sm.vert, sm.tables, state)

    return step


def aot_lower_sharded_step(sm: ShardedModel, topo_devices, dt: float | None = None):
    """Deviceless AOT compile of the sharded step for an abstract TPU
    topology (jax.experimental.topologies) — the honest substitute for
    unavailable multi-chip hardware: the returned Compiled object's
    `.as_text()` is the real XLA:TPU post-scheduling module, so the
    latency-hiding placement of the halo collectives (collective-permute-
    start ... independent compute ... collective-permute-done) can be
    inspected and asserted without owning N chips.  `sm` supplies shapes and
    static exchange metadata only (build it on CPU virtual devices)."""
    nl = sm.namelist
    dt = nl.config_dt if dt is None else dt
    tmesh = JaxMesh(np.asarray(topo_devices).reshape(sm.n_shards), ("dom",))
    sh = NamedSharding(tmesh, P("dom"))
    rep = NamedSharding(tmesh, P())

    def sds(tree, sharding):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                           sharding=sharding), tree)

    step_jit = _sharded_step_jit(nl, dt, tmesh)
    args = (sds(sm.mesh_arrays, sh), sds(sm.static, sh), sds(sm.vert, rep),
            sds(sm.tables, sh), sds(sm.state, sh))
    return step_jit.lower(*args).compile()


def make_sharded_radiation(sm: ShardedModel, phys):
    """Jitted sharded radiation: shard_map of the columnar radctl chain
    (physics/driver.radiation_columns) over the 'dom' axis.  Halo columns
    are computed redundantly, exactly like the dycore stencils, so no
    exchange is needed.  Returns radiation(state, tp) -> rthraten [S, L, K]."""
    from ..physics.driver import _device_tables, radiation_columns
    dtype = sm.state.theta_m.dtype
    rep = NamedSharding(sm.jax_mesh, P())
    phys_j = {k: (_put_global(v, rep) if hasattr(v, "shape") else v)
              for k, v in _device_tables(phys, dtype).items()}
    sq = lambda t: jax.tree.map(lambda x: x[0], t)

    def local(marr, static, vert, state, phys_d, tp):
        m, st, sta = sq(marr), sq(state), sq(static)
        pressure = sta.pressure_base + st.pressure_p         # [K, L]
        sp = (vert.cf1 * pressure[0] + vert.cf2 * pressure[1]
              + vert.cf3 * pressure[2])
        # columnar radiation keeps the CAM [cols, pver] convention
        qv = st.scalars[0].T if st.scalars is not None else None
        qc = (st.scalars[1].T if st.scalars is not None
              and st.scalars.shape[0] > 1 else None)
        rthraten, _ = radiation_columns(phys_d, m.latCell, m.lonCell,
                                        st.theta_m.T, st.exner.T, pressure.T,
                                        sp, qv, qc, tp)
        return rthraten.T[None]

    mapped = jax.shard_map(local, mesh=sm.jax_mesh,
                           in_specs=(P("dom"), P("dom"), P(), P("dom"), P(),
                                     P()),
                           out_specs=P("dom"))
    radiation_jit = jax.jit(mapped)

    def radiation(state, tp):
        return radiation_jit(sm.mesh_arrays, sm.static, sm.vert, state,
                             phys_j, tp)

    return radiation


def make_sharded_summarize(sm: ShardedModel):
    """Jitted in-program global diagnostics: owned-entity masking + pmin/pmax
    /psum over the 'dom' mesh axis — the TPU-native replacement for the
    reference's stubbed mpas_dmpar_* MPI reductions (rk_timestep.rg:207-210,
    309-311).  Returns summarize(state) -> dict of replicated scalars."""
    dtype = sm.state.theta_m.dtype
    p = sm.partition
    sh = NamedSharding(sm.jax_mesh, P("dom"))
    cm = _put_global(np.asarray(p.cell_owned_mask) > 0, sh)
    em = _put_global(np.asarray(p.edge_owned_mask) > 0, sh)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    def local(cm_, em_, state):
        cmask, emask = cm_[0][None, :], em_[0][None, :]
        st = jax.tree.map(lambda x: x[0], state)
        # masked extrema; NaNs tracked separately so the where() masking
        # cannot hide them
        def mm(x, mask):
            lo = jnp.min(jnp.where(mask, x, big))
            hi = jnp.max(jnp.where(mask, x, -big))
            return (jax.lax.pmin(lo, "dom"), jax.lax.pmax(hi, "dom"))
        w_min, w_max = mm(st.w, cmask)
        u_min, u_max = mm(st.u, emask)
        th_min, th_max = mm(st.theta_m, cmask)
        wsp = jnp.sqrt(st.u ** 2 + st.v ** 2)
        wsp_max = jax.lax.pmax(jnp.max(jnp.where(emask, wsp, -big)), "dom")
        nan_local = (jnp.any(jnp.isnan(jnp.where(cmask, st.w, 0.0)))
                     | jnp.any(jnp.isnan(jnp.where(emask, st.u, 0.0))))
        nan_count = jax.lax.psum(nan_local.astype(jnp.int32), "dom")
        return dict(w_min=w_min, w_max=w_max, u_min=u_min, u_max=u_max,
                    wsp_max=wsp_max, theta_min=th_min, theta_max=th_max,
                    nan_detected=nan_count > 0)

    mapped = jax.shard_map(local, mesh=sm.jax_mesh,
                           in_specs=(P("dom"), P("dom"), P("dom")),
                           out_specs=P())
    summarize_jit = jax.jit(mapped)

    def summarize(state):
        return summarize_jit(cm, em, state)

    return summarize


def sharded_summarize(sm: ShardedModel):
    """Global min/max/NaN diagnostics of the current sharded state via the
    jitted in-program reduction (make_sharded_summarize)."""
    if sm.summarize_fn is None:
        sm.summarize_fn = make_sharded_summarize(sm)
    out = sm.summarize_fn(sm.state)
    return {k: (bool(v) if k == "nan_detected" else float(v))
            for k, v in out.items()}


def host_summarize_oracle(sm: ShardedModel):
    """Host-numpy reference for the jitted reduction (test oracle only)."""
    p = sm.partition
    cm = np.asarray(p.cell_owned_mask) > 0
    em = np.asarray(p.edge_owned_mask) > 0
    # fields are [S, K, L]; swap to [S, L, K] so the [S, L] owned masks
    # select whole columns
    w = np.swapaxes(np.asarray(sm.state.w), 1, 2)
    u = np.swapaxes(np.asarray(sm.state.u), 1, 2)
    v = np.swapaxes(np.asarray(sm.state.v), 1, 2)
    th = np.swapaxes(np.asarray(sm.state.theta_m), 1, 2)
    wsp = np.sqrt(u ** 2 + v ** 2)
    return dict(
        w_min=float(w[cm].min()), w_max=float(w[cm].max()),
        u_min=float(u[em].min()), u_max=float(u[em].max()),
        wsp_max=float(wsp[em].max()),
        theta_min=float(th[cm].min()), theta_max=float(th[cm].max()),
        nan_detected=bool(np.isnan(w[cm]).any() or np.isnan(u[em]).any()),
    )
