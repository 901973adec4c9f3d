"""History and restart I/O.

Rebuilds the reference's write_output_plotting (mesh_loading.rg:810-1191) —
which wrote only level-0 slices of 8 fields — as a full-field netCDF history
writer compatible with the reference's plotting scripts, plus an exact
restart capability (absent in the reference; SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from ..mesh.netcdf_io import write_netcdf, read_netcdf
from ..ops import diagnostics as diag_ops

# fields written for plotting parity with the reference writer
# (mesh_loading.rg:810-1191): u, v, w, pressure, pressure_p, rho, theta,
# surface_pressure + mesh coordinates
PLOT_LEVEL = 0

# restart state-array layout: 1 = level-major [K, N] (round 3+)
RESTART_LAYOUT_VERSION = 1


def _snapshot_fields(model, state, full_3d: bool):
    """One time level of history fields (host numpy dict).

    Device fields are level-major [K, N] (core/state.py); the file keeps the
    reference's element-major [nCells, nVertLevels] convention, so each
    field transposes at this host boundary."""
    out = diag_ops.output_diagnostics(state, model.static)
    pressure = np.asarray(out["pressure"]).T              # [C, K]
    vg = model.vgrid
    sp = (vg.cf1 * pressure[:, 0] + vg.cf2 * pressure[:, 1]
          + vg.cf3 * pressure[:, 2])
    K = pressure.shape[1]
    tr = lambda a: np.asarray(a).T
    sl = (lambda a: a) if full_3d else (lambda a: a[:, PLOT_LEVEL:PLOT_LEVEL + 1])
    return {
        "u": sl(tr(state.u)), "v": sl(tr(state.v)),
        "w": sl(tr(state.w)[:, :K]),
        "rho": sl(tr(out["rho"])),
        "theta": sl(tr(out["theta"])),
        "pressure": sl(pressure),
        "pressure_p": sl(tr(state.pressure_p)),
        "surface_pressure": sp,
    }


_STATE_DIM = {"u": "nEdges", "v": "nEdges"}


def write_history(path: str, model, state=None, full_3d: bool = False,
                  snapshots=None):
    """Write a timestep_output.nc-style history file.

    With full_3d=False matches the reference writer's level-0 2-D slices;
    with full_3d=True writes complete [nCells, nVertLevels] fields.
    `snapshots`: optional list of (time_value, fields-dict from
    `_snapshot_fields`) — a multi-time-level history (HistoryWriter);
    default is one snapshot of the given/current state."""
    m = model.mesh
    if snapshots is None:
        state = state if state is not None else model.state
        snapshots = [(float(getattr(model, "step_count", 0)),
                      _snapshot_fields(model, state, full_3d))]
    T = len(snapshots)
    K = model.state.theta_m.shape[0]
    dims = {
        "Time": T, "nCells": m.nCells, "nEdges": m.nEdges,
        "nVertices": m.nVertices, "maxEdges": m.maxEdges,
        "vertexDegree": m.vertexDegree, "nVertLevels": K,
        "nVertLevelsP1": K + 1,
    }
    kdim = ("nVertLevels",) if full_3d else ("one",)
    if not full_3d:
        dims["one"] = 1

    variables = {
        # mesh (for the plotting scripts' patch construction)
        "latCell": (("nCells",), m.latCell),
        "lonCell": (("nCells",), m.lonCell),
        "latVertex": (("nVertices",), m.latVertex),
        "lonVertex": (("nVertices",), m.lonVertex),
        "nEdgesOnCell": (("nCells",), m.nEdgesOnCell.astype(np.int32)),
        "verticesOnCell": (("nCells", "maxEdges"),
                           (m.verticesOnCell + 1).astype(np.int32)),
        "areaCell": (("nCells",), m.areaCell),
        "xtime": (("Time",), np.array([t for t, _ in snapshots])),
    }
    for name in snapshots[0][1]:
        stacked = np.stack([f[name] for _, f in snapshots])   # [T, ...]
        d0 = _STATE_DIM.get(name, "nCells")
        dnames = ("Time", d0) + (() if stacked.ndim == 2 else kdim)
        variables[name] = (dnames, stacked)
    write_netcdf(path, dims, variables,
                 attrs={"on_a_sphere": b"YES", "sphere_radius": m.sphere_radius})
    return path


class HistoryWriter:
    """Accumulates per-interval snapshots during a run and writes one
    multi-time-level history file — the time-series capability the
    reference's single-snapshot write_output_plotting lacks."""

    def __init__(self, model, full_3d: bool = False):
        self.model = model
        self.full_3d = full_3d
        self.snapshots = []

    def record(self, state=None, time_value=None):
        state = state if state is not None else self.model.state
        t = (time_value if time_value is not None
             else float(getattr(self.model, "step_count", len(self.snapshots))))
        self.snapshots.append(
            (t, _snapshot_fields(self.model, state, self.full_3d)))

    def write(self, path: str):
        return write_history(path, self.model, full_3d=self.full_3d,
                             snapshots=self.snapshots)


def save_restart(path: str, model):
    """Exact-restart checkpoint: every prognostic/persistent state field plus
    the step counter, as a compressed npz (host-side).

    Works for both the single-device Model and the ShardedModel: sharded
    state is saved with its [S, L, ...] local-block layout plus a shard-count
    marker, so resume with the same shard count is bitwise exact."""
    arrays = {}
    for f in dataclasses.fields(model.state):
        x = getattr(model.state, f.name)
        if x is not None:
            arrays[f.name] = np.asarray(x)
    arrays["__step_count__"] = np.asarray(model.step_count)
    # layout/version marker: state arrays are level-major [K, N] since
    # round 3 (core/state.py); load_restart refuses files without it so a
    # pre-flip element-major checkpoint fails loudly instead of loading
    # transposed fields
    arrays["__layout__"] = np.asarray(RESTART_LAYOUT_VERSION)
    n_shards = getattr(model, "n_shards", 0)
    if n_shards:
        arrays["__n_shards__"] = np.asarray(n_shards)
    np.savez_compressed(path, **arrays)
    return path


def load_restart(path: str, model):
    """Restore a checkpoint written by save_restart (bitwise exact).  A
    sharded checkpoint requires a ShardedModel with the same shard count."""
    import jax.numpy as jnp
    data = np.load(path)
    layout = int(data["__layout__"]) if "__layout__" in data else 0
    if layout != RESTART_LAYOUT_VERSION:
        raise ValueError(
            f"restart file {path} has state layout version {layout} "
            f"(0 = pre-level-major, unmarked); this build reads version "
            f"{RESTART_LAYOUT_VERSION} (level-major [K, N] state). "
            f"Regenerate the checkpoint with save_restart.")
    ck_shards = int(data["__n_shards__"]) if "__n_shards__" in data else 0
    mdl_shards = getattr(model, "n_shards", 0)
    if ck_shards != mdl_shards:
        raise ValueError(
            f"checkpoint written with {ck_shards or 'no'} shards cannot "
            f"restore into a model with {mdl_shards or 'no'} shards")
    model.state = model.state.replace(**_restored_updates(path, data, model))
    model.step_count = int(data["__step_count__"])
    return model


def _restored_updates(path, data, model):
    """Map checkpoint fields onto the model's state fields, rejecting fields
    the restoring configuration has disabled (None) with a config-mismatch
    error instead of an AttributeError (round-4 advisor finding)."""
    import jax.numpy as jnp
    updates = {}
    for f in dataclasses.fields(model.state):
        if f.name in data:
            cur = getattr(model.state, f.name)
            if cur is None:
                raise ValueError(
                    f"checkpoint {path} carries field '{f.name}' but the "
                    f"restoring model has it disabled (None) — config "
                    f"mismatch (e.g. a moist checkpoint into a dry model)")
            arr = jnp.asarray(data[f.name], cur.dtype)
            if arr.shape != cur.shape:
                raise ValueError(
                    f"checkpoint {path} field '{f.name}' has shape "
                    f"{arr.shape} but the restoring model expects "
                    f"{cur.shape} — mesh/levels mismatch, or the edge "
                    f"numbering differs (config_orient_edges checkpoints "
                    f"are not interchangeable with the default numbering)")
            updates[f.name] = arr
    return updates


def gathered_state(sm, model):
    """Global State assembled from a ShardedModel's owned entries (for
    history output of sharded runs)."""
    import jax.numpy as jnp
    g = sm.gather_state(model.mesh)
    updates = {k: jnp.asarray(v) for k, v in g.items() if v is not None}
    return model.state.replace(**updates)


def save_restart_orbax(path: str, model):
    """Orbax (tensorstore/zarr) variant of save_restart: the same
    exact-restart payload written as a directory checkpoint — the format
    production JAX serving/training stacks use, async-friendly and
    shardable.  `path` is a directory."""
    import os

    import orbax.checkpoint as ocp

    payload = {"__step_count__": np.asarray(model.step_count),
               "__layout__": np.asarray(RESTART_LAYOUT_VERSION)}
    for f in dataclasses.fields(model.state):
        x = getattr(model.state, f.name)
        if x is not None:
            payload[f.name] = np.asarray(x)
    n_shards = getattr(model, "n_shards", 0)
    if n_shards:
        payload["__n_shards__"] = np.asarray(n_shards)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(path), payload, force=True)
    return path


def load_restart_orbax(path: str, model):
    """Restore a save_restart_orbax checkpoint (bitwise exact), with the
    same layout/shard-count validation as the npz reader."""
    import os

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    data = ckpt.restore(os.path.abspath(path))
    layout = int(data.get("__layout__", 0))
    if layout != RESTART_LAYOUT_VERSION:
        raise ValueError(
            f"orbax restart {path} has state layout version {layout}; this "
            f"build reads version {RESTART_LAYOUT_VERSION}")
    ck_shards = int(data.get("__n_shards__", 0))
    mdl_shards = getattr(model, "n_shards", 0)
    if ck_shards != mdl_shards:
        raise ValueError(
            f"checkpoint written with {ck_shards or 'no'} shards cannot "
            f"restore into a model with {mdl_shards or 'no'} shards")
    model.state = model.state.replace(**_restored_updates(path, data, model))
    model.step_count = int(data["__step_count__"])
    return model
