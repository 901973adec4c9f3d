"""Top-level model assembly and run loop.

The equivalent of the reference's main.rg + atm_core.rg orchestration
(main -> load_mesh -> init_atm_case_jw -> atm_core_init -> timestep loop,
SURVEY.md section 3.1), collapsed into a Model object: host-side setup
(mesh ingest, coefficient builders, JW init) followed by a single jitted
SRK3 step function.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..config import Namelist
from ..core import state as core_state
from ..core.vertical import VerticalGrid, make_vertical_grid
from ..init import jw as jw_init
from ..mesh import coefficients as mcoef
from ..mesh.loader import Mesh, load_mesh
from ..ops import diagnostics as diag_ops
from . import srk3

DEFAULT_GRID = "/root/reference/mesh_loading/x1.2562.grid.nc"


@dataclass
class Model:
    namelist: Namelist
    mesh: Mesh                       # host-side mesh
    vgrid: VerticalGrid              # host-side vertical grid
    mesh_arrays: core_state.MeshArrays
    vert: core_state.VerticalArrays
    static: core_state.StaticState
    state: core_state.State
    step_fn: Callable = None
    step_count: int = 0
    init_fields: dict = field(default_factory=dict)  # host-side init extras

    @property
    def dtype(self):
        return self.state.theta_m.dtype

    def step(self, n: int = 1):
        for _ in range(n):
            self.state = self.step_fn(self.state)
            self.step_count += 1
        return self.state

    _radiation_fn: Callable = None

    def apply_physics(self, phys, julian: float | None = None):
        """Run the jitted radiation driver on the current state and couple
        the radiative heating into the dycore via rt_diabatic_tend (the
        physics_driver -> atm_do_timestep coupling, atm_core.rg:64-68).

        Called once per radiation interval, like MPAS's hourly radiation
        cadence against 12-minute dynamics steps; the compute runs entirely
        on device (one compiled program), only the tiny time factors are
        host-side."""
        from ..ops.diagnostics import output_diagnostics
        from ..physics.driver import make_radiation_fn, time_params
        if julian is None:
            julian = self.step_count * self.namelist.config_dt / 86400.0
        if self._radiation_fn is None:
            self._radiation_fn = make_radiation_fn(phys, self.dtype)
        out = output_diagnostics(self.state, self.static)
        pressure = out["pressure"]                       # [K, C]
        vg = self.vgrid
        sp = (vg.cf1 * pressure[0] + vg.cf2 * pressure[1]
              + vg.cf3 * pressure[2])
        s = self.state
        # the columnar radiation keeps the CAM [cols, pver] convention;
        # transpose the level-major dycore fields at the coupling boundary
        qv = s.scalars[0].T if s.scalars is not None else None
        qc = (s.scalars[1].T if s.scalars is not None
              and s.scalars.shape[0] > 1 else None)
        tp = time_params(phys, julian, self.dtype)
        rthraten, diags = self._radiation_fn(
            self.mesh_arrays.latCell, self.mesh_arrays.lonCell,
            s.theta_m.T, s.exner.T, pressure.T, sp, qv, qc, tp)
        self.state = s.replace(rt_diabatic_tend=rthraten.T.astype(self.dtype))
        import numpy as np
        pd = {k: np.asarray(v) for k, v in diags.items()}
        pd["rthraten"] = np.asarray(rthraten)
        return pd

    def summarize(self):
        return {k: float(v) for k, v in
                srk3.summarize_timestep(self.state, self.mesh_arrays).items()}


def build_model(grid_path: str = DEFAULT_GRID,
                namelist: Optional[Namelist] = None,
                mesh: Optional[Mesh] = None,
                dtype=None) -> Model:
    """Load the mesh, build all static coefficients, apply the JW initial
    condition, derive the coupled state, and compile the step function."""
    nl = namelist or Namelist()
    dtype = dtype or jnp.dtype(nl.dtype)

    if mesh is None:
        mesh = load_mesh(grid_path, sphere_radius=nl.config_sphere_radius)
    if nl.config_renumber_mesh:
        from ..mesh.renumber import renumber_mesh
        mesh, _ = renumber_mesh(mesh)
    if nl.config_orient_edges and not mesh.edges_owner_aligned:
        from ..mesh.orient import orient_edges
        mesh, _ = orient_edges(mesh)
    mesh.validate()
    vg = make_vertical_grid(nl.config_nvertlevels, nl.config_ztop,
                            nl.config_vertical_stretch)

    # acoustic CFL guard: cs * dts / dx with dts = dt / number_of_sub_steps
    import warnings
    cfl = 340.0 * (nl.config_dt / nl.config_number_of_sub_steps) / mesh.dcEdge.min()
    if cfl > 0.72:
        warnings.warn(
            f"acoustic CFL {cfl:.2f} > 0.72 (dt={nl.config_dt}, min dx="
            f"{mesh.dcEdge.min()/1e3:.0f} km): reduce config_dt (~6 s/km) or "
            f"raise config_number_of_sub_steps", stacklevel=2)

    deriv_two = mcoef.compute_deriv_two(mesh)
    marr = core_state.mesh_arrays_from_mesh(mesh, nl, dtype, deriv_two=deriv_two)
    vert = core_state.vertical_arrays_from_grid(vg, dtype)

    if nl.config_init_case == 21:
        from ..init import mountain_wave as mw_init
        static_np, init_np = mw_init.init_mountain_wave(mesh, vg, nl, deriv_two)
    elif nl.config_init_case == 22:
        from ..init import squall as sq_init
        static_np, init_np = sq_init.init_squall(mesh, vg, nl, deriv_two)
    else:
        static_np, init_np = jw_init.init_jw(mesh, vg, nl, deriv_two)
    # host init builds element-major [N, K] arrays; flip to the level-major
    # layout here (zb/zb3 become slot-major [M, K+1, C]).  Statics stay HOST
    # numpy so the step jit embeds them as true constants (state.py note).
    f = lambda a: np.asarray(a, dtype)
    fT = lambda a: np.asarray(np.asarray(a).T, dtype)
    fz = lambda a: np.asarray(np.moveaxis(np.asarray(a), 0, 2), dtype)
    static = core_state.StaticState(
        **{k: (fz(v) if k in ("zb_cell", "zb3_cell") else fT(v))
           for k, v in static_np.items()})

    C, E, V, K = mesh.nCells, mesh.nEdges, mesh.nVertices, vg.nVertLevels
    use_mp = nl.config_microphysics in ("kessler", "wsm6lite", "wsm6")
    n_scalars = ({"kessler": 3, "wsm6lite": 5,
                  "wsm6": 6}.get(nl.config_microphysics, 0)
                 or (1 if nl.config_moisture else 0))
    if use_mp and not nl.config_scalar_advection:
        # microphysics requires transported moisture species
        nl = nl.replace(config_scalar_advection=True)
    if use_mp and nl.config_kessler_nfall == 0:
        from ..physics.kessler import fall_substeps
        dz_min = float(np.min(static_np["zgrid"][:, 1:]
                              - static_np["zgrid"][:, :-1]))
        nl = nl.replace(config_kessler_nfall=fall_substeps(nl.config_dt, dz_min))
    state = core_state.zero_state(C, E, V, K, dtype, n_scalars=n_scalars)
    state = state.replace(
        u=fT(init_np["u"]), w=fT(init_np["w"]), theta_m=fT(init_np["theta_m"]),
        rho_zz=fT(init_np["rho"]),           # physical rho; coupled below
        v=fT(init_np["v"]), pressure_p=fT(init_np["pressure_p"]),
        exner=fT(init_np["exner"]))
    if n_scalars:
        qv = fT(init_np["qv"]) if nl.config_moisture else jnp.zeros((K, C), dtype)
        scal = jnp.zeros((n_scalars, K, C), dtype).at[0].set(qv)
        state = state.replace(scalars=scal)
    if use_mp:
        state = state.replace(rainnc=jnp.zeros((C,), dtype))

    # atm_core_init sequence (atm_core.rg:10-44): coupled diagnostics,
    # solve diagnostics, reconstruction
    state = diag_ops.init_coupled_diagnostics(state, static, marr, vert)
    diags = diag_ops.compute_solve_diagnostics(
        state, marr, hollingsworth=getattr(nl, "config_hollingsworth", False),
        reconstruct_v=True,
        cell_form=getattr(nl, "config_cell_form_ops", False),
        apvm_upwinding=getattr(nl, "config_apvm_upwinding", 0.0),
        dt=nl.config_dt / nl.config_dynamics_split_steps)
    state = state.replace(**diags)
    zonal, meridional = diag_ops.reconstruct_velocity(state.u, marr)
    state = state.replace(uReconstructZonal=zonal, uReconstructMeridional=meridional)

    step_fn = srk3.make_step_fn(static, marr, vert, nl)
    return Model(namelist=nl, mesh=mesh, vgrid=vg, mesh_arrays=marr, vert=vert,
                 static=static, state=state, step_fn=step_fn,
                 init_fields=init_np)
