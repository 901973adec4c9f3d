"""Model state as JAX pytrees of dense arrays.

TPU-first redesign of the reference's array-of-structs field spaces
(data_structures.rg:10-639): every field is a dense array with the vertical
level MAJOR and the element index (cell/edge/vertex) minor, so the large
horizontal extent lives in the TPU lane dimension: horizontal stencils are
lane gathers from narrow [K, N] tables (~2 ns per gathered column on v5e vs
~5 ns per gathered row in the element-major layout, whose K~41 minor axis
also pads to 128 lanes in every intermediate), vertical operators are cheap
major-axis slices, and interface patches are contiguous row updates
(docs/PERF.md, tools/layout_study*.py).

Array shape conventions (C=nCells, E=nEdges, V=nVertices, K=nVertLevels):
  cell fields      [K, C]       (mass levels)    e.g. theta_m, rho_zz
  cell w-fields    [K+1, C]     (interfaces)     e.g. w, rw, zgrid
  edge fields      [K, E]                        e.g. u, ru
  vertex fields    [K, V]                        e.g. vorticity
  scalars          [nS, K, C]   (species major)
Per-slot coefficient tables are slot-major so each weight row is a
contiguous lane vector: dirHess [M, 1+M, C], tanWeights [M, M, C],
zb_cell/zb3_cell [M, K+1, C].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..mesh.loader import Mesh
from ..mesh import coefficients as mcoef
from ..core.vertical import VerticalGrid


@struct.dataclass
class MeshArrays:
    """Static horizontal mesh on device: adjacency + geometry + precomputed
    stencil coefficients.  (Replaces cell_fs/edge_fs/vertex_fs topology fields
    and the init-time coefficient tasks, SURVEY.md sections 2.1/2.3.)"""

    # adjacency (int32) and masks
    cellsOnEdge: Any          # [E, 2]
    verticesOnEdge: Any       # [E, 2]
    edgesOnCell: Any          # [C, M]
    cellsOnCell: Any          # [C, M]
    verticesOnCell: Any       # [C, M]
    edgesOnCell_mask: Any     # [C, M]
    edgesOnCellSign: Any      # [C, M]
    cellsOnVertex: Any        # [V, D]
    edgesOnVertex: Any        # [V, D]
    edgesOnVertexSign: Any    # [V, D]
    edgesOnEdge: Any          # [E, W2]
    edgesOnEdge_mask: Any     # [E, W2]
    weightsOnEdge: Any        # [E, W2]
    kiteForCell: Any          # [C, M]
    kiteAreasOnVertex: Any    # [V, D]

    # geometry
    latCell: Any              # [C]
    lonCell: Any
    latEdge: Any              # [E]
    lonEdge: Any
    angleEdge: Any            # [E]
    dvEdge: Any               # [E]
    dcEdge: Any
    invDvEdge: Any
    invDcEdge: Any
    areaCell: Any             # [C]
    invAreaCell: Any
    invAreaTriangle: Any      # [V]
    meshScalingDel2: Any      # [E]
    meshScalingDel4: Any      # [E]
    meshScalingRegionalCell: Any  # [C] relaxation-zone diffusion scaling
    meshScalingRegionalEdge: Any  # [E]
    bdyMaskCell: Any          # [C] int32: 0 interior, 1..n relax, n+1 specified
    bdyMaskEdge: Any          # [E] int32

    # advection stencil (atm_adv_coef_compression)
    advCellsForEdge: Any      # [E, S]
    advMaskForEdge: Any       # [E, S]
    adv_coefs: Any            # [E, S]
    adv_coefs_3rd: Any        # [E, S]

    # cell-form operators (mesh/coefficients.py compute_dir_hessian /
    # compute_tangential_matrix): same arithmetic as the advection / Thuburn
    # stencil gathers with ~5x fewer gather rows
    dirHess: Any              # [M, 1+M, C] (slot-major)
    tanWeights: Any           # [M, M, C] (slot-major)
    slotOnCell: Any           # [E, 2] int32

    # velocity reconstruction + deformation
    coeffs_reconstruct: Any   # [C, M, 3]
    defc_a: Any               # [C, M]
    defc_b: Any               # [C, M]

    # Coriolis
    fEdge: Any                # [E]
    fVertex: Any              # [V]

    # ownership-aligned edge numbering (mesh/orient.py): when True,
    # cellsOnEdge[e, 0] == e % nCells for every edge, so owner-side cell
    # reads are a lane tiling (no gather) and a cell's 3 owned edges are
    # the slices [:C], [C:2C], [2C:3C] of any edge field
    owner_aligned: bool = struct.field(pytree_node=False, default=False)

    @property
    def nCells(self):
        return self.edgesOnCell.shape[0]

    @property
    def nEdges(self):
        return self.cellsOnEdge.shape[0]

    @property
    def nVertices(self):
        return self.cellsOnVertex.shape[0]

    @property
    def maxEdges(self):
        return self.edgesOnCell.shape[1]


@struct.dataclass
class VerticalArrays:
    """1-D vertical metrics on device (vertical_fs, data_structures.rg:558-575)."""
    rdzw: Any     # [K]
    dzw: Any      # [K]
    rdzu: Any     # [K+1]
    fzm: Any      # [K+1]
    fzp: Any      # [K+1]
    zw: Any       # [K+1]
    cf1: Any      # scalar
    cf2: Any
    cf3: Any
    u_init: Any   # [K]
    v_init: Any   # [K]


@struct.dataclass
class StaticState:
    """Per-column static fields set at initialization: terrain-following
    metrics and the dry reference (base) state."""
    zgrid: Any          # [K+1, C] physical interface heights
    zz: Any             # [K, C]   d zeta / d z
    dss: Any            # [K, C]   w-damping profile (atm_compute_damping_coefs)
    zxu: Any            # [K, E]   edge slope dz/dx (init_atm_cases.rg:257-263)
    zb_cell: Any        # [M, K+1, C] omega metric, slot-major cell-local copy
    zb3_cell: Any       # [M, K+1, C] (scaled by coef_3rd_order)
    rho_base: Any       # [K, C]
    theta_base: Any     # [K, C]
    rtheta_base: Any    # [K, C]
    exner_base: Any     # [K, C]
    pressure_base: Any  # [K, C]
    t_init: Any         # [K, C] initial theta_m (perturbation-form mixing)


@struct.dataclass
class State:
    """Prognostic + persistent diagnostic state advanced by the SRK3 step."""
    # prognostics (uncoupled)
    u: Any              # [K, E] normal velocity
    w: Any              # [K+1, C]
    theta_m: Any        # [K, C] moist potential temperature
    rho_zz: Any         # [K, C] coupled dry density rho/zz

    # coupled / perturbation variables
    ru: Any             # [K, E]
    rw: Any             # [K+1, C]
    rho_p: Any          # [K, C]
    rtheta_p: Any       # [K, C]
    exner: Any          # [K, C]
    pressure_p: Any     # [K, C]

    # time-averaged fluxes for scalar transport
    ruAvg: Any          # [K, E]
    wwAvg: Any          # [K+1, C]

    # persistent diagnostics (atm_compute_solve_diagnostics outputs, consumed
    # by the next stage's dyn_tend)
    ke: Any             # [K, C]
    divergence: Any     # [K, C]
    vorticity: Any      # [K, V]
    pv_edge: Any        # [K, E]
    rho_edge: Any       # [K, E]
    v: Any              # [K, E] tangential velocity
    uReconstructZonal: Any       # [K, C]
    uReconstructMeridional: Any  # [K, C]

    # physics couplings (zero for dry dynamics)
    rt_diabatic_tend: Any   # [K, C]
    tend_rho_physics: Any   # [K, C]
    tend_rtheta_physics: Any  # [K, C]
    tend_ru_physics: Any    # [K, E]

    # moisture coupling coefficients (atm_compute_moist_coefficients)
    qtot: Any           # [K, C]
    cqw: Any            # [K, C] (interface slots 1..K-1 in rows 1..K-1)
    cqu: Any            # [K, E]

    # scalars (moisture etc.), [nScalars, K, C]; None when dry
    scalars: Any = None
    # accumulated grid-scale precipitation [C] (mm); None without microphysics
    rainnc: Any = None


def zero_state(C: int, E: int, V: int, K: int, dtype=jnp.float32,
               n_scalars: int = 0) -> State:
    z = lambda *s: jnp.zeros(s, dtype)
    return State(
        u=z(K, E), w=z(K + 1, C), theta_m=z(K, C), rho_zz=z(K, C),
        ru=z(K, E), rw=z(K + 1, C), rho_p=z(K, C), rtheta_p=z(K, C),
        exner=z(K, C), pressure_p=z(K, C),
        ruAvg=z(K, E), wwAvg=z(K + 1, C),
        ke=z(K, C), divergence=z(K, C), vorticity=z(K, V),
        pv_edge=z(K, E), rho_edge=z(K, E), v=z(K, E),
        uReconstructZonal=z(K, C), uReconstructMeridional=z(K, C),
        rt_diabatic_tend=z(K, C), tend_rho_physics=z(K, C),
        tend_rtheta_physics=z(K, C), tend_ru_physics=z(K, E),
        # dry atmosphere: moisture coupling coefficients are exactly 1
        qtot=z(K, C), cqw=jnp.ones((K, C), dtype), cqu=jnp.ones((K, E), dtype),
        scalars=(z(n_scalars, K, C) if n_scalars else None),
    )


def mesh_arrays_from_mesh(mesh: Mesh, namelist, dtype=jnp.float32,
                          deriv_two=None) -> MeshArrays:
    """Build device MeshArrays (including all derived stencil coefficients)
    from a host Mesh."""
    if deriv_two is None:
        deriv_two = mcoef.compute_deriv_two(mesh)
    adv = mcoef.compute_advection_coefficients(
        mesh, deriv_two, coef_3rd_order=namelist.config_coef_3rd_order)
    # trim the advection stencil to its true width (10 on hex meshes vs the
    # FIFTEEN padding) — the [E, S, K] advection gathers are the hottest
    s_used = int(adv.nAdvCellsForEdge.max())
    if s_used < adv.advCellsForEdge.shape[1]:
        adv.advCellsForEdge = np.ascontiguousarray(adv.advCellsForEdge[:, :s_used])
        adv.advMaskForEdge = np.ascontiguousarray(adv.advMaskForEdge[:, :s_used])
        adv.adv_coefs = np.ascontiguousarray(adv.adv_coefs[:, :s_used])
        adv.adv_coefs_3rd = np.ascontiguousarray(adv.adv_coefs_3rd[:, :s_used])
    dirHess = mcoef.compute_dir_hessian(mesh, deriv_two)
    tanWeights = mcoef.compute_tangential_matrix(mesh)
    slotOnCell = mcoef.compute_edge_slots(mesh)
    if getattr(namelist, "config_reconstruct_method", "lsq") == "rbf":
        coeffs_reconstruct = mcoef.compute_reconstruct_coefficients_rbf(mesh)
    else:
        coeffs_reconstruct = mcoef.compute_reconstruct_coefficients(mesh)
    defc_a, defc_b = mcoef.compute_deformation_weights(mesh)
    ms2, ms4, msrc, msre = mcoef.compute_mesh_scaling(
        mesh, namelist.config_h_ScaleWithMesh)
    bdy_c = np.asarray(getattr(mesh, "bdyMaskCell", np.zeros(mesh.nCells)),
                       dtype=np.int32)
    bdy_e = np.asarray(getattr(mesh, "bdyMaskEdge", np.zeros(mesh.nEdges)),
                       dtype=np.int32)

    # rotated Coriolis parameter, alpha_grid = 0 (init_atm_cases.rg:595-601);
    # non-rotating small-planet cases (config_coriolis=False) zero it
    from .. import constants
    omega_pl = (constants.omega
                if getattr(namelist, "config_coriolis", True) else 0.0)
    fEdge = 2.0 * omega_pl * np.sin(mesh.latEdge)
    fVertex = 2.0 * omega_pl * np.sin(mesh.latVertex)

    # HOST (numpy) arrays on purpose: the step jit closes over these as
    # constants, and numpy constants embed directly at trace time.  Device-
    # resident (jnp) constants instead get FETCHED back through the runtime
    # during lowering (437 s over the remote-TPU tunnel at x1.40962) and
    # compile as runtime parameters, losing constant folding/pre-layout
    # worth ~12 ms/step (80.5 -> 68.4 ms measured; docs/PERF.md round 4).
    f = lambda a: np.asarray(a, dtype)
    i = lambda a: np.asarray(a, np.int32)
    return MeshArrays(
        cellsOnEdge=i(mesh.cellsOnEdge), verticesOnEdge=i(mesh.verticesOnEdge),
        edgesOnCell=i(mesh.edgesOnCell), cellsOnCell=i(mesh.cellsOnCell),
        verticesOnCell=i(mesh.verticesOnCell),
        edgesOnCell_mask=f(mesh.edgesOnCell_mask),
        edgesOnCellSign=f(mesh.edgesOnCellSign),
        cellsOnVertex=i(mesh.cellsOnVertex), edgesOnVertex=i(mesh.edgesOnVertex),
        edgesOnVertexSign=f(mesh.edgesOnVertexSign),
        edgesOnEdge=i(mesh.edgesOnEdge), edgesOnEdge_mask=f(mesh.edgesOnEdge_mask),
        weightsOnEdge=f(mesh.weightsOnEdge),
        kiteForCell=i(mesh.kiteForCell), kiteAreasOnVertex=f(mesh.kiteAreasOnVertex),
        latCell=f(mesh.latCell), lonCell=f(mesh.lonCell),
        latEdge=f(mesh.latEdge), lonEdge=f(mesh.lonEdge),
        angleEdge=f(mesh.angleEdge),
        dvEdge=f(mesh.dvEdge), dcEdge=f(mesh.dcEdge),
        invDvEdge=f(mesh.invDvEdge), invDcEdge=f(mesh.invDcEdge),
        areaCell=f(mesh.areaCell), invAreaCell=f(mesh.invAreaCell),
        invAreaTriangle=f(mesh.invAreaTriangle),
        meshScalingDel2=f(ms2), meshScalingDel4=f(ms4),
        meshScalingRegionalCell=f(msrc), meshScalingRegionalEdge=f(msre),
        bdyMaskCell=i(bdy_c), bdyMaskEdge=i(bdy_e),
        advCellsForEdge=i(adv.advCellsForEdge), advMaskForEdge=f(adv.advMaskForEdge),
        adv_coefs=f(adv.adv_coefs), adv_coefs_3rd=f(adv.adv_coefs_3rd),
        # slot-major layouts: each weight row is a contiguous [C] lane vector
        dirHess=f(np.moveaxis(dirHess, 0, 2)),
        tanWeights=f(np.moveaxis(tanWeights, 0, 2)),
        slotOnCell=i(slotOnCell),
        coeffs_reconstruct=f(coeffs_reconstruct),
        defc_a=f(defc_a), defc_b=f(defc_b),
        fEdge=f(fEdge), fVertex=f(fVertex),
        owner_aligned=bool(getattr(mesh, "edges_owner_aligned", False)),
    )


def vertical_arrays_from_grid(vg: VerticalGrid, dtype=jnp.float32) -> VerticalArrays:
    f = lambda a: np.asarray(a, dtype)       # host constants (see above)
    return VerticalArrays(
        rdzw=f(vg.rdzw), dzw=f(vg.dzw), rdzu=f(vg.rdzu),
        fzm=f(vg.fzm), fzp=f(vg.fzp), zw=f(vg.zw),
        cf1=np.asarray(vg.cf1, dtype), cf2=np.asarray(vg.cf2, dtype),
        cf3=np.asarray(vg.cf3, dtype),
        u_init=f(vg.u_init), v_init=f(vg.v_init),
    )
