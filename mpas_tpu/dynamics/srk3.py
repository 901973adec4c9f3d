"""The 3rd-order Runge-Kutta split-explicit time integrator.

Rebuilds atm_srk3 / atm_timestep (rk_timestep.rg:361-519) as a single pure
function: the RK loop (static trip count 3) and the acoustic loop (2-3) are
unrolled at trace time, so one jit compiles the whole timestep into one XLA
program — the TPU-native equivalent of the reference's Legion task graph.

Differences from the reference (deliberate, per SURVEY.md section 8):
  - atm_recover_large_step_variables runs every RK stage (commented out in
    the reference at rk_timestep.rg:460, leaving its state frozen);
  - mpas_reconstruct runs after the RK loop (skipped at :487);
  - the final rho_zz is rediagnosed as rho_p + rho_base after the
    dynamics-split bookkeeping restores the old density for scalar
    transport.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import acoustic as ac_ops
from ..ops import diagnostics as diag_ops
from ..ops import recover as rk_ops
from ..ops import tendencies as tend_ops


def rk_substep_counts(number_of_sub_steps: int):
    """(n_small_steps per rk stage, rk_sub_timestep factors)
    (rk_timestep.rg:378-399)."""
    n = number_of_sub_steps
    counts = [max(1, n // 2), max(1, n // 2), n]
    return counts


def atm_srk3(state, static, mesh, vert, nl, dt: float, halo=None):
    """Advance one full dynamics timestep (possibly several dynamics
    substeps).  Returns the new state.

    `halo` (optional) is a parallel.halo.HaloExchange bound to a domain
    decomposition: when given, prognostic halos are refreshed at the top of
    each RK stage and the acoustic perturbation halos once per substep, and
    all stencil computation proceeds redundantly over the (3-ring) halo so
    owned outputs are exact.  Diagnostics (ke, divergence, vorticity,
    pv_edge, v, uReconstruct*) are recomputed at stage start from the
    freshly-exchanged state — mathematically identical to the reference's
    end-of-stage placement (the stage-0 state is the previous step's final
    state), and it removes any need to communicate diagnostic fields.
    """
    dynamics_split = nl.config_dynamics_split_steps
    dt_dynamics = dt / dynamics_split
    n_sub = nl.config_number_of_sub_steps

    rk_timestep = [dt_dynamics / 3.0, dt_dynamics / 2.0, dt_dynamics]
    rk_sub_timestep = [dt_dynamics / 3.0, dt_dynamics / n_sub, dt_dynamics / n_sub]
    number_sub_steps = rk_substep_counts(n_sub)

    if halo is not None:
        state = halo.refresh_state(state)
    save = rk_ops.rk_integration_setup(state)
    state = rk_ops.compute_moist_coefficients(state, mesh)

    ruAvg_split = jnp.zeros_like(state.ruAvg)
    wwAvg_split = jnp.zeros_like(state.wwAvg)

    for dynamics_substep in range(1, dynamics_split + 1):
        coefs = None
        tend = None

        for rk_step in range(3):
            if halo is not None and (rk_step > 0 or dynamics_substep > 1):
                # stage-top full refresh (the step-top refresh covers the
                # first stage of the first dynamics substep); later dynamics
                # substeps restart from a recover output whose outer halo
                # rings are stale under the tend-exchange scheme below
                state = halo.refresh_state(state)

            # diagnostics of the current stage state (solve_diagnostics);
            # the cell-center reconstruction feeds the curvature terms.
            # In stencil form (apvm off) the tangential velocity comes from
            # compute_dyn_tend's Coriolis reduce instead (bitwise the same
            # sum, one 10-slot edgesOnEdge reduction saved per step).
            cell_form = getattr(nl, "config_cell_form_ops", False)
            apvm = getattr(nl, "config_apvm_upwinding", 0.0)
            v_from_tend = (not cell_form) and apvm == 0.0
            diags = diag_ops.compute_solve_diagnostics(
                state, mesh,
                hollingsworth=getattr(nl, "config_hollingsworth", False),
                reconstruct_v=(rk_step == 0 and not v_from_tend),
                cell_form=cell_form,
                apvm_upwinding=apvm,
                dt=dt_dynamics)
            state = state.replace(**diags)
            if rk_step == 0:
                zonal, meridional = diag_ops.reconstruct_velocity(state.u, mesh)
                state = state.replace(uReconstructZonal=zonal,
                                      uReconstructMeridional=meridional)

            if rk_step in (0, 1):
                coefs = ac_ops.compute_vert_imp_coefs(state, static, vert, nl,
                                                      rk_sub_timestep[rk_step])

            # ---- acoustic substeps ----
            ns = number_sub_steps[rk_step]
            # Communication placement: with an n-ring halo, exchanging the
            # TENDENCIES once per stage makes every acoustic substep (and the
            # post-loop damping/recovery) pure local compute — each substep
            # consumes one ring of validity and recovery one more, so owned
            # outputs stay exact while ns + 1 <= n_rings.  The tend exchange
            # is dataflow-independent of compute_vert_imp_coefs and the
            # stage-constant acoustic edge pairs, so XLA's latency-hiding
            # scheduler overlaps the collective with that compute (the
            # BASELINE north-star overlap; tests/test_sharded.py asserts the
            # collective count and docs/PERF.md the schedule).
            exchange_tend = halo is not None and ns + 1 <= halo.n_rings

            tend = tend_ops.compute_dyn_tend(state, save, static, mesh, vert,
                                             nl, rk_step, dt, prev=tend)
            if rk_step == 0 and v_from_tend and tend.v is not None:
                # same refresh cadence as the old reconstruct_v=(rk_step==0)
                state = state.replace(v=tend.v)
            if exchange_tend:
                tend = halo.refresh_tend(tend)
            tend = rk_ops.set_smlstep_pert_variables(tend, static, mesh, vert,
                                                     nl=nl)
            ac = ac_ops.AcousticState(
                ru_p=jnp.zeros_like(state.u),
                rho_pp=jnp.zeros_like(state.rho_p),
                rtheta_pp=jnp.zeros_like(state.rtheta_p),
                rtheta_pp_old=jnp.zeros_like(state.rtheta_p),
                rw_p=jnp.zeros_like(state.rw))
            ruAvg = jnp.zeros_like(state.ruAvg)
            wwAvg = jnp.zeros_like(state.wwAvg)
            # the divergence damping of each substep's ru_p is folded into the
            # NEXT substep's packed pressure-gradient gather (one row gather
            # instead of two); the final substep is damped standalone below
            for small_step in range(ns):
                ac, ruAvg, wwAvg = ac_ops.advance_acoustic_step(
                    ac, ruAvg, wwAvg, tend, coefs, state, save, static, mesh,
                    vert, nl, rk_sub_timestep[rk_step], small_step,
                    damp_previous=nl.config_divergence_damping)
                if halo is not None and not exchange_tend:
                    # fallback (ns + 1 > n_rings): per-substep perturbation
                    # refresh, as the halo is too shallow for redundant
                    # substep compute
                    ac = halo.refresh_acoustic(ac)
            if nl.config_divergence_damping:
                ac = ac_ops.divergence_damping_3d(ac, state, mesh, nl,
                                                  rk_sub_timestep[rk_step],
                                                  static=static)

            state = rk_ops.recover_large_step_variables(
                state, ac, ruAvg, wwAvg, save, static, mesh, vert, nl,
                ns, rk_step, rk_timestep[rk_step])

        state, save, ruAvg_split, wwAvg_split = rk_ops.rk_dynamics_substep_finish(
            state, save, dynamics_substep, dynamics_split,
            ruAvg_split, wwAvg_split)

    # scalar transport on (rho_zz_old, ruAvg, wwAvg): the piece the reference
    # leaves unfinished (rk_timestep.rg:465-469); monotonic FCT per MPAS.
    # rho_zz holds the OLD (pre-step) density here — the split bookkeeping
    # restored it for exactly this flux-form update.
    rho_zz_old = state.rho_zz
    # rediagnose the new density BEFORE microphysics: apply_kessler couples
    # rtheta_p = rho_zz*theta_m - rtheta_base from the EOS, so feeding it the
    # restored old density would rewrite the thermodynamic state with a
    # mixed old-rho/new-theta product — an O(drho/dt * dt) spurious heating
    # every step that destabilizes long moist runs (blowup in ~30 steps at
    # 26 levels; caught by tools/moist_validation.py).
    state = state.replace(rho_zz=state.rho_p + static.rho_base)
    if state.scalars is not None and nl.config_scalar_advection:
        from ..ops import scalars as scalar_ops
        if halo is not None:
            ruAvg = halo.edge(state.ruAvg)
            scal = state.scalars                 # species-major [nS, K, C]
            nS, Ks, Cs = scal.shape
            wwAvg, rho_old, scal_flat = halo.cell(
                state.wwAvg, rho_zz_old, scal.reshape(nS * Ks, Cs))
            scal = scal_flat.reshape(nS, Ks, Cs)
        else:
            ruAvg, wwAvg, rho_old, scal = (state.ruAvg, state.wwAvg,
                                           rho_zz_old, state.scalars)
        scal_new, _ = scalar_ops.advance_scalars_mono(
            scal, rho_old, ruAvg, wwAvg, mesh, vert, nl, dt)
        state = state.replace(scalars=scal_new)

    # microphysics: close the moisture loop (the capability the reference
    # leaves open — SURVEY.md section 8 "scalar transport absent throughout")
    if (nl.config_microphysics == "kessler" and state.scalars is not None
            and state.scalars.shape[0] >= 3):
        from ..physics import kessler as mp
        state = mp.apply_kessler(state, static, vert, nl, dt)
    elif (nl.config_microphysics == "wsm6lite" and state.scalars is not None
            and state.scalars.shape[0] >= 5):
        from ..physics import wsm6 as mp6
        state = mp6.apply_wsm6(state, static, vert, nl, dt)
    elif (nl.config_microphysics == "wsm6" and state.scalars is not None
            and state.scalars.shape[0] >= 6):
        from ..physics import wsm6 as mp6
        state = mp6.apply_wsm6(state, static, vert, nl, dt, full=True)

    # surface-layer + PBL vertical mixing (the reference's empty driver
    # slots, atmphys_driver.rg:23-62) — columnar, inside the jitted step
    if getattr(nl, "config_pbl", "off") == "ysu_lite":
        from ..physics import pbl as pbl_mod
        state = pbl_mod.apply_pbl(state, static, vert, mesh, nl, dt)

    return state


def summarize_timestep(state, mesh):
    """Global min/max/NaN diagnostics (summarize_timestep, rk_timestep.rg:29-359)
    as a dict of scalars; in sharded runs these reduce with psum/pmax over the
    device mesh instead of the reference's stubbed MPI reductions."""
    wsp = jnp.sqrt(state.u ** 2 + state.v ** 2)
    return dict(
        w_min=jnp.min(state.w), w_max=jnp.max(state.w),
        u_min=jnp.min(state.u), u_max=jnp.max(state.u),
        wsp_max=jnp.max(wsp),
        theta_min=jnp.min(state.theta_m), theta_max=jnp.max(state.theta_m),
        nan_detected=jnp.logical_or(jnp.any(jnp.isnan(state.w)),
                                    jnp.any(jnp.isnan(state.u))),
    )


def make_step_fn(static, mesh, vert, nl, dt=None):
    """Returns a jitted step(state) -> state closing over the static data.

    config_fast_compile trades XLA optimization effort for compile time
    (exec_time_optimization_effort < 0): measured on v5e at x1.40962/41L
    in tools/compile_study.py — see docs/PERF.md "Cold compile"."""
    dt = nl.config_dt if dt is None else dt
    opts = None
    if getattr(nl, "config_fast_compile", False):
        opts = {"exec_time_optimization_effort": -1.0}

    @partial(jax.jit, compiler_options=opts)
    def step(state):
        return atm_srk3(state, static, mesh, vert, nl, dt)

    return step
