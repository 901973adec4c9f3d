"""Component-level timing of one SRK3 step at the bench config.

Times each dycore sub-function as its own jitted program (differential
method: RTT/dispatch overheads cancel between N1 and N2 repetitions) and
multiplies by its per-step invocation count.

CAVEAT (round 5, docs/PERF.md finding 2): the remote backend memoizes
identical executions, and this tool's repetitions reuse the same inputs —
absolute numbers may read LOW.  Prefer whole-program XProf device time
(tools/trace_step.py) for ground truth; use this tool only for relative
component ordering within one session.

Run on the real TPU: python tools/profile_step.py [nCells]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from mpas_tpu.config import Namelist
from mpas_tpu.dynamics.model import build_model
from mpas_tpu.ops import acoustic as ac_ops
from mpas_tpu.ops import diagnostics as diag_ops
from mpas_tpu.ops import recover as rk_ops
from mpas_tpu.ops import tendencies as tend_ops

N_LEVELS = 41


def timed(fn, *args, reps=30):
    """Median-of-3 differential timing of `reps` sequential calls."""
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)

    def run(n):
        o = None
        for _ in range(n):
            o = f(*args)
        jax.block_until_ready(o)

    def best(n, tries=3):
        b = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            run(n)
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(reps + 10) - best(10)) / reps * 1e3  # ms


def main():
    grid = None
    if len(sys.argv) > 1 and sys.argv[1] != "2562":
        from mpas_tpu.mesh.generator import generate_mesh
        mesh = generate_mesh(int(sys.argv[1]))
    else:
        mesh = None
    nl = Namelist(config_nvertlevels=N_LEVELS, config_ztop=30000.0,
                  dtype="float32", config_jw_u_perturbation=1.0,
                  config_dt=720.0)
    m = build_model(namelist=nl, mesh=mesh)
    st, static, marr, vert = m.state, m.static, m.mesh_arrays, m.vert
    dt = nl.config_dt

    # stage the inputs each component needs
    diags = diag_ops.compute_solve_diagnostics(st, marr, hollingsworth=False,
                                               reconstruct_v=True)
    st = st.replace(**diags)
    save = rk_ops.rk_integration_setup(st)
    st = rk_ops.compute_moist_coefficients(st, marr)
    coefs = ac_ops.compute_vert_imp_coefs(st, static, vert, nl, dt / 3)
    tend0 = tend_ops.compute_dyn_tend(st, save, static, marr, vert, nl, 0, dt)
    tend0 = rk_ops.set_smlstep_pert_variables(tend0, static, marr, vert)
    ac = ac_ops.AcousticState(
        ru_p=jnp.zeros_like(st.u), rho_pp=jnp.zeros_like(st.rho_p),
        rtheta_pp=jnp.zeros_like(st.rtheta_p),
        rtheta_pp_old=jnp.zeros_like(st.rtheta_p),
        rw_p=jnp.zeros_like(st.rw))
    ruAvg = jnp.zeros_like(st.ruAvg)
    wwAvg = jnp.zeros_like(st.wwAvg)

    rows = []

    def add(name, count, fn, *args):
        t = timed(fn, *args)
        rows.append((name, count, t))
        print(f"{name:34s} x{count}  {t:7.3f} ms  -> {count * t:7.3f} ms/step")

    add("solve_diagnostics(recon_v)", 1,
        lambda s: diag_ops.compute_solve_diagnostics(s, marr, False, True), st)
    add("solve_diagnostics", 2,
        lambda s: diag_ops.compute_solve_diagnostics(s, marr, False, False), st)
    add("reconstruct_velocity", 1,
        lambda u: diag_ops.reconstruct_velocity(u, marr), st.u)
    add("vert_imp_coefs", 2,
        lambda s: ac_ops.compute_vert_imp_coefs(s, static, vert, nl, dt / 3), st)
    add("dyn_tend rk0", 1,
        lambda s, sv: tend_ops.compute_dyn_tend(s, sv, static, marr, vert, nl,
                                                0, dt), st, save)
    add("dyn_tend rk12", 2,
        lambda s, sv, tp: tend_ops.compute_dyn_tend(s, sv, static, marr, vert,
                                                    nl, 1, dt, prev=tp),
        st, save, tend0)
    add("set_smlstep_pert", 3,
        lambda t: rk_ops.set_smlstep_pert_variables(t, static, marr, vert), tend0)
    add("acoustic_step", 4,
        lambda a, r, w: ac_ops.advance_acoustic_step(
            a, r, w, tend0, coefs, st, save, static, marr, vert, nl, dt / 3,
            1, damp_previous=nl.config_divergence_damping),
        ac, ruAvg, wwAvg)
    add("divergence_damping(final)", 3,
        lambda a: ac_ops.divergence_damping_3d(a, st, marr, nl, dt / 3,
                                               static=static), ac)
    add("recover_large_step", 3,
        lambda s, a, r, w: rk_ops.recover_large_step_variables(
            s, a, r, w, save, static, marr, vert, nl, 2, 1, dt / 2),
        st, ac, ruAvg, wwAvg)
    add("rk_integration_setup+moist+finish", 1,
        lambda s: rk_ops.rk_dynamics_substep_finish(
            rk_ops.compute_moist_coefficients(
                s.replace(**{}), marr), rk_ops.rk_integration_setup(s),
            1, 1, jnp.zeros_like(s.ruAvg), jnp.zeros_like(s.wwAvg))[0], st)
    if st.scalars is not None and nl.config_scalar_advection:
        from mpas_tpu.ops import scalars as scalar_ops
        add("scalar transport", 1,
            lambda s: scalar_ops.advance_scalars_mono(
                s.scalars, s.rho_zz, s.ruAvg, s.wwAvg, marr, vert, nl, dt)[0],
            st)
    if nl.config_microphysics == "kessler":
        from mpas_tpu.physics import kessler as mp
        add("kessler", 1,
            lambda s: mp.apply_kessler(s, static, vert, nl, dt), st)

    total = sum(c * t for _, c, t in rows)
    print(f"{'COMPONENT SUM':34s}        -> {total:7.3f} ms/step")

    full = timed(m.step_fn, st, reps=10)
    print(f"{'FULL FUSED STEP':34s}        -> {full:7.3f} ms/step")


if __name__ == "__main__":
    main()
