"""End-to-end dycore tests: steady states, stability, conservation, bubble
decay — the verification strategy the reference lacks (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.ops import diagnostics as D
from mpas_tpu.ops import recover as R
from mpas_tpu.ops import tendencies as T


def _rest_state(model):
    st, static = model.state, model.static
    z = jnp.zeros_like
    base = st.replace(
        u=z(st.u), ru=z(st.ru), v=z(st.v), w=z(st.w), rw=z(st.rw),
        theta_m=jnp.asarray(static.theta_base),       # statics are host numpy
        rho_zz=jnp.asarray(static.rho_base), rho_p=z(st.rho_p),
        rtheta_p=z(st.rtheta_p), exner=jnp.asarray(static.exner_base),
        pressure_p=z(st.pressure_p),
        uReconstructZonal=z(st.ke), uReconstructMeridional=z(st.ke))
    return base.replace(**D.compute_solve_diagnostics(base, model.mesh_arrays,
                                                      reconstruct_v=True))


def test_rest_state_is_steady(model):
    """Isothermal hydrostatic rest state over terrain-following coordinates is
    an exact discrete steady state (the classic sigma-coordinate pgrad test)."""
    S = _rest_state(model)
    S1 = model.step_fn(S)
    assert float(jnp.abs(S1.u).max()) < 1e-5
    assert float(jnp.abs(S1.w).max()) < 1e-5
    assert float(jnp.abs(S1.theta_m - S.theta_m).max()) < 1e-5


def test_balanced_jw_tendencies_small(model):
    """Geostrophic balance: the JW state's u tendency is orders of magnitude
    below its dominant terms (Coriolis ~ 2e-3)."""
    state = R.compute_moist_coefficients(model.state, model.mesh_arrays)
    save = R.rk_integration_setup(state)
    tend = T.compute_dyn_tend(state, save, model.static, model.mesh_arrays,
                              model.vert, model.namelist, 0, 720.0)
    assert float(jnp.abs(tend.tend_u).max()) < 1e-4
    assert float(jnp.abs(tend.tend_rho).max()) < 1e-5


def test_jw_stability_and_conservation(model):
    """Unperturbed JW stays bounded over 10 steps; dry mass is conserved."""
    S = model.state
    # conserved dry mass: integral of coupled density rho_zz over A * dzeta
    # (rho dV = rho_zz * zz * A * dz = rho_zz * A * dzw)
    vol = (np.asarray(model.vert.dzw)[:, None]
           * np.asarray(model.mesh_arrays.areaCell)[None, :])
    mass0 = (np.asarray(S.rho_zz) * vol).sum()
    u0 = np.asarray(S.u)
    for _ in range(10):
        S = model.step_fn(S)
    assert not bool(jnp.any(jnp.isnan(S.u)))
    assert float(jnp.abs(S.w).max()) < 0.5
    du = np.abs(np.asarray(S.u) - u0).max()
    assert du < 5.0, du
    mass1 = (np.asarray(S.rho_zz) * vol).sum()
    assert abs(mass1 - mass0) / mass0 < 1e-7


def test_bubble_decays(model):
    """A 1 K warm bubble on the resting base state must not amplify."""
    static = model.static
    base = _rest_state(model)
    th = base.theta_m.at[4, 100].add(1.0)    # level 4, cell 100
    rtp = th * base.rho_p + static.rho_base * (th - static.theta_base)
    S = base.replace(theta_m=th, rtheta_p=rtp)
    peak = 0.0
    for i in range(6):
        S = model.step_fn(S)
        peak = max(peak, float(jnp.abs(S.theta_m - static.theta_base).max()))
    assert peak < 1.5, peak


def test_output_diagnostics(model):
    out = D.output_diagnostics(model.state, model.static)
    p = np.asarray(out["pressure"])
    assert p.min() > 0 and p[0].max() < 1.1e5
    rho = np.asarray(out["rho"])
    assert rho.min() > 0 and rho[0].max() < 1.5


def test_dynamics_split_three():
    """config_dynamics_split_steps=3 (the MPAS default the reference sets to
    1 'temporarily', constants.rg:60) integrates stably."""
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.generator import generate_mesh
    mesh = generate_mesh(levels=3, lloyd_iterations=2)
    nl = Namelist(config_nvertlevels=6, config_ztop=30000.0, dtype="float64",
                  config_jw_u_perturbation=0.0, config_dynamics_split_steps=3)
    m = build_model(namelist=nl, mesh=mesh)
    for _ in range(3):
        m.step()
    s = m.summarize()
    assert not s["nan_detected"]
    assert abs(s["u_max"]) < 40.0 and abs(s["w_min"]) < 0.5


def test_apvm_upwinding(model):
    """APVM (Ringler et al. 2010 eq. 72; MPAS config_apvm_upwinding, skipped
    by the reference at rk_timestep.rg:453): the anticipated pv_edge is a
    bounded O(apvm*dt*|grad pv|*|vel|) perturbation of the centered value,
    and it vanishes for apvm=0."""
    nl = model.namelist
    d0 = D.compute_solve_diagnostics(model.state, model.mesh_arrays,
                                     reconstruct_v=True,
                                     apvm_upwinding=0.0, dt=nl.config_dt)
    d1 = D.compute_solve_diagnostics(model.state, model.mesh_arrays,
                                     reconstruct_v=True,
                                     apvm_upwinding=0.5, dt=nl.config_dt)
    pv0 = np.asarray(d0["pv_edge"])
    pv1 = np.asarray(d1["pv_edge"])
    dpv = np.abs(pv1 - pv0)
    assert dpv.max() > 0.0                      # it does something
    assert dpv.max() < 0.5 * np.abs(pv0).max()  # ...but stays a correction
    # a full step with APVM + Hollingsworth enabled stays finite & steady-ish
    from mpas_tpu.dynamics import srk3
    nl2 = nl.replace(config_apvm_upwinding=0.5, config_hollingsworth=True)
    S1 = srk3.atm_srk3(model.state, model.static, model.mesh_arrays,
                       model.vert, nl2, nl.config_dt)
    assert not bool(jnp.any(jnp.isnan(S1.u)))
    assert float(jnp.abs(S1.w).max()) < 0.5


def test_hollingsworth_ke(model):
    """The Hollingsworth KE blend runs and stays within the plain-KE scale."""
    d0 = D.compute_solve_diagnostics(model.state, model.mesh_arrays,
                                     hollingsworth=False, reconstruct_v=False)
    d1 = D.compute_solve_diagnostics(model.state, model.mesh_arrays,
                                     hollingsworth=True, reconstruct_v=False)
    import numpy as np
    r = float(np.abs(np.asarray(d1["ke"])).max() / np.abs(np.asarray(d0["ke"])).max())
    assert 0.5 < r < 1.5
