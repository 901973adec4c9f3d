"""Kessler warm-rain microphysics tests: conservation, saturation
adjustment, sedimentation, and a coupled moist model run — the moisture
capability the reference leaves unfinished (SURVEY.md section 8)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu import constants
from mpas_tpu.config import Namelist
from mpas_tpu.mesh.generator import generate_mesh
from mpas_tpu.physics import kessler as mp


def _column(C=16, K=10):
    """Idealized tropical-ish columns, level-major [K, C]: warm below,
    cold aloft."""
    rng = np.random.default_rng(0)
    z = np.linspace(250.0, 14750.0, K)[:, None] * np.ones((1, C))
    t = 300.0 - 6.5e-3 * z
    p = 1.0e5 * (t / 300.0) ** (constants.gravity / (constants.rgas * 6.5e-3))
    exner = (p / constants.p0) ** (constants.rgas / constants.cp)
    theta = t / exner
    rho = p / (constants.rgas * t)
    dz = 1500.0 * np.ones((K, C))
    qv = 0.8 * mp.EP2 * 611.2 * np.exp(17.67 * (t - 273.15) / (t - 29.65)) / p
    qv += rng.uniform(0, 1e-4, (K, C))
    return (jnp.asarray(theta), jnp.asarray(qv), jnp.asarray(rho),
            jnp.asarray(exner), jnp.asarray(p), jnp.asarray(dz))


def test_saturation_adjustment_conserves_water_and_energy():
    theta, qv, rho, exner, p, dz = _column()
    qv = qv * 1.6                      # supersaturate
    qc = jnp.zeros_like(qv)
    qr = jnp.zeros_like(qv)
    th1, qv1, qc1, qr1, rain = mp.kessler(theta, qv, qc, qr, rho, exner, p,
                                          dz, dt=60.0, nfall=1)
    # water: qv + qc + qr conserved up to sedimented rain
    tot0 = (np.asarray(qv) * np.asarray(rho) * np.asarray(dz)).sum()
    tot1 = ((np.asarray(qv1) + np.asarray(qc1) + np.asarray(qr1))
            * np.asarray(rho) * np.asarray(dz)).sum() + np.asarray(rain).sum()
    assert abs(tot1 - tot0) / tot0 < 1e-12
    # condensation occurred and released heat
    assert float(qc1.sum()) > 0.0
    assert float((th1 - theta).min()) >= -1e-10
    assert float((th1 - theta).max()) > 0.01
    # latent heating consistent: cp*exner*dtheta = xlv*(condensed)
    dq = np.asarray(qv) - np.asarray(qv1)
    dth = np.asarray(th1 - theta)
    lhs = constants.cp * np.asarray(exner) * dth
    assert np.allclose(lhs, constants.xlv * dq, rtol=1e-6, atol=1e-9)


def test_subsaturated_no_condensation():
    theta, qv, rho, exner, p, dz = _column()
    t = np.asarray(theta) * np.asarray(exner)
    es = 611.2 * np.exp(17.67 * (t - 273.15) / (t - 29.65))
    qv = jnp.asarray(0.5 * mp.EP2 * es / (np.asarray(p) - es))
    qc = jnp.zeros_like(qv)
    qr = jnp.zeros_like(qv)
    th1, qv1, qc1, qr1, rain = mp.kessler(theta, qv, qc, qr, rho, exner, p,
                                          dz, dt=60.0, nfall=1)
    assert float(jnp.abs(qc1).max()) == 0.0
    assert float(jnp.abs(th1 - theta).max()) < 1e-10
    assert float(rain.max()) == 0.0


def test_sedimentation_conserves_and_rains_out():
    theta, qv, rho, exner, p, dz = _column()
    qr = jnp.zeros_like(qv).at[5].set(2e-3)       # rain shaft aloft
    col0 = (np.asarray(qr) * np.asarray(rho) * np.asarray(dz)).sum(axis=0)
    qr1, rain = mp._sediment(qr, rho, dz, dt=600.0, nfall=8)
    col1 = (np.asarray(qr1) * np.asarray(rho) * np.asarray(dz)).sum(axis=0)
    assert np.all(np.asarray(qr1) >= 0.0)
    np.testing.assert_allclose(col1 + np.asarray(rain), col0, rtol=1e-12)
    assert float(rain.max()) > 0.0                # some rain reached the ground
    # mass moved downward: level 5 lost, levels below gained
    assert float(qr1[5].max()) < 2e-3
    assert float(qr1[:5].max()) > 0.0


def test_autoconversion_threshold():
    theta, qv, rho, exner, p, dz = _column()
    qv = qv * 0.0                                  # dry air: no evaporation path? keep qv=0
    qc = jnp.full_like(theta, 2e-3)                # above the 1 g/kg threshold
    qr = jnp.zeros_like(theta)
    _, _, qc1, qr1, _ = mp.kessler(theta, qv, qc, qr, rho, exner, p, dz,
                                   dt=60.0, nfall=1)
    assert float(qr1.min()) > 0.0                  # rain produced
    below = mp.kessler(theta, qv, jnp.full_like(theta, 5e-4), qr, rho, exner,
                       p, dz, dt=60.0, nfall=1)
    # below threshold: autoconversion inactive (evaporation may still deplete)
    assert float(below[3].max()) < float(qr1.min())


@pytest.fixture(scope="module")
def moist_model():
    from mpas_tpu.dynamics.model import build_model
    nl = Namelist(config_nvertlevels=8, config_ztop=30000.0, dtype="float64",
                  config_jw_u_perturbation=0.0, config_moisture=True,
                  config_microphysics="kessler", config_dt=300.0)
    mesh = generate_mesh(levels=3, lloyd_iterations=3)
    return build_model(namelist=nl, mesh=mesh)


def test_moist_model_integrates(moist_model):
    m = moist_model
    assert m.state.scalars.shape[0] == 3          # species-major [nS, K, C]
    assert m.namelist.config_kessler_nfall >= 1
    assert m.namelist.config_scalar_advection
    s = m.state
    # seed a saturated warm blob near the surface to exercise the full loop
    qv = s.scalars[0] + 0.02 * jnp.exp(
        -((m.mesh_arrays.latCell[None, :]) / 0.3) ** 2) \
        * jnp.exp(-jnp.arange(s.theta_m.shape[0]) / 2.0)[:, None]
    s = s.replace(scalars=s.scalars.at[0].set(qv))
    for _ in range(3):
        s = m.step_fn(s)
    assert not bool(jnp.any(jnp.isnan(s.theta_m)))
    assert not bool(jnp.any(jnp.isnan(s.scalars)))
    assert float(s.scalars.min()) >= -1e-12       # positivity
    assert float(s.rainnc.min()) >= 0.0
    # condensation happened somewhere
    assert float(s.scalars[1].max()) > 0.0


def test_moist_coupling_uses_new_density():
    """Regression for the round-3 moist-coupling fix: apply_kessler must
    couple rtheta_p from the NEW density, not the old density the dynamics
    split restores for scalar transport.  With the old density the EOS
    rewrite injects an O(drho * theta) spurious perturbation every step and
    the 26-level moist JW blows up within ~30 steps (u_max 35 -> 90+); with
    the fix it holds the balanced jet."""
    from mpas_tpu.dynamics.model import build_model
    nl = Namelist(config_nvertlevels=26, config_ztop=30000.0, dtype="float32",
                  config_dt=450.0, config_jw_u_perturbation=0.0,
                  config_moisture=True, config_microphysics="kessler")
    mesh = generate_mesh(levels=3, lloyd_iterations=3)
    m = build_model(namelist=nl, mesh=mesh)
    s = m.state
    for _ in range(20):
        s = m.step_fn(s)
    u_max = float(jnp.abs(s.u).max())
    assert not bool(jnp.any(jnp.isnan(s.u)))
    assert u_max < 40.0, u_max
    assert float(jnp.abs(s.w).max()) < 1.0
