"""Surface-layer + YSU-lite PBL scheme (physics/pbl.py): flux signs,
conservation of the implicit diffusion, PBL-height diagnosis, mixing
behaviour, and a coupled smoke run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu import constants
from mpas_tpu.config import Namelist
from mpas_tpu.physics import pbl


def _column(K=20, C=4, ztop=4000.0, theta0=300.0, dth_dz=0.0, spd=5.0):
    z = np.linspace(0.0, ztop, K + 1)
    zgrid = jnp.asarray(np.repeat(z[:, None], C, 1), jnp.float32)
    zmid = 0.5 * (z[:-1] + z[1:])
    theta = jnp.asarray(np.repeat((theta0 + dth_dz * zmid)[:, None], C, 1),
                        jnp.float32)
    rho = jnp.ones((K, C), jnp.float32) * 1.0
    u2 = jnp.full((K, C), spd ** 2, jnp.float32)
    return zgrid, theta, rho, u2


def test_surface_fluxes_signs():
    zgrid, theta, rho, u2 = _column()
    nl = Namelist(config_sst=305.0)     # 5 K warmer skin -> upward heat flux
    km, kh, ustar, wth, drag = pbl.surface_and_kprofile(theta, u2, zgrid,
                                                        rho, nl)
    assert float(wth.min()) > 0.0
    assert float(ustar.min()) > 0.0
    assert float(drag.min()) > 0.0
    # cold skin -> downward flux, and stability damps the exchange
    nl2 = Namelist(config_sst=295.0)
    _, _, ustar2, wth2, _ = pbl.surface_and_kprofile(theta, u2, zgrid, rho, nl2)
    assert float(wth2.max()) < 0.0
    assert float(ustar2.max()) < float(ustar.max())


def test_pbl_height_tracks_inversion():
    K, C = 30, 2
    z = np.linspace(0, 3000.0, K + 1)
    zmid = 0.5 * (z[:-1] + z[1:])
    # well-mixed to 1 km, strong inversion above
    th = np.where(zmid < 1000.0, 300.0, 300.0 + 0.02 * (zmid - 1000.0))
    zgrid = jnp.asarray(np.repeat(z[:, None], C, 1), jnp.float32)
    theta = jnp.asarray(np.repeat(th[:, None], C, 1), jnp.float32)
    rho = jnp.ones((K, C), jnp.float32)
    u2 = jnp.full((K, C), 25.0, jnp.float32)
    nl = Namelist(config_sst=0.0)
    km, _, _, _, _ = pbl.surface_and_kprofile(theta, u2, zgrid, rho, nl)
    km = np.asarray(km)
    iz = np.argmax(km[:, 0])            # K peaks inside the PBL
    assert z[iz] < 1500.0
    # K is ~zero well above the diagnosed PBL (z > 2 km)
    assert km[z[:len(km)] > 2500.0, 0].max() < 1.0 + km[:, 0].max() * 0.02


def test_implicit_diffusion_conserves_and_relaxes():
    K, C = 20, 3
    z = np.linspace(0, 2000.0, K + 1)
    zgrid = jnp.asarray(np.repeat(z[:, None], C, 1), jnp.float32)
    rho = jnp.ones((K, C), jnp.float32)
    rho_i = jnp.ones((K + 1, C), jnp.float32)
    k_i = jnp.zeros((K + 1, C), jnp.float32).at[1:K].set(50.0)
    x = jnp.asarray(np.repeat(np.linspace(300.0, 310.0, K)[:, None], C, 1),
                    jnp.float32)
    dzw = np.diff(z)[:, None]
    for _ in range(5):
        x = pbl.implicit_diffusion(x, k_i, rho, rho_i, zgrid, 600.0)
    # interior diffusion conserves the column integral exactly (f32 roundoff)
    tot0 = (np.repeat(np.linspace(300.0, 310.0, K)[:, None], C, 1) * dzw).sum(0)
    tot1 = (np.asarray(x) * dzw).sum(0)
    np.testing.assert_allclose(tot1, tot0, rtol=1e-5)
    # and reduces the gradient monotonically
    assert float(x[-1, 0] - x[0, 0]) < 10.0


def test_surface_flux_heats_column_by_right_amount():
    K, C = 20, 2
    z = np.linspace(0, 2000.0, K + 1)
    zgrid = jnp.asarray(np.repeat(z[:, None], C, 1), jnp.float32)
    rho = jnp.ones((K, C), jnp.float32)
    rho_i = jnp.ones((K + 1, C), jnp.float32)
    k_i = jnp.zeros((K + 1, C), jnp.float32).at[1:K].set(20.0)
    x = jnp.full((K, C), 300.0, jnp.float32)
    wth = jnp.full((C,), 0.1, jnp.float32)          # K m/s kinematic flux
    dt = 300.0
    x1 = pbl.implicit_diffusion(x, k_i, rho, rho_i, zgrid, dt, sfc_flux=wth)
    dzw = np.diff(z)[:, None]
    added = ((np.asarray(x1) - 300.0) * dzw).sum(0)
    # f32: x ~ 300 has ~3e-5 absolute resolution, so the measured column
    # integral of the ~0.3 K perturbation carries ~5e-4 relative noise
    np.testing.assert_allclose(added, 0.1 * dt, rtol=2e-3)


def test_surface_drag_decelerates_only():
    K, C = 10, 2
    z = np.linspace(0, 1000.0, K + 1)
    zgrid = jnp.asarray(np.repeat(z[:, None], C, 1), jnp.float32)
    rho = jnp.ones((K, C), jnp.float32)
    rho_i = jnp.ones((K + 1, C), jnp.float32)
    k_i = jnp.zeros((K + 1, C), jnp.float32)
    u = jnp.full((K, C), 10.0, jnp.float32)
    u1 = pbl.implicit_diffusion(u, k_i, rho, rho_i, zgrid, 600.0,
                                sfc_drag=jnp.full((C,), 0.01, jnp.float32))
    u1 = np.asarray(u1)
    assert u1[0, 0] < 10.0              # lowest level slowed
    np.testing.assert_allclose(u1[1:], 10.0, rtol=1e-6)  # interior untouched
    assert u1[0, 0] > 0.0               # implicit drag cannot overshoot


def test_coupled_smoke_run():
    """JW + PBL over a warm ocean: stable for several steps, PBL heating
    visible in the lowest levels, no NaNs."""
    from mpas_tpu.dynamics.model import build_model
    nl = Namelist(config_nvertlevels=8, config_ztop=30000.0, dtype="float32",
                  config_jw_u_perturbation=1.0, config_dt=600.0,
                  config_pbl="ysu_lite", config_sst=302.0,
                  config_moisture=True, config_scalar_advection=True)
    m = build_model(namelist=nl)
    th0 = np.asarray(m.state.theta_m)[0].copy()
    m.step(3)
    s = m.summarize()
    assert not s["nan_detected"]
    assert s["wsp_max"] < 80.0
    th1 = np.asarray(m.state.theta_m)[0]
    # warm skin heats the lowest model level on average
    assert (th1 - th0).mean() > 0.0
