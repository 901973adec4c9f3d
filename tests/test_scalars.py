"""Scalar (moisture) transport tests: constancy preservation, monotonicity,
tracer mass conservation — the MPAS semantics the reference never finished."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.config import Namelist
from mpas_tpu.mesh.generator import generate_mesh
from mpas_tpu.ops import scalars as SC


@pytest.fixture(scope="module")
def small_model():
    from mpas_tpu.dynamics.model import build_model
    nl = Namelist(config_nvertlevels=6, config_ztop=30000.0, dtype="float64",
                  config_jw_u_perturbation=0.0, config_moisture=True,
                  config_scalar_advection=True)
    mesh = generate_mesh(levels=3, lloyd_iterations=3)
    return build_model(namelist=nl, mesh=mesh)


def _plume(model, amp=1.0):
    lat = np.asarray(model.mesh_arrays.latCell)
    lon = np.asarray(model.mesh_arrays.lonCell)
    d = np.arccos(np.clip(np.cos(lat) * np.cos(lon - np.pi), -1, 1))
    K = model.vgrid.nVertLevels
    # level-major [K, C]
    return amp * np.exp(-(d / 0.3) ** 2)[None, :] * np.ones((K, 1))


def test_constancy_preservation(small_model):
    m = small_model
    K, C = m.state.theta_m.shape
    S = m.state.replace(scalars=jnp.ones((1, K, C)))
    S1 = m.step_fn(S)
    assert float(jnp.abs(S1.scalars - 1.0).max()) < 1e-11


def test_fct_monotone_and_conservative(small_model):
    m = small_model
    mesh, vert, nl = m.mesh_arrays, m.vert, m.namelist
    q = jnp.asarray(_plume(m))[None]          # [1, K, C]
    ruAvg = m.state.ru
    wwAvg = jnp.zeros_like(m.state.rw)
    rho = m.state.rho_zz
    vol = np.asarray(vert.dzw)[:, None] * np.asarray(mesh.areaCell)[None, :]
    mass0 = (np.asarray(rho) * np.asarray(q[0]) * vol).sum()
    for _ in range(10):
        q, rho = SC.advance_scalars_mono(q, rho, ruAvg, wwAvg, mesh, vert,
                                         nl, 720.0)
    qn = np.asarray(q[0])
    assert qn.min() >= -1e-15
    assert qn.max() <= 1.0 + 1e-10
    mass1 = (np.asarray(rho) * qn * vol).sum()
    assert abs(mass1 - mass0) / mass0 < 1e-12


def test_third_order_conservative(small_model):
    m = small_model
    mesh, vert, nl = m.mesh_arrays, m.vert, m.namelist
    q = jnp.asarray(_plume(m))[None]          # [1, K, C]
    ruAvg = m.state.ru
    wwAvg = jnp.zeros_like(m.state.rw)
    rho = m.state.rho_zz
    vol = np.asarray(vert.dzw)[:, None] * np.asarray(mesh.areaCell)[None, :]
    mass0 = (np.asarray(rho) * np.asarray(q[0]) * vol).sum()
    for _ in range(5):
        q, rho = SC.advance_scalars(q, rho, ruAvg, wwAvg, mesh, vert, nl, 720.0)
    mass1 = (np.asarray(rho) * np.asarray(q[0]) * vol).sum()
    assert abs(mass1 - mass0) / mass0 < 1e-12


def test_moist_model_stable(small_model):
    m = small_model
    q0 = jnp.asarray(0.02 * _plume(m))[None]
    S = m.state.replace(scalars=q0)
    for _ in range(4):
        S = m.step_fn(S)
    qn = np.asarray(S.scalars[0])
    assert qn.min() >= -1e-12 and qn.max() <= 0.025
    assert not bool(jnp.any(jnp.isnan(S.u)))
