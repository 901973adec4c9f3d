"""Jablonowski-Williamson initial condition validation against the published
properties of the test case (JW QJRMS 2006): uniform 1000 hPa surface
pressure, 35 m/s midlatitude jets, hydrostatic balance."""

import jax.numpy as jnp
import numpy as np


def test_surface_pressure_uniform(model):
    sp = model.init_fields["surface_pressure"]
    np.testing.assert_allclose(sp, 1.0e5, rtol=1e-9)


def test_jet_structure(model):
    m = model.mesh
    u = model.init_fields["u"]
    umax = np.abs(u).max()
    assert 30.0 < umax < 38.0
    # jet maxima near +-45 degrees
    e, k = np.unravel_index(np.abs(u).argmax(), u.shape)
    assert 35.0 < abs(m.latEdge[e]) * 180 / np.pi < 55.0


def test_temperature_range(model):
    # JW temperatures: ~210-310 K below ~30 km
    from mpas_tpu import constants
    th = model.init_fields["theta_m"]
    ex = model.init_fields["exner"]
    temp = th * ex
    assert temp.min() > 180.0 and temp.max() < 320.0


def test_hydrostatic_balance(model):
    """The perturbation state satisfies the discrete hydrostatic relation used
    by the w equation (residual ~ 0)."""
    import mpas_tpu.ops.stencils as st
    from mpas_tpu import constants
    state, static, vert = model.state, model.static, model.vert
    C = state.theta_m.shape[1]               # level-major [K, C]
    dpdz = -constants.gravity * state.rho_p
    zero = jnp.zeros((1, C), state.theta_m.dtype)
    dpp = jnp.concatenate([zero, st.delta(state.pressure_p), zero], axis=0)
    dpdz_i = st.interface_interp(dpdz, vert.fzm, vert.fzp)
    resid = vert.rdzu[:, None] * dpp - dpdz_i
    # compare against the gravity term magnitude
    scale = float(jnp.abs(dpdz_i).max())
    assert float(jnp.abs(resid).max()) < 1e-9 * max(scale, 1.0)


def test_coupled_state_consistency(model):
    """init_coupled_diagnostics: exner/pressure recomputed from the EOS match
    the init iteration's values."""
    from mpas_tpu import constants
    st_ = model.state
    static = model.static
    rcv = constants.rcv
    ex = (static.zz * (constants.rgas / constants.p0)
          * (st_.rtheta_p + static.rtheta_base)) ** rcv
    np.testing.assert_allclose(np.asarray(st_.exner), np.asarray(ex), rtol=1e-10)


def test_w_small(model):
    w = model.init_fields["w"]
    assert np.abs(w).max() < 0.1
