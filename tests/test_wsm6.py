"""WSM6-lite ice microphysics tests: conservation, positivity, phase
behavior, and coupled-model stability (physics/wsm6.py; the reference has
no microphysics at all — SURVEY.md section 8)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mpas_tpu import constants
from mpas_tpu.physics import wsm6

K, C = 20, 8
DT = 120.0


def _columns(t_sfc):
    """Synthetic hydrostatic-ish columns with surface temperature t_sfc."""
    rng = np.random.default_rng(0)
    z = np.linspace(250.0, 15000.0, K)[:, None] * np.ones((K, C))
    t = t_sfc - 6.5e-3 * z
    p = 1.0e5 * np.exp(-z / 8000.0)
    exner = (p / 1.0e5) ** (constants.rgas / constants.cp)
    theta = t / exner
    rho = p / (constants.rgas * t)
    dz = np.full((K, C), 15000.0 / K)
    qv = 0.8 * wsm6._qsat(wsm6.saturation_pressures(t)[0], p)
    qc = np.where(z < 4000.0, 2e-4, 0.0) * (1 + 0.1 * rng.random((K, C)))
    qr = np.zeros((K, C))
    qi = np.zeros((K, C))
    qs = np.zeros((K, C))
    return map(jnp.asarray, (theta, qv, qc, qr, qi, qs, rho, exner, p, dz))


def _total_water(qv, qc, qr, qi, qs, rho, dz):
    return np.sum(np.asarray(rho) * np.asarray(dz)
                  * np.asarray(qv + qc + qr + qi + qs), axis=0)


def _moist_enthalpy(theta, qv, qi, qs, exner):
    t = np.asarray(theta) * np.asarray(exner)
    return (constants.cp * t + constants.xlv * np.asarray(qv)
            - constants.xlf * (np.asarray(qi) + np.asarray(qs)))


@pytest.mark.parametrize("t_sfc", [300.0, 270.0, 285.0])
def test_water_and_enthalpy_conservation(t_sfc):
    """With no precipitating mass present at call time (sedimentation runs
    first), one update conserves column total water exactly and the moist
    enthalpy cp*T + Lv*qv - Lf*(qi+qs) pointwise (every phase change pairs
    its latent heat consistently)."""
    theta, qv, qc, qr, qi, qs, rho, exner, p, dz = _columns(t_sfc)
    w0 = _total_water(qv, qc, qr, qi, qs, rho, dz)
    h0 = _moist_enthalpy(theta, qv, qi, qs, exner)
    out = wsm6.wsm6lite(theta, qv, qc, qr, qi, qs, rho, exner, p, dz, DT,
                        nfall=4)
    theta2, qv2, qc2, qr2, qi2, qs2, rain, snow = out
    w1 = _total_water(qv2, qc2, qr2, qi2, qs2, rho, dz) \
        + np.asarray(rain) + np.asarray(snow)
    np.testing.assert_allclose(w1, w0, rtol=1e-10)
    h1 = _moist_enthalpy(theta2, qv2, qi2, qs2, exner)
    np.testing.assert_allclose(h1, h0, rtol=1e-9)


def test_positivity():
    theta, qv, qc, qr, qi, qs, rho, exner, p, dz = _columns(275.0)
    qr = qr + 1e-4
    qs = qs + 2e-4
    for _ in range(5):
        theta, qv, qc, qr, qi, qs, _, _ = wsm6.wsm6lite(
            theta, qv, qc, qr, qi, qs, rho, exner, p, dz, DT, nfall=4)
    for q in (qv, qc, qr, qi, qs):
        assert float(jnp.min(q)) >= 0.0


def test_cold_supersaturation_makes_ice_not_liquid():
    theta, qv, qc, qr, qi, qs, rho, exner, p, dz = _columns(250.0)
    qc = jnp.zeros_like(qc)
    qv = qv * 1.6                         # ice-supersaturated everywhere
    out = wsm6.wsm6lite(theta, qv, qc, qr, qi, qs, rho, exner, p, dz, DT,
                        nfall=4)
    _, qv2, qc2, _, qi2, qs2, _, _ = out
    assert float(jnp.max(qi2 + qs2)) > 1e-7     # ice formed
    assert float(jnp.sum(qv2)) < float(jnp.sum(qv))


def test_snow_melts_in_warm_air_with_cooling():
    theta, qv, qc, qr, qi, qs, rho, exner, p, dz = _columns(305.0)
    qv = 0.2 * qv                         # subsaturated: no condensation heat
    qc = jnp.zeros_like(qc)
    # inject snow below 3 km where T ~ 290-305 K, zero fall speed region
    qs = jnp.where(jnp.asarray(np.linspace(250, 15000, K))[:, None] < 3000.0,
                   2e-4, 0.0) * jnp.ones_like(qs)
    t_before = np.asarray(theta * exner)
    out = wsm6.wsm6lite(theta, qv, qc, qr, jnp.zeros_like(qi), qs, rho,
                        exner, p, dz, DT, nfall=4)
    theta2, _, _, qr2, _, qs2, _, _ = out
    low = np.linspace(250, 15000, K) < 3000.0
    assert float(jnp.sum(qr2[low])) > 0.0               # melt -> rain
    assert float(jnp.sum(qs2[low])) < float(jnp.sum(qs[low]))
    # melting cools (where rain evaporation is not dominant the low-level
    # mean temperature drops)
    t_after = np.asarray(theta2 * exner)
    assert t_after[low].mean() < t_before[low].mean()


class TestFullWSM6:
    """The 6-class scheme with prognostic graupel (wsm6full)."""

    @pytest.mark.parametrize("t_sfc", [300.0, 270.0, 285.0])
    def test_water_and_enthalpy_conservation(self, t_sfc):
        """Total water (incl. graupel + all precip streams) conserved
        exactly; COLUMN-INTEGRATED moist enthalpy
        sum rho dz (cp T + Lv qv - Lf (qi+qs+qg)) conserved up to the
        -Lf payload of the graupel that sediments out the surface (graupel
        is present at call time, so the pointwise form of the lite test
        does not apply: sedimentation relocates -Lf qg between levels)."""
        theta, qv, qc, qr, qi, qs, rho, exner, p, dz = _columns(t_sfc)
        qg = jnp.where(jnp.asarray(np.linspace(250, 15000, K))[:, None]
                       > 5000.0, 1e-4, 0.0) * jnp.ones_like(qs)
        w0 = _total_water(qv, qc, qr, qi, qs + qg, rho, dz)
        rdz = np.asarray(rho) * np.asarray(dz)
        h0 = np.sum(rdz * (_moist_enthalpy(theta, qv, qi, qs, exner)
                           - constants.xlf * np.asarray(qg)), axis=0)
        out = wsm6.wsm6full(theta, qv, qc, qr, qi, qs, qg, rho, exner, p,
                            dz, DT, nfall=4)
        theta2, qv2, qc2, qr2, qi2, qs2, qg2, rain, snow, graup = out
        w1 = (_total_water(qv2, qc2, qr2, qi2, qs2 + qg2, rho, dz)
              + np.asarray(rain) + np.asarray(snow) + np.asarray(graup))
        np.testing.assert_allclose(w1, w0, rtol=1e-10)
        h1 = np.sum(rdz * (_moist_enthalpy(theta2, qv2, qi2, qs2, exner)
                           - constants.xlf * np.asarray(qg2)), axis=0)
        # graupel leaving the column carries enthalpy -Lf per unit mass
        h1 = h1 - constants.xlf * np.asarray(graup)
        np.testing.assert_allclose(h1, h0, rtol=1e-9)

    def test_positivity(self):
        theta, qv, qc, qr, qi, qs, rho, exner, p, dz = _columns(275.0)
        qr = qr + 1e-4
        qs = qs + 2e-4
        qg = qs * 0.5
        for _ in range(5):
            theta, qv, qc, qr, qi, qs, qg, _, _, _ = wsm6.wsm6full(
                theta, qv, qc, qr, qi, qs, qg, rho, exner, p, dz, DT,
                nfall=4)
        for q in (qv, qc, qr, qi, qs, qg):
            assert float(jnp.min(q)) >= 0.0

    def test_supercooled_rain_freezes_to_graupel(self):
        """Bigg immersion freezing: supercooled rain in a cold column
        becomes graupel, warming the air (latent heat of fusion)."""
        theta, qv, qc, qr, qi, qs, rho, exner, p, dz = _columns(250.0)
        qv = qv * 0.5
        qc = jnp.zeros_like(qc)
        z = np.linspace(250, 15000, K)[:, None]
        qr = jnp.where(jnp.asarray(z) > 6000.0, 5e-4, 0.0) * jnp.ones_like(qr)
        qg = jnp.zeros_like(qs)
        t_before = np.asarray(theta * exner)
        out = wsm6.wsm6full(theta, qv, qc, qr, qi, qs, qg, rho, exner, p,
                            dz, 600.0, nfall=4)
        theta2, _, _, qr2, _, _, qg2, _, _, _ = out
        high = z[:, 0] > 6000.0
        assert float(jnp.sum(qg2[high])) > 1e-6          # graupel formed
        assert float(jnp.sum(qr2[high])) < float(jnp.sum(qr[high]))
        t_after = np.asarray(theta2 * exner)
        assert t_after[high].mean() > t_before[high].mean()   # fusion heat

    def test_graupel_melts_to_rain(self):
        theta, qv, qc, qr, qi, qs, rho, exner, p, dz = _columns(305.0)
        qv = 0.2 * qv
        qc = jnp.zeros_like(qc)
        z = np.linspace(250, 15000, K)[:, None]
        qg = jnp.where(jnp.asarray(z) < 3000.0, 2e-4, 0.0) * jnp.ones_like(qs)
        out = wsm6.wsm6full(theta, qv, qc, qr, jnp.zeros_like(qi),
                            jnp.zeros_like(qs), qg, rho, exner, p, dz, DT,
                            nfall=4)
        _, _, _, qr2, _, _, qg2, _, _, _ = out
        low = z[:, 0] < 3000.0
        assert float(jnp.sum(qr2[low])) > 0.0
        assert float(jnp.sum(qg2[low])) < float(jnp.sum(qg[low]))

    def test_graupel_falls_faster_than_snow(self):
        """The Hong-Lim graupel fall law exceeds the snow law at equal
        content (denser particles) — the reason graupel reaches the surface
        where snow would drift."""
        rho = jnp.full((K, 1), 1.0)
        q = jnp.full((K, 1), 2e-3)
        vg = np.asarray(wsm6._graupel_fall_velocity(q, rho))
        vs = np.asarray(wsm6._snow_fall_velocity(q, rho))
        assert (vg > vs).all(), (vg.max(), vs.max())
        assert vg.max() < wsm6.MAX_VT_GRAUPEL

    def test_wet_growth_cap_limits_freezing(self):
        """Near 0 C with heavy liquid, the heat-balance cap keeps the
        freezing-induced warming from overshooting T0 by more than the
        linearization error."""
        theta, qv, qc, qr, qi, qs, rho, exner, p, dz = _columns(278.0)
        qv = qv * 0.5
        z = np.linspace(250, 15000, K)[:, None]
        band = jnp.asarray((z > 3000.0) & (z < 6000.0))   # t slightly < T0
        qr = jnp.where(band, 5e-3, 0.0) * jnp.ones_like(qr)
        qc = jnp.where(band, 2e-3, 0.0) * jnp.ones_like(qc)
        qg = jnp.where(band, 5e-3, 0.0) * jnp.ones_like(qs)
        out = wsm6.wsm6full(theta, qv, qc, qr, qi, qs, qg, rho, exner, p,
                            dz, 600.0, nfall=4)
        t2 = np.asarray(out[0]) * np.asarray(exner)
        sel = np.asarray(band)[:, 0]              # [K] level mask
        # freezing heat may bring cold air up to ~T0 but not meaningfully past
        assert t2[sel].max() < wsm6.T0 + 0.5, t2[sel].max()

    def test_coupled_run_stable(self):
        """JW moist run with full WSM6 in the jitted step: 6 species,
        stable, nonnegative, finite precip accumulation."""
        from mpas_tpu.config import Namelist
        from mpas_tpu.dynamics.model import build_model
        from mpas_tpu.mesh.generator import generate_mesh
        nl = Namelist(config_nvertlevels=10, config_ztop=30000.0,
                      dtype="float64", config_dt=480.0, config_moisture=True,
                      config_microphysics="wsm6",
                      config_jw_u_perturbation=1.0)
        mesh = generate_mesh(levels=3, lloyd_iterations=3)
        m = build_model(namelist=nl, mesh=mesh)
        assert m.state.scalars.shape[0] == 6
        m.step(30)
        s = m.summarize()
        assert not s["nan_detected"], s
        scal = np.asarray(m.state.scalars)
        assert np.isfinite(scal).all()
        assert scal.min() >= -1e-12
        assert float(np.asarray(m.state.rainnc).min()) >= 0.0


def test_coupled_moist_run_stable():
    """JW moist run with WSM6-lite in the jitted step: stable, finite,
    nonnegative species, some cloud/precip activity."""
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.generator import generate_mesh
    nl = Namelist(config_nvertlevels=10, config_ztop=30000.0, dtype="float64",
                  config_dt=480.0, config_moisture=True,
                  config_microphysics="wsm6lite",
                  config_jw_u_perturbation=1.0)
    mesh = generate_mesh(levels=3, lloyd_iterations=3)
    m = build_model(namelist=nl, mesh=mesh)
    assert m.state.scalars.shape[0] == 5
    m.step(30)
    s = m.summarize()
    assert not s["nan_detected"], s
    scal = np.asarray(m.state.scalars)
    assert np.isfinite(scal).all()
    assert scal.min() >= -1e-12
    assert scal[0].max() > 1e-4            # vapor present
    assert float(np.asarray(m.state.rainnc).min()) >= 0.0
