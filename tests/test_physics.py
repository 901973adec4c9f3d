"""Physics tests: saturation tables vs known values, radiation support
kernels, driver sanity."""

import os

import numpy as np
import pytest

from mpas_tpu import constants
from mpas_tpu.physics import driver as D
from mpas_tpu.physics import radiation_support as RS
from mpas_tpu.physics import tables as T


@pytest.fixture(scope="module")
def sat_tables():
    return T.camradinit()


def test_goff_gratch_known_values(sat_tables):
    # es at the triple point = 611 Pa; es(300 K) ~ 3535 Pa; es(373.16) ~ 1 atm
    es = T.estblf(np.array([273.16, 300.0, 373.15]), sat_tables)
    assert abs(es[0] - 611.0) < 2.0
    assert abs(es[1] - 3535.0) < 30.0
    assert abs(es[2] - 101325.0) < 500.0


def test_estbl_table_monotone(sat_tables):
    tb = sat_tables
    e = tb.estbl[:tb.lentbl]
    assert np.all(np.diff(e) > 0)         # es strictly increasing in T
    assert tb.estbl[tb.lentbl] == -99999.0  # sentinel beyond table


def test_estblh2o_water_only(sat_tables):
    # the H2O path table is water-phase only: continuous through freezing
    t = np.arange(round(constants.min_tp_h2o) - 1, round(constants.max_tp_h2o) + 1)
    e = sat_tables.estblh2o[:len(t)]
    assert np.all(np.diff(e) > 0)


def test_aqsat_bounds(sat_tables):
    t = np.array([[200.0, 280.0, 320.0]])
    p = np.array([[1e4, 9e4, 1.02e5]])
    esat, qsat = T.aqsat(t, p, sat_tables)
    assert np.all(qsat > 0) and np.all(qsat <= 1.0)


def test_getfactors_sum_to_one():
    f1, f2 = RS.getfactors(True, 3, 75.0, 105.0, 90.0)
    assert abs(f1 + f2 - 1.0) < 1e-12
    # year-start wrap (the case that fails in the reference's output.txt)
    f1, f2 = RS.getfactors(True, 0, 350.0, 16.0, 1.0)
    assert abs(f1 + f2 - 1.0) < 1e-12 and 0 <= f1 <= 1 and 0 <= f2 <= 1


def test_oznint_interpolates():
    ozmixm = np.arange(12, dtype=float)[:, None] * np.ones((12, 5))
    o = RS.oznint(100.0, ozmixm)          # between Apr (105) and Mar (75)
    assert 2.0 <= o[0] <= 4.0


def test_radozn_matches_linear():
    pin = np.array([100.0, 1000.0, 10000.0, 100000.0])
    ozmix = np.log(pin)[None, :].repeat(3, 0)
    pmid = np.array([[500.0, 5000.0, 50000.0]]).repeat(3, 0)
    o3 = RS.radozn(pmid, pin, ozmix)
    # linear-in-p interpolation of log(p) lands between bracketing values
    assert np.all(o3 > np.log(np.array([100, 1000, 10000]))[None, :])
    assert np.all(o3 < np.log(np.array([1000, 10000, 100000]))[None, :])


def test_radconst_solstices():
    d_summer, s1 = RS.radconst(172.0)
    d_winter, s2 = RS.radconst(355.0)
    assert abs(np.degrees(d_summer) - 23.5) < 0.5
    assert abs(np.degrees(d_winter) + 23.5) < 0.8
    assert 1320 < s1 < 1420 and 1320 < s2 < 1420


def test_cldfraction_limits():
    qsat = np.full((2, 3), 0.01)
    assert np.all(D.calc_cldfraction(np.zeros((2, 3)), qsat) == 0.0)
    assert np.all(D.calc_cldfraction(qsat.copy(), qsat) == 1.0)


def test_physics_driver_end_to_end():
    phys = D.physics_init()
    C, K = 16, 12
    theta = np.linspace(285, 600, K)[None, :].repeat(C, 0)
    exner = np.linspace(1.0, 0.35, K)[None, :].repeat(C, 0)
    pres = np.linspace(1.0e5, 1.0e4, K)[None, :].repeat(C, 0)
    state = dict(theta_m=theta, exner=exner, pressure=pres,
                 surface_pressure=np.full(C, 1.013e5),
                 qv=np.full((C, K), 3e-3))

    class M:
        latCell = np.linspace(-1.4, 1.4, C)
        lonCell = np.zeros(C)

    out = D.physics_driver(phys, state, M, julian=80.25)
    qrs_day = out["qrs"] * 86400
    qrl_day = out["qrl"] * 86400
    assert np.all(qrs_day >= 0) and qrs_day.max() < 200.0
    # LW: net column cooling; individual layers may warm (surface-emission
    # absorption in the lowest layer, CO2/O3 warming near the model top)
    assert qrl_day.mean() < 0.0
    assert qrl_day.min() > -50.0 and qrl_day.max() < 20.0
    assert np.all(np.isfinite(out["rthraten"]))
    assert np.all((out["cldfra"] >= 0) & (out["cldfra"] <= 1))
    # energy bookkeeping: TOA SW absorbed = incoming - reflected >= surface
    assert np.all(out["fsnt"] + 1e-6 >= out["fsns"] - 1e-6)
    assert np.all(out["olr"] > 100.0) and np.all(out["olr"] < 400.0)


def test_vert_interpolate_conserves_column():
    """Per-layer masses recovered from the interpolated mmr must sum to the
    climatological column burden, with nonzero interior layers (ADVICE r2:
    the endpoint-flipped version dumped all mass into the two boundary
    layers)."""
    cols, paerlev, naer = 4, 28, constants.naer
    m_hybi = np.linspace(0.0, 1.0, paerlev + 1)
    ps = np.full(cols, 1e5)
    # data convention: aerosolc[k] = mass below data interface k
    # (aerosolc[0] = column total at the data top, aerosolc[-1] = 0)
    total = 1e-4
    aerosolc = total * (1.0 - m_hybi)[None, :, None].repeat(cols, 0).repeat(naer, 2)
    # model interfaces bottom-up: pint[:, 0] = surface
    pint = np.linspace(1e5, 1e3, 13)[None, :].repeat(cols, 0)
    g = constants.gravity
    mmr = RS.vert_interpolate(ps, aerosolc, m_hybi, pint)
    assert mmr.shape == (cols, 12, naer)
    assert np.all(np.isfinite(mmr)) and np.all(mmr >= 0)
    # recovered per-layer mass sums to the burden above the model top
    # subtracted from the total (model top at 1e3 Pa -> eta=0.01)
    layer_mass = mmr * (pint[:, :-1] - pint[:, 1:])[:, :, None] / g
    col = layer_mass.sum(axis=1)
    np.testing.assert_allclose(col, total * (1.0 - 0.01), rtol=1e-6)
    # interior layers carry mass (not just the two boundary layers)
    assert np.all(layer_mass[:, 3:9] > 0)

    # jnp variant agrees with the numpy oracle
    import jax.numpy as jnp
    mmr_j = np.asarray(RS.vert_interpolate_j(
        jnp.asarray(ps), jnp.asarray(aerosolc[0]), jnp.asarray(m_hybi),
        jnp.asarray(pint)))
    np.testing.assert_allclose(mmr_j, mmr, rtol=1e-5, atol=1e-12)


class TestColumnBenchmarks:
    """Clear-sky column validation against published ICRCCM-class LBL
    benchmarks (Ellingson et al. 1991 / Clough et al.) on McClatchey
    standard atmospheres — the VERDICT item-7 acceptance test for the
    multi-band solver replacing the reference's radcswmx/radclwmx stubs."""

    # (atmosphere, OLR target, DLR target) W/m^2, tolerance +-4%
    LW_CASES = [("tropical", 288.0, 395.0),
                ("midlat_summer", 280.0, 345.0),
                ("subarctic_winter", 200.0, 163.0)]

    @pytest.fixture(scope="class")
    def columns(self):
        import jax.numpy as jnp
        from mpas_tpu.physics.standard_atmospheres import standard_atmosphere
        out = {}
        for kind, _, _ in self.LW_CASES:
            atm = standard_atmosphere(kind)
            out[kind] = {k: (jnp.asarray(v)[None] if np.ndim(v) else v)
                         for k, v in atm.items()}
        return out

    @pytest.mark.parametrize("kind,olr_t,dlr_t", LW_CASES)
    def test_lw_clear_sky(self, columns, kind, olr_t, dlr_t):
        import jax.numpy as jnp
        from mpas_tpu.physics import radiation as R
        a = columns[kind]
        z = jnp.zeros_like(a["t"])
        out = R.lw_fluxes(a["t"], a["q"], a["o3"], a["pmid"], a["pint"],
                          z, z, jnp.full(1, a["t_sfc"]))
        assert abs(float(out["olr"][0]) / olr_t - 1.0) < 0.04, float(out["olr"][0])
        assert abs(float(out["lwdnb"][0]) / dlr_t - 1.0) < 0.04, float(out["lwdnb"][0])

    def test_lw_tropospheric_cooling(self, columns):
        """Tropical clear-sky LW cooling ~2 K/day through the troposphere
        (the canonical LBL profile)."""
        import jax.numpy as jnp
        from mpas_tpu.physics import radiation as R
        a = columns["tropical"]
        z = jnp.zeros_like(a["t"])
        out = R.lw_fluxes(a["t"], a["q"], a["o3"], a["pmid"], a["pint"],
                          z, z, jnp.full(1, a["t_sfc"]))
        cool = np.asarray(out["qrl"][0]) * 86400.0
        assert -3.0 < cool[4:14].mean() < -1.0, cool[4:14].mean()

    def test_co2_doubling_forcing(self, columns):
        """Instantaneous clear-sky TOA forcing of 2xCO2 ~ -4 W/m^2 (LBL
        range -3..-5.5)."""
        import jax.numpy as jnp
        from mpas_tpu.physics import radiation as R
        a = columns["tropical"]
        z = jnp.zeros_like(a["t"])
        kw = (a["t"], a["q"], a["o3"], a["pmid"], a["pint"], z, z,
              jnp.full(1, a["t_sfc"]))
        olr1 = float(R.lw_fluxes(*kw)["olr"][0])
        old = R.CO2_VMR
        try:
            R.CO2_VMR = 2 * old
            olr2 = float(R.lw_fluxes(*kw)["olr"][0])
        finally:
            R.CO2_VMR = old
        assert -5.5 < olr2 - olr1 < -2.5, olr2 - olr1

    def test_sw_clear_sky(self, columns):
        """Clear-sky SW at mu0=0.5: planetary albedo 10-20%, atmospheric
        absorption 15-25% (LH74 Table 3 range), stratospheric ozone heating
        peak 2-12 K/day, tropospheric H2O heating 0.5-2.5 K/day."""
        import jax.numpy as jnp
        from mpas_tpu.physics import radiation as R
        a = columns["tropical"]
        z = jnp.zeros_like(a["t"])
        rel, rei = R.cldefr(a["t"])
        out = R.sw_fluxes(jnp.full(1, 0.5), 1365.0, a["pmid"], a["pint"],
                          a["q"], a["o3"], z, z, rel, rei,
                          R.ice_fraction(a["t"]))
        solin = float(out["solin"][0])
        albedo_p = float(out["swup_toa"][0]) / solin
        absorbed = (solin - float(out["swup_toa"][0]) - float(out["fsns"][0])) / solin
        assert 0.10 < albedo_p < 0.22, albedo_p
        assert 0.13 < absorbed < 0.27, absorbed
        qrs = np.asarray(out["qrs"][0]) * 86400.0
        assert 2.0 < qrs[30:].max() < 12.0, qrs[30:].max()   # O3 strato peak
        assert 0.4 < qrs[:14].mean() < 2.5, qrs[:14].mean()

    def test_cloud_effects_signs(self, columns):
        """A thick low cloud raises planetary albedo, cuts surface SW,
        reduces OLR and raises DLR (all four canonical cloud signatures)."""
        import jax.numpy as jnp
        from mpas_tpu.physics import radiation as R
        a = columns["tropical"]
        K = a["t"].shape[1]
        clr = jnp.zeros_like(a["t"])
        cld = clr.at[:, 3:5].set(0.9)
        cwp = clr.at[:, 3:5].set(120.0)
        rel, rei = R.cldefr(a["t"])
        fice = R.ice_fraction(a["t"])
        emis = R.cldems(cwp, rei, fice)
        args = (jnp.full(1, 0.5), 1365.0, a["pmid"], a["pint"], a["q"],
                a["o3"])
        sw0 = R.sw_fluxes(*args, clr, clr, rel, rei, fice)
        sw1 = R.sw_fluxes(*args, cld, cwp, rel, rei, fice)
        lw0 = R.lw_fluxes(a["t"], a["q"], a["o3"], a["pmid"], a["pint"],
                          clr, clr, jnp.full(1, a["t_sfc"]))
        lw1 = R.lw_fluxes(a["t"], a["q"], a["o3"], a["pmid"], a["pint"],
                          emis, cld, jnp.full(1, a["t_sfc"]))
        assert float(sw1["swup_toa"][0]) > 2.0 * float(sw0["swup_toa"][0])
        assert float(sw1["fsns"][0]) < 0.6 * float(sw0["fsns"][0])
        assert float(lw1["olr"][0]) < float(lw0["olr"][0]) - 10.0
        assert float(lw1["lwdnb"][0]) > float(lw0["lwdnb"][0]) + 10.0

    def test_sw_energy_conservation(self, columns):
        """reflected + absorbed(atm) + absorbed(sfc) == incoming."""
        import jax.numpy as jnp
        from mpas_tpu.physics import radiation as R
        a = columns["tropical"]
        g, cp = 9.80665, 1004.64
        z = jnp.zeros_like(a["t"])
        cld = z.at[:, 6:8].set(0.5)
        cwp = z.at[:, 6:8].set(80.0)
        rel, rei = R.cldefr(a["t"])
        out = R.sw_fluxes(jnp.full(1, 0.7), 1365.0, a["pmid"], a["pint"],
                          a["q"], a["o3"], cld, cwp, rel, rei,
                          R.ice_fraction(a["t"]))
        dp = np.abs(np.asarray(a["pint"])[0, :-1] - np.asarray(a["pint"])[0, 1:])
        atm_abs = (np.asarray(out["qrs"][0]) * cp * dp / g).sum()
        total = (float(out["swup_toa"][0]) + atm_abs + float(out["fsns"][0]))
        assert abs(total / float(out["solin"][0]) - 1.0) < 0.02, total


RADRUN = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                      "validation", "jw_radiation_10242.npz")


@pytest.mark.skipif(not os.path.exists(RADRUN),
                    reason="radiation-coupled run artifact not generated")
class TestRadiationCoupledRun:
    """BASELINE.json config 4: the full radiation chain (cloud fraction ->
    cloud optics -> delta-Eddington SW + k-distribution LW) coupled into
    the moist dycore at x1.10242, hourly cadence
    (tools/radiation_coupled_run.py, generated on TPU)."""

    @pytest.fixture(scope="class")
    def art(self):
        return np.load(RADRUN)

    def test_radiative_heating_active_and_radiative_scale(self, art):
        """rt_diabatic_tend is nonzero everywhere the driver ran and sits
        at radiative magnitudes (0.1-100 K/day), not dynamical ones."""
        rt = art["rt_diabatic_tend"] * 86400.0       # K/day
        assert np.isfinite(rt).all()
        assert 0.1 < np.abs(rt).max() < 100.0, np.abs(rt).max()
        series = art["rt_amp_series"]
        assert (series > 1e-7).all()                 # every applied interval

    def test_clear_sky_atmosphere_cools_on_net(self, art):
        """Global-mean net radiative tendency of the troposphere is a
        COOLING (LW cooling exceeds SW absorption in the global mean) —
        the basic radiative-convective fact the column benchmarks
        (docs/VALIDATION.md) pin per-profile."""
        rt = art["rt_diabatic_tend"] * 86400.0       # [K, C] K/day
        K = rt.shape[0]
        tropo = rt[: int(0.6 * K)]
        assert tropo.mean() < -0.2, tropo.mean()
        assert tropo.mean() > -5.0

    def test_dynamics_stable_under_coupling(self, art):
        assert np.isfinite(art["u"]).all() and np.isfinite(art["w"]).all()
        assert np.abs(art["u"]).max() < 80.0
        assert np.abs(art["w"]).max() < 1.0
        assert art["qv"].min() >= -1e-10
