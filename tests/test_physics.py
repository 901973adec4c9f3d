"""Physics tests: saturation tables vs known values, radiation support
kernels, driver sanity."""

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
    assert np.all(qrl_day <= 0) and qrl_day.min() > -50.0
    assert np.all(np.isfinite(out["rthraten"]))
    assert np.all((out["cldfra"] >= 0) & (out["cldfra"] <= 1))


def test_vert_interpolate_conserves_column():
    cols, paerlev, naer = 4, 28, constants.naer
    m_hybi = np.linspace(0.0, 1.0, paerlev + 1)
    ps = np.full(cols, 1e5)
    # cumulative mass decreasing from total at top interface to 0 at surface?
    # reference convention: aerosolc[., 0, .] = total column mass
    total = 1e-4
    aerosolc = total * (1.0 - m_hybi)[None, :, None].repeat(cols, 0).repeat(naer, 2)
    pint = np.linspace(1e3, 1e5, 13)[None, :].repeat(cols, 0)
    mmr = RS.vert_interpolate(ps, aerosolc, m_hybi, pint)
    assert mmr.shape == (cols, 12, naer)
    assert np.all(np.isfinite(mmr))
