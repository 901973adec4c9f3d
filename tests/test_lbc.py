"""LBC reader + Davies relaxation (VERDICT r2 item 5): a regional run
driven by boundary data saved from a global run must reproduce the global
interior.

The zones were scaffolding in round 2 (tests/test_regional.py); this wires
data through them: global 642-cell perturbed JW run -> LBC stream of the
NH-cap boundary zone -> regional run on the same mesh with the specified
zone hard-set and the relaxation rings Davies-blended from the
time-interpolated stream.  24 h later the regional interior matches the
global interior far below the flow's own signal.

Reference anchor: the bdyMaskCell kernel gates the reference carries but
never feeds (/root/reference/dynamics/dynamics_tasks.rg:1503-1538).
"""

import numpy as np
import pytest

from mpas_tpu.config import Namelist
from mpas_tpu.io import lbc as L
from mpas_tpu.mesh.generator import generate_mesh

DT = 480.0
N_STEPS = 180          # 24 h
LBC_EVERY = 3          # snapshot interval (24 min)
K = 6


@pytest.fixture(scope="module")
def marked_mesh():
    from mpas_tpu.mesh.coefficients import mark_regional_zones
    m = generate_mesh(levels=3, lloyd_iterations=3)
    interior = m.latCell > 0.15
    return mark_regional_zones(m, interior, n_relax=5)


@pytest.fixture(scope="module")
def global_run(marked_mesh):
    """(final global state, LBCStream, initial state) of the driving run."""
    from mpas_tpu.dynamics.model import build_model
    nl = Namelist(config_nvertlevels=K, config_ztop=30000.0, dtype="float64",
                  config_dt=DT, config_jw_u_perturbation=1.0)
    m = build_model(namelist=nl, mesh=marked_mesh)
    cells, edges = L.zone_indices(marked_mesh)
    times, snaps = [], []
    s0 = m.state
    times.append(0.0)
    snaps.append(L.extract_lbc(m.state, cells, edges))
    for i in range(N_STEPS):
        m.step()
        if (i + 1) % LBC_EVERY == 0:
            times.append((i + 1) * DT)
            snaps.append(L.extract_lbc(m.state, cells, edges))
    stream = L.build_stream(times, cells, edges, snaps)
    return m.state, stream, s0


def test_stream_roundtrip(global_run, tmp_path):
    _, stream, _ = global_run
    p = str(tmp_path / "lbc.npz")
    L.write_lbc(p, stream)
    back = L.read_lbc(p)
    np.testing.assert_array_equal(back.times, stream.times)
    np.testing.assert_array_equal(back.cells, stream.cells)
    for n in L.CELL_FIELDS:
        np.testing.assert_array_equal(back.cell_data[n], stream.cell_data[n])
    for n in L.EDGE_FIELDS:
        np.testing.assert_array_equal(back.edge_data[n], stream.edge_data[n])


def test_davies_weights(marked_mesh):
    w = L.davies_weights(marked_mesh.bdyMaskCell, 5)
    bdy = marked_mesh.bdyMaskCell
    assert (w[bdy == 0] == 0.0).all()
    assert (w[bdy == 6] == 1.0).all()
    # monotone decay across the relaxation rings
    means = [w[bdy == r].mean() for r in range(1, 6)]
    assert all(a > b for a, b in zip(means, means[1:]))
    assert means[0] == 1.0                      # ring 1 fully nudged


def test_regional_matches_global_interior(global_run, marked_mesh):
    from mpas_tpu.dynamics.model import build_model
    final_global, stream, _ = global_run
    nl = Namelist(config_nvertlevels=K, config_ztop=30000.0, dtype="float64",
                  config_dt=DT, config_jw_u_perturbation=1.0,
                  config_apply_lbcs=True)
    m = build_model(namelist=nl, mesh=marked_mesh)
    drv = L.RegionalDriver(m, stream)
    drv.step(N_STEPS)

    bdy_c = marked_mesh.bdyMaskCell
    bdy_e = marked_mesh.bdyMaskEdge
    int_c = bdy_c == 0
    int_e = bdy_e == 0
    u_ref = np.asarray(final_global.u)
    u_reg = np.asarray(m.state.u)
    th_ref = np.asarray(final_global.theta_m)
    th_reg = np.asarray(m.state.theta_m)
    # the 24 h JW signal itself: u drifts O(1 m/s); the regional interior
    # must track the global interior 1-2 orders below that
    du = np.abs(u_reg[:, int_e] - u_ref[:, int_e]).max()
    dth = np.abs(th_reg[:, int_c] - th_ref[:, int_c]).max()
    assert du < 0.2, du                       # m/s vs 35 m/s jet
    assert dth < 0.2, dth                     # K vs ~300 K
    assert not np.isnan(u_reg).any()


def test_lbc_netcdf_roundtrip(marked_mesh, tmp_path):
    """MPAS-convention lbc.*.nc write/read (VERDICT r3 item 8): full-domain
    lbc_u/lbc_w/lbc_theta/lbc_rho/lbc_qv files recouple bitwise-tolerantly
    into the zone stream."""
    from mpas_tpu.dynamics.model import build_model
    nl = Namelist(config_nvertlevels=K, config_ztop=30000.0, dtype="float64",
                  config_dt=DT, config_jw_u_perturbation=1.0)
    m = build_model(namelist=nl, mesh=marked_mesh)
    paths = []
    for t in (0.0, DT):
        p = str(tmp_path / L.lbc_filename(t))
        L.write_lbc_netcdf(p, t, m.state, m)
        paths.append(p)
        m.step()
    stream = L.read_lbc_netcdf(paths, m)
    cells, edges = L.zone_indices(marked_mesh)
    np.testing.assert_allclose(stream.times, [0.0, DT])
    # compare t=DT snapshot against the state that was written at t=DT
    # (m.state has stepped once more by now, so re-extract from a rerun)
    m2 = build_model(namelist=nl, mesh=marked_mesh)
    snap0 = L.extract_lbc(m2.state, cells, edges)
    np.testing.assert_allclose(stream.cell_data["theta_m"][0],
                               snap0[0]["theta_m"], rtol=1e-6)
    np.testing.assert_allclose(stream.cell_data["rho_zz"][0],
                               snap0[0]["rho_zz"], rtol=1e-6)
    np.testing.assert_allclose(stream.edge_data["u"][0], snap0[1]["u"],
                               rtol=0, atol=1e-10)


def test_coarse_to_fine_driving(tmp_path):
    """A FINE regional mesh driven by a COARSER global run (the standard
    MPAS nesting workflow; VERDICT r3 item 8): 642-cell global drives the
    2562-cell regional NH cap — stable, specified zone tracks the
    interpolated driving data, interior stays physical."""
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.coefficients import mark_regional_zones
    from mpas_tpu.mesh.generator import generate_mesh

    coarse_mesh = generate_mesh(levels=3, lloyd_iterations=3)
    fine = generate_mesh(levels=4, lloyd_iterations=3)
    fine = mark_regional_zones(fine, fine.latCell > 0.15, n_relax=5)

    nl_c = Namelist(config_nvertlevels=K, config_ztop=30000.0,
                    dtype="float64", config_dt=DT,
                    config_jw_u_perturbation=1.0)
    mc = build_model(namelist=nl_c, mesh=coarse_mesh)
    cells, edges = L.zone_indices(fine)
    c2f = L.CoarseToFine(coarse_mesh, fine, cells, edges)

    n_steps = 90                   # 12 h
    times, snaps = [0.0], [c2f.snapshot(mc.state)]
    for i in range(n_steps):
        mc.step()
        if (i + 1) % LBC_EVERY == 0:
            times.append((i + 1) * DT)
            snaps.append(c2f.snapshot(mc.state))
    stream = L.build_stream(times, cells, edges, snaps)

    nl_f = nl_c.replace(config_apply_lbcs=True)
    mf = build_model(namelist=nl_f, mesh=fine)
    drv = L.RegionalDriver(mf, stream)
    drv.step(n_steps)

    s = {k: float(v) for k, v in mf.summarize().items()}
    assert not s["nan_detected"]
    assert 25.0 < s["u_max"] < 50.0, s            # jet intact
    assert abs(s["w_max"]) < 1.0 and abs(s["w_min"]) < 1.0, s
    # the specified zone tracks the interpolated coarse data (hard-set each
    # step; deviation bounded by one step of frozen-zone lag)
    spec_c = fine.bdyMaskCell > nl_f.nRelaxZone
    zone_pos = np.searchsorted(cells, np.where(spec_c)[0])
    th_drive = stream.cell_data["theta_m"][-1][:, zone_pos]
    th_reg = np.asarray(mf.state.theta_m)[:, spec_c]
    assert np.abs(th_reg - th_drive).max() < 1.0, np.abs(th_reg - th_drive).max()


def test_specified_zone_tracks_stream(global_run, marked_mesh):
    """With every-step forcing the specified zone equals the driving run's
    state there (hard-set + held)."""
    from mpas_tpu.dynamics.model import build_model
    final_global, stream, _ = global_run
    nl = Namelist(config_nvertlevels=K, config_ztop=30000.0, dtype="float64",
                  config_dt=DT, config_jw_u_perturbation=1.0,
                  config_apply_lbcs=True)
    m = build_model(namelist=nl, mesh=marked_mesh)
    drv = L.RegionalDriver(m, stream)
    drv.step(N_STEPS)
    spec_c = marked_mesh.bdyMaskCell > nl.nRelaxZone
    th_reg = np.asarray(m.state.theta_m)[:, spec_c]
    th_ref = np.asarray(final_global.theta_m)[:, spec_c]
    # the final blend happened at t = (N-1)*dt; one step of frozen-zone lag
    # plus stream interpolation bounds the deviation
    assert np.abs(th_reg - th_ref).max() < 0.5
