"""History writer + restart round-trip tests."""

import numpy as np
import pytest


def test_history_write(tmp_path, model):
    from mpas_tpu.io.history import write_history
    from mpas_tpu.mesh.netcdf_io import read_netcdf
    path = str(tmp_path / "timestep_output.nc")
    write_history(path, model)
    back = read_netcdf(path)
    assert back["_dims"]["nCells"] == model.mesh.nCells
    sp = back["surface_pressure"]
    assert sp.min() > 9.5e4 and sp.max() < 1.05e5
    assert "pressure_p" in back and "theta" in back


def test_history_full_3d(tmp_path, model):
    from mpas_tpu.io.history import write_history
    from mpas_tpu.mesh.netcdf_io import read_netcdf
    path = str(tmp_path / "full3d.nc")
    write_history(path, model, full_3d=True)
    back = read_netcdf(path)
    # Time-dimensioned layout matching the reference's 'Time nCells
    # nVertLevels' history convention (mesh_loading.rg:810-1191).
    assert back["_dims"]["Time"] == 1
    assert back["theta"].shape == (1, model.mesh.nCells, model.vgrid.nVertLevels)


def test_restart_roundtrip(tmp_path, model):
    from mpas_tpu.io.history import save_restart, load_restart
    import copy
    path = str(tmp_path / "restart.npz")
    s0 = model.state
    save_restart(path, model)
    # perturb in place, then restore
    model.state = model.state.replace(u=model.state.u + 1.0)
    load_restart(path, model)
    np.testing.assert_array_equal(np.asarray(model.state.u), np.asarray(s0.u))


def test_restart_exact_resume(tmp_path, model):
    """Stepping from a restored checkpoint reproduces the original run
    bitwise (the exact-resume requirement, SURVEY.md section 5)."""
    from mpas_tpu.io.history import save_restart, load_restart
    path = str(tmp_path / "restart2.npz")
    s0 = model.state
    save_restart(path, model)
    ref = model.step_fn(s0)
    load_restart(path, model)
    again = model.step_fn(model.state)
    np.testing.assert_array_equal(np.asarray(ref.u), np.asarray(again.u))
    np.testing.assert_array_equal(np.asarray(ref.theta_m), np.asarray(again.theta_m))
    model.state = s0


def test_time_series_history(model, tmp_path):
    """HistoryWriter accumulates snapshots into one multi-time-level file
    (the time-series capability the reference's single-snapshot
    write_output_plotting lacks)."""
    import copy
    from mpas_tpu.io.history import HistoryWriter
    from mpas_tpu.mesh.netcdf_io import read_netcdf
    m = copy.copy(model)
    hw = HistoryWriter(m)
    hw.record(time_value=0.0)
    S = m.state
    for i in range(2):
        S = m.step_fn(S)
        hw.record(state=S, time_value=float(i + 1))
    path = str(tmp_path / "series.nc")
    hw.write(path)
    d = read_netcdf(path)
    assert d["_dims"]["Time"] == 3
    assert d["u"].shape[0] == 3
    np.testing.assert_array_equal(d["xtime"], [0.0, 1.0, 2.0])
    # the state actually evolved between records
    assert np.abs(d["u"][2] - d["u"][0]).max() > 0.0
    assert np.isfinite(d["surface_pressure"]).all()


def test_restart_config_mismatch_rejected(tmp_path, model):
    """A checkpoint carrying a field the restoring model has disabled (e.g.
    moist scalars into a dry model) fails with a descriptive config-mismatch
    error, not an AttributeError (round-4 advisor finding)."""
    from mpas_tpu.io.history import save_restart, load_restart
    path = str(tmp_path / "moist.npz")
    save_restart(path, model)
    data = dict(np.load(path))
    assert model.state.scalars is None          # dry fixture
    data["scalars"] = np.zeros((2, 3, 4))
    np.savez_compressed(path, **data)
    with pytest.raises(ValueError, match="config"):
        load_restart(path, model)


def test_restart_orbax_roundtrip(tmp_path, model):
    """The orbax (tensorstore/zarr) checkpoint variant restores bitwise and
    validates its layout marker like the npz reader."""
    from mpas_tpu.io.history import save_restart_orbax, load_restart_orbax
    path = str(tmp_path / "orbax_ckpt")
    s0 = model.state
    save_restart_orbax(path, model)
    model.state = model.state.replace(u=model.state.u + 1.0,
                                      theta_m=model.state.theta_m * 1.01)
    load_restart_orbax(path, model)
    np.testing.assert_array_equal(np.asarray(model.state.u), np.asarray(s0.u))
    np.testing.assert_array_equal(np.asarray(model.state.theta_m),
                                  np.asarray(s0.theta_m))
    model.state = s0
