"""Golden numerical validation (BASELINE.json "correctness" target).

Three golden sources, mirroring the reference's verification strategy
(/root/reference/README.md "Installing MPAS" steps 0-7; output.txt is its
checked-in run transcript):

1. A checked-in golden checkpoint of the reference benchmark configuration
   (x1.2562, 5 levels, dt=720 s, 10 RK3 steps — constants.rg:16,26,60),
   regenerated in-test and compared field-by-field (regression lock).
2. Published Jablonowski-Williamson (QJRMS 2006) quantitative anchors on
   the evolved solution.
3. The day-15 state artifact from the full 15-day TPU run
   (docs/validation/jw15_state.npz), checked against the features of the
   reference's MPAS-Fortran golden plot (/root/reference/images/day15.png:
   NH cyclone complex at 60-80N/0-60E, SH quiescent) and the published JW
   day-15 behaviour.

MPAS-Fortran itself cannot run in this environment (no Fortran model
source); the published JW06 values plus the reference's checked-in
MPAS-Fortran day-15 plot are the external anchors, and the checked-in
golden locks our own numerics bitwise-tolerantly.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "jw_ref10.npz")
DAY15 = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                     "validation", "jw15_state.npz")


def _surface_pressure(model):
    from mpas_tpu.ops.diagnostics import output_diagnostics
    out = output_diagnostics(model.state, model.static)
    vg = model.vgrid
    p = np.asarray(out["pressure"])          # level-major [K, C]
    # NOTE: the cf1/cf2/cf3 extrapolation is linear in z while p is
    # exponential, so at 5 coarse levels it carries an O(8%) static offset;
    # wave amplitudes are differences against the step-0 value.
    return vg.cf1 * p[0] + vg.cf2 * p[1] + vg.cf3 * p[2]


@pytest.fixture(scope="module")
def ref10_model():
    """The reference benchmark configuration, integrated 10 steps in f64.
    Returns (model, initial surface pressure)."""
    from mpas_tpu.config import REFERENCE_NAMELIST
    from mpas_tpu.dynamics.model import build_model
    nl = REFERENCE_NAMELIST.replace(dtype="float64")
    model = build_model(namelist=nl)
    sp0 = _surface_pressure(model)
    model.step(nl.config_run_duration_steps)
    return model, sp0


def test_golden_checkpoint_allclose(ref10_model):
    """u, w, theta_m, rho allclose vs the checked-in golden after 10 RK3
    steps on x1.2562 (the exact BASELINE.json correctness clause)."""
    g = np.load(GOLDEN)
    st = ref10_model[0].state
    for name in ("u", "w", "theta_m", "rho_zz"):
        # device state is level-major [K, N] (core/state.py); the golden
        # artifact keeps its original element-major [N, K] file layout so
        # the regression anchor survives the round-3 layout flip unchanged
        a = np.asarray(getattr(st, name)).T
        b = g[name]
        scale = np.abs(b).max()
        err = np.abs(a - b).max() / scale
        # same dtype/platform reruns are ~bitwise; 1e-9 catches any real
        # numerics change while tolerating XLA fusion-order drift
        assert err < 1e-9, (name, err)


def test_golden_surface_pressure(ref10_model):
    g = np.load(GOLDEN)
    sp = _surface_pressure(ref10_model[0])
    err = np.abs(sp - g["surface_pressure"]).max()
    assert err < 1.0, err          # Pa


def test_ten_step_evolution_matches_jw_published(ref10_model):
    """After 10 steps (~2 days) the JW perturbation is still in its linear
    growth phase (JW06 Fig. 4: surface-pressure deviation of a few hPa
    through day 4): jet intact at ~35 m/s, w small, ps drift small."""
    model, sp0 = ref10_model
    s = model.summarize()
    assert 34.0 < s["u_max"] < 40.0          # jet neither decayed nor blown up
    assert abs(s["w_min"]) < 0.1 and abs(s["w_max"]) < 0.1
    assert not s["nan_detected"]
    drift = np.abs(_surface_pressure(model) - sp0).max()
    assert drift < 400.0, drift              # Pa; JW06 linear phase


PSMIN_SERIES = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                            "validation", "jw_psmin_series.npz")


DIGITIZED = os.path.join(os.path.dirname(__file__), "golden",
                         "jw06_psmin_digitized.csv")


@pytest.mark.skipif(not os.path.exists(PSMIN_SERIES),
                    reason="ps_min series artifact not generated")
class TestJW06PressureTrajectory:
    """Day-resolved minimum-surface-pressure trajectory of the 15-day run
    (tools/jw06_timeseries.py) against the published JW06 evolution
    (Jablonowski & Williamson QJRMS 2006): day-by-day comparison with the
    digitized published curve (tests/golden/jw06_psmin_digitized.csv,
    days 0-10) on DEVIATIONS from day 0 (cancelling the static
    cf1/cf2/cf3-extrapolation offset of the discrete surface pressure),
    with per-phase tolerances stated in `PHASE_TOL`; plus shape checks of
    the later deepening.  MPAS-Fortran cannot run here, so the digitized
    published curve is the strongest external trajectory anchor available."""

    # (day range, tolerance on |dev_sim - dev_jw06| in Pa, rationale)
    PHASE_TOL = (
        (range(0, 6), 200.0,    # quiet phase: curve known to ~±0.2 hPa
         "linear growth phase, JW06 flat to ~0.5 hPa"),
        (range(6, 8), 500.0,    # onset: ±1 hPa digitization + resolution
         "onset of nonlinear growth"),
        (range(8, 11), 2500.0,  # explosive: steep curve, ±5 hPa digitization
         "explosive deepening; JW06's own inter-dycore spread is tens of "
         "hPa here and 480 km CVT deepens ~1 day early"),
    )

    @pytest.fixture(scope="class")
    def series(self):
        d = np.load(PSMIN_SERIES)
        return d["day"], d["ps_min"]

    @pytest.fixture(scope="class")
    def digitized(self):
        d = np.loadtxt(DIGITIZED, delimiter=",")
        return d[:, 0].astype(int), d[:, 1] * 100.0       # Pa

    def test_day_by_day_vs_digitized_jw06(self, series, digitized):
        """|(ps(d) - ps(0)) - (jw06(d) - jw06(0))| within the per-phase
        tolerance for every digitized day."""
        day, ps = series
        jd, jps = digitized
        dev_sim = ps - ps[0]
        dev_ref = jps - jps[0]
        for days, tol, why in self.PHASE_TOL:
            for d in days:
                if d >= len(dev_sim) or d not in jd:
                    continue
                diff = abs(dev_sim[d] - dev_ref[list(jd).index(d)])
                assert diff < tol, (d, diff, tol, why)

    def test_linear_phase_quiet(self, series):
        day, ps = series
        dev = np.abs(ps[:5] - ps[0])
        assert dev.max() < 200.0, dev          # Pa; JW06 ~<0.5 hPa through day 4

    def test_growth_phase_timing(self, series):
        day, ps = series
        # still moderate at day 6, clearly developed by day 12
        assert abs(ps[6] - ps[0]) < 2500.0, ps[6] - ps[0]
        assert ps[0] - ps[12:].min() > 500.0, ps[0] - ps[12:].min()

    def test_deepening_monotone(self, series):
        """From day 8 to the trajectory minimum the low deepens
        monotonically (within 150 Pa/day noise) — the signature shape of
        the published curves."""
        day, ps = series
        imin = int(np.argmin(ps))
        assert 8 <= imin <= len(ps) - 1, imin
        seg = ps[8:imin + 1]
        assert np.all(np.diff(seg) < 150.0), seg

    def test_deep_but_bounded_cyclone(self, series):
        day, ps = series
        assert ps.min() < 96000.0, ps.min()    # deep low developed
        assert ps.min() > 90000.0, ps.min()    # not runaway


DAY15_PROD = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                          "validation", "jw15_40962.npz")
PSMIN_PROD = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                          "validation", "jw_psmin_40962.npz")


DAY15_MID = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                         "validation", "jw15_10242.npz")


@pytest.mark.skipif(not os.path.exists(DAY15_PROD),
                    reason="production-resolution day-15 artifact not generated")
class TestDay15Production:
    """BASELINE.json's 'JW wave vs reference at day 15 on x1.40962' clause
    (+ the x1.10242 run of config 2): the same day-15 checks as TestDay15
    at 120 km and 240 km (26 levels, dt=300 s on TPU;
    tools/jw_production_run.py)."""

    @pytest.fixture(scope="class",
                    params=[p for p in (DAY15_PROD, DAY15_MID)
                            if os.path.exists(p)])
    def day15(self, request):
        return np.load(request.param)

    def test_wave_has_broken_in_nh(self, day15):
        sp = day15["surface_pressure"]
        lat = day15["latCell"] * 180 / np.pi
        nh = lat > 25.0
        assert sp[nh].min() < 96000.0, sp[nh].min()
        assert sp[nh].max() > 101800.0, sp[nh].max()

    def test_storm_track_latitude(self, day15):
        sp = day15["surface_pressure"]
        lat = day15["latCell"] * 180 / np.pi
        assert 40.0 < lat[sp.argmin()] < 88.0

    def test_jet_intensified(self, day15):
        u = day15["u"]
        assert 50.0 < np.abs(u).max() < 120.0

    def test_no_nans_bounded_w(self, day15):
        assert np.isfinite(day15["w"]).all()
        assert np.abs(day15["w"]).max() < 1.0


@pytest.mark.skipif(not (os.path.exists(PSMIN_PROD)
                         and os.path.exists(PSMIN_SERIES)),
                    reason="both-resolution ps_min series not generated")
class TestResolutionConvergence:
    """JW06's resolution story: refining 480 km -> 120 km strengthens and
    advances the baroclinic deepening (their convergence figures show
    weaker/delayed growth at coarse resolution)."""

    @pytest.fixture(scope="class")
    def both(self):
        coarse = np.load(PSMIN_SERIES)
        fine = np.load(PSMIN_PROD)
        return coarse["ps_min"], fine["ps_min"]

    def test_deepening_strengthens_with_resolution(self, both):
        coarse, fine = both
        dev_c = coarse - coarse[0]
        dev_f = fine - fine[0]
        days = range(8, 13)                    # the explosive phase
        assert all(dev_f[d] < dev_c[d] for d in days), (dev_c[8:13],
                                                        dev_f[8:13])

    def test_same_phase_structure(self, both):
        """Both resolutions share the JW06 phases: quiet through day 4,
        explosive deepening after day 7, deep cyclone by mid-run."""
        for ps in both:
            assert np.abs(ps[:5] - ps[0]).max() < 500.0
            assert ps[0] - ps[7] > 500.0       # growth underway by day 7
            assert ps.min() < 96000.0
            assert ps.min() > 90000.0

    def test_day15_within_resolution_band(self, both):
        coarse, fine = both
        assert abs(coarse[-1] - fine[-1]) < 3000.0   # Pa


PSMIN_MID = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                         "validation", "jw_psmin_10242.npz")


@pytest.mark.skipif(not (os.path.exists(PSMIN_MID)
                         and os.path.exists(PSMIN_PROD)
                         and os.path.exists(PSMIN_SERIES)),
                    reason="three-resolution ps_min series not generated")
class TestThreeResolutionConvergence:
    """480 / 240 / 120 km trajectories (the x1.10242 15-day run is
    BASELINE.json config 2): the explosive-phase deepening CONVERGES —
    240 and 120 km agree within ~10 hPa through day 10 while 480 km is
    distinctly weaker (measured round 5: day 9 deviations -40.5 / -51.3 /
    -61.3 hPa at 480/240/120 km)."""

    @pytest.fixture(scope="class")
    def three(self):
        out = []
        for p in (PSMIN_SERIES, PSMIN_MID, PSMIN_PROD):
            d = np.load(p)
            ps = d["ps_min"]
            out.append(ps - ps[0])
        return out                               # [coarse, mid, fine] devs

    def test_coarse_lags_both_finer(self, three):
        coarse, mid, fine = three
        for d in range(8, 12):
            assert coarse[d] > mid[d] + 500.0, (d, coarse[d], mid[d])
            assert coarse[d] > fine[d] + 500.0, (d, coarse[d], fine[d])

    def test_mid_and_fine_converged(self, three):
        """240 vs 120 km agree within 15 hPa on every day through the
        explosive phase — the two finer trajectories have converged
        relative to the coarse one."""
        _, mid, fine = three
        for d in range(0, 11):
            assert abs(mid[d] - fine[d]) < 1500.0, (d, mid[d], fine[d])

    def test_all_share_phase_structure(self, three):
        for dev in three:
            assert np.abs(dev[:5]).max() < 500.0       # quiet through day 4
            assert dev[9] < -2000.0                    # explosive by day 9


@pytest.mark.skipif(not os.path.exists(DAY15),
                    reason="day-15 artifact not generated")
class TestDay15:
    """Quantitative checks of the checked-in day-15 state (26 levels, f32,
    1800 steps on TPU) against the published JW day-15 behaviour and the
    reference's MPAS-Fortran golden plot (images/day15.png)."""

    @pytest.fixture(scope="class")
    def day15(self):
        return np.load(DAY15)

    @pytest.fixture(scope="class")
    def mesh(self):
        from mpas_tpu.mesh.loader import load_mesh
        return load_mesh("/root/reference/mesh_loading/x1.2562.grid.nc")

    def test_wave_has_broken_in_nh(self, day15, mesh):
        """Deep lows and strong highs along the NH storm track (day15.png
        shows a multi-closed-contour cyclone complex; JW06 day-15 lows are
        well below 960 hPa at converged resolution)."""
        sp = day15["surface_pressure"]
        lat = mesh.latCell * 180 / np.pi
        nh = lat > 25.0
        assert sp[nh].min() < 96000.0, sp[nh].min()
        assert sp[nh].max() > 101800.0, sp[nh].max()

    def test_storm_track_latitude(self, day15, mesh):
        """The cyclone complex sits in the 40-85N band (day15.png: centers
        near 60-80N after poleward drift of the breaking wave)."""
        sp = day15["surface_pressure"]
        lat = mesh.latCell * 180 / np.pi
        i = sp.argmin()
        assert 40.0 < lat[i] < 88.0, lat[i]

    def test_sh_left_largely_undisturbed(self, day15, mesh):
        """The perturbation is NH-only; the SH deviation must stay clearly
        smaller than the NH wave.  (Unlike JW06's symmetric lat-lon/spectral
        grids, the CVT mesh is not hemispherically symmetric, so truncation
        error seeds SH baroclinic growth that is visible by day 15 at
        480 km — the day-7 state is still quiet, see docs/VALIDATION.md.)"""
        sp = day15["surface_pressure"]
        lat = mesh.latCell * 180 / np.pi
        nh_amp = np.abs(sp[lat > 25] - 1.0e5).max()
        sh_amp = np.abs(sp[lat < -25] - 1.0e5).max()
        assert sh_amp < 0.75 * nh_amp, (sh_amp, nh_amp)

    def test_jet_intensified(self, day15):
        """Wave breaking spins the jet up well past its initial 35 m/s
        (JW06 day 15: >60 m/s winds in the developed wave)."""
        u = day15["u"]
        assert np.abs(u).max() > 50.0
        assert np.abs(u).max() < 120.0       # but not runaway

    def test_no_nans_bounded_w(self, day15):
        assert np.isfinite(day15["w"]).all()
        assert np.abs(day15["w"]).max() < 0.5
