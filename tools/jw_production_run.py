"""Run the JW baroclinic wave 15 days at PRODUCTION resolution (x1.40962,
120 km) and save both validation artifacts:

  docs/validation/jw_psmin_40962.npz  — day-resolved min/max surface
      pressure trajectory (tests/test_golden.py production-resolution and
      resolution-convergence checks)
  docs/validation/jw15_40962.npz      — day-15 state (element-major [N, K]
      file convention, matching jw15_state.npz)

This exercises BASELINE.json's "JW wave vs reference at day 15 on
x1.40962" correctness clause (the reference's own golden comparison is the
day-15 surface-pressure plot, /root/reference/README.md "Installing MPAS"
steps 5-7, images/day15.png).

Configuration: x1.40962 (generated CVT, 120 km), 26 levels, dt=300 s
(acoustic CFL 0.51 with nsub=2 — dt=450/nsub=2 is measured-unstable on the
generated CVT family, docs/VALIDATION.md "Stability envelope"), f32.
4320 steps; minutes on TPU.

Usage: python tools/jw_production_run.py [days] [gen_levels]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

VDIR = os.path.join(os.path.dirname(__file__), os.pardir, "docs", "validation")


def surface_pressure(model):
    from mpas_tpu.ops.diagnostics import output_diagnostics
    out = output_diagnostics(model.state, model.static)
    vg = model.vgrid
    p = np.asarray(out["pressure"])          # level-major [K, C]
    return vg.cf1 * p[0] + vg.cf2 * p[1] + vg.cf3 * p[2]


def main():
    days = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.writer import generate_and_cache

    nl = Namelist(config_nvertlevels=26, config_ztop=30000.0, dtype="float32",
                  config_dt=300.0, config_jw_u_perturbation=1.0)
    mesh = generate_and_cache(levels)
    print(f"x1.{mesh.nCells} dx={mesh.dcEdge.mean()/1e3:.0f} km "
          f"dt={nl.config_dt}s levels={nl.config_nvertlevels}", flush=True)
    m = build_model(namelist=nl, mesh=mesh)
    steps_per_day = int(round(86400.0 / nl.config_dt))

    ps0 = surface_pressure(m)
    ps_min = [float(ps0.min())]
    ps_max = [float(ps0.max())]
    t0 = time.time()
    for day in range(1, days + 1):
        m.step(steps_per_day)
        sp = surface_pressure(m)
        s = m.summarize()
        ps_min.append(float(sp.min()))
        ps_max.append(float(sp.max()))
        print(f"day {day:2d}: ps_min={ps_min[-1]/100:.2f} hPa "
              f"ps_max={ps_max[-1]/100:.2f} hPa u_max={s['u_max']:.1f} "
              f"nan={s['nan_detected']}", flush=True)
        if s["nan_detected"]:
            raise SystemExit("NaN - aborting")
    print(f"{days} days in {time.time()-t0:.0f} s", flush=True)

    os.makedirs(VDIR, exist_ok=True)
    series = os.path.join(VDIR, f"jw_psmin_{mesh.nCells}.npz")
    np.savez_compressed(series, day=np.arange(days + 1),
                        ps_min=np.array(ps_min), ps_max=np.array(ps_max),
                        n_levels=nl.config_nvertlevels, dt=nl.config_dt,
                        mesh=f"x1.{mesh.nCells}")
    print("saved", series)

    state = os.path.join(VDIR, f"jw15_{mesh.nCells}.npz")
    st = m.state
    np.savez_compressed(
        state,
        u=np.asarray(st.u).T, w=np.asarray(st.w).T,
        theta_m=np.asarray(st.theta_m).T, rho_zz=np.asarray(st.rho_zz).T,
        surface_pressure=surface_pressure(m),
        latCell=mesh.latCell, lonCell=mesh.lonCell,
        steps=m.step_count, dt=nl.config_dt, levels=nl.config_nvertlevels)
    print("saved", state)


if __name__ == "__main__":
    main()
