"""Run the JW baroclinic wave 15 days and record the minimum-surface-
pressure trajectory (docs/validation/jw_psmin_series.npz) for the
quantitative JW06-curve check in tests/test_golden.py.

Configuration: x1.2562 (480 km), 26 levels, dt=720 s, f32 — the same setup
as the day-15 artifact (docs/VALIDATION.md).  ~1800 steps; minutes on TPU.

Usage: python tools/jw06_timeseries.py [days] [gen_levels]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                   "validation", "jw_psmin_series.npz")


def surface_pressure(model):
    from mpas_tpu.ops.diagnostics import output_diagnostics
    out = output_diagnostics(model.state, model.static)
    vg = model.vgrid
    p = np.asarray(out["pressure"])          # level-major [K, C]
    return vg.cf1 * p[0] + vg.cf2 * p[1] + vg.cf3 * p[2]


def main():
    days = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model

    nl = Namelist(config_nvertlevels=26, config_ztop=30000.0, dtype="float32",
                  config_dt=720.0, config_jw_u_perturbation=1.0)
    m = build_model(namelist=nl)
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

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, day=np.arange(days + 1),
                        ps_min=np.array(ps_min), ps_max=np.array(ps_max),
                        n_levels=26, dt=nl.config_dt, mesh="x1.2562")
    print("saved", OUT)


if __name__ == "__main__":
    main()
