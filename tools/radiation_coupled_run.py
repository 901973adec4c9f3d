"""Radiation-coupled JW run at x1.10242 (BASELINE.json config 4: "CAM
sw/lw radiation + cloud-fraction physics coupled to dycore (x1.10242)").

Integrates the moist JW wave at 240 km / 26 levels with the full column
radiation chain (cloud fraction -> cloud optics -> delta-Eddington SW +
k-distribution LW, physics/driver.radctl) applied on an hourly cadence
and coupled through rt_diabatic_tend, plus Kessler microphysics.  Saves
docs/validation/jw_radiation_10242.npz for
tests/test_physics.py::TestRadiationCoupledRun.

Usage: python tools/radiation_coupled_run.py [days] [gen_levels]
(default 2 days, x1.10242; minutes on TPU.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                   "validation", "jw_radiation_10242.npz")


def main():
    days = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.writer import generate_and_cache
    from mpas_tpu.physics.driver import physics_init

    nl = Namelist(config_nvertlevels=26, config_ztop=30000.0,
                  dtype="float32", config_dt=300.0,
                  config_jw_u_perturbation=1.0, config_moisture=True,
                  config_microphysics="kessler")
    mesh = generate_and_cache(levels)
    print(f"x1.{mesh.nCells} dx={mesh.dcEdge.mean()/1e3:.0f} km", flush=True)
    m = build_model(namelist=nl, mesh=mesh)
    phys = physics_init()

    steps_per_hour = int(round(3600.0 / nl.config_dt))
    n_hours = int(days * 24)
    t0 = time.time()
    rt_amp = []
    for h in range(n_hours):
        m.apply_physics(phys, julian=80.25 + h / 24.0)   # hourly radiation
        m.step(steps_per_hour)
        if (h + 1) % 6 == 0:
            s = m.summarize()
            rt = np.asarray(m.state.rt_diabatic_tend)
            rt_amp.append(float(np.abs(rt).max()))
            print(f"t={h+1:3d}h |rt_diabatic|max={rt_amp[-1]:.2e} K/s "
                  f"u_max={s['u_max']:.1f} nan={s['nan_detected']}",
                  flush=True)
            if s["nan_detected"]:
                raise SystemExit("NaN - aborting")
    print(f"{n_hours} hours in {time.time()-t0:.0f} s", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    st = m.state
    np.savez_compressed(
        OUT,
        theta_m=np.asarray(st.theta_m), u=np.asarray(st.u),
        w=np.asarray(st.w),
        rt_diabatic_tend=np.asarray(st.rt_diabatic_tend),
        qv=np.asarray(st.scalars[0]),
        latCell=mesh.latCell, lonCell=mesh.lonCell,
        rt_amp_series=np.array(rt_amp),
        days=days, dt=nl.config_dt, ncells=mesh.nCells)
    print("saved", OUT)


if __name__ == "__main__":
    main()
