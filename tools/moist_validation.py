"""15-day moist JW (Kessler) validation run (VERDICT r2 item 4b).

Integrates the perturbed Jablonowski-Williamson case with transported
moisture (qv/qc/qr) and Kessler warm-rain microphysics for 15 days and
stores the final state + precipitation record as a checked-in artifact
(docs/validation/jw15_moist.npz), which tests/test_moist_validation.py
checks against physical expectations: nonnegative bounded moisture,
monotone accumulated precipitation with a physically plausible global
mean, an intact (moist-modified) baroclinic wave, and no NaNs.

The reference has no moisture loop at all (SURVEY.md section 8), so the
anchors are physical: warm-rain precip from a saturated baroclinic wave
over 15 days is O(0.1-10 mm/day) in the storm track.

Run (TPU or CPU):  python tools/moist_validation.py [days] [grid_levels]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mpas_tpu.config import Namelist
from mpas_tpu.dynamics.model import build_model
from mpas_tpu.mesh.writer import generate_and_cache

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "validation", "jw15_moist.npz")


def main():
    days = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 4   # 2562 cells
    # round 5: "wsm6" runs the full 6-class ice-phase scheme + YSU-lite
    # PBL for the 15 days (the global climate-regime stability check of
    # the new physics) and writes jw15_moist_wsm6.npz
    mp = sys.argv[3] if len(sys.argv) > 3 else "kessler"
    global OUT
    if mp != "kessler":
        OUT = OUT.replace("jw15_moist.npz", f"jw15_moist_{mp}.npz")
    mesh = generate_and_cache(levels)
    # the moist JW initialization (init/jw.py moisture branch: the MPAS
    # relative-humidity profile, hydrostatically re-iterated with qv)
    nl = Namelist(config_nvertlevels=26, config_ztop=30000.0, dtype="float32",
                  config_dt=450.0, config_jw_u_perturbation=1.0,
                  config_moisture=True, config_microphysics=mp,
                  config_pbl=("ysu_lite" if mp == "wsm6" else "off"))
    m = build_model(namelist=nl, mesh=mesh)

    n_steps = int(days * 86400 / nl.config_dt)
    t0 = time.time()
    rain_series = []
    for i in range(n_steps):
        m.step()
        if (i + 1) % 192 == 0:                            # daily
            sm = m.summarize()
            rain = float(np.asarray(m.state.rainnc).mean())
            rain_series.append(rain)
            print(f"day {(i+1)*nl.config_dt/86400:5.1f}: u_max={sm['u_max']:.1f} "
                  f"w_max={sm['w_max']:.3f} theta=[{sm['theta_min']:.0f},"
                  f"{sm['theta_max']:.0f}] rain_mean={rain:.3f} mm "
                  f"nan={sm['nan_detected']}", flush=True)
            if sm["nan_detected"]:
                raise SystemExit("NaN detected — aborting")
    wall = time.time() - t0
    print(f"{n_steps} steps in {wall:.0f}s")

    st = m.state
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        # element-major [N, K] file convention (tests transpose device state)
        u=np.asarray(st.u).T, w=np.asarray(st.w).T,
        theta_m=np.asarray(st.theta_m).T,
        qv=np.asarray(st.scalars[0]).T, qc=np.asarray(st.scalars[1]).T,
        qr=np.asarray(st.scalars[2]).T,
        scalars=np.asarray(st.scalars),
        rainnc=np.asarray(st.rainnc),
        rain_series=np.asarray(rain_series),
        latCell=mesh.latCell, lonCell=mesh.lonCell,
        days=days, dt=nl.config_dt, ncells=mesh.nCells)
    print(f"artifact -> {OUT}")


if __name__ == "__main__":
    main()
