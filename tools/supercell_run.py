"""Reduced-planet deep-convection (supercell-regime) free run with the
full 6-class WSM6 microphysics — the coupled showcase of the round-5
physics: WK82 sounding + shear + bubble (init/squall.py, case 22) at
convection-permitting spacing, saving docs/validation/supercell_state.npz
for tests/test_squall.py::TestSupercellArtifact.

Configuration: X=100 reduced planet (circumference ~400 km), x1.2562-gen
mesh -> 4.8 km spacing, 24 levels to 20 km, dt=15 s / nsub=4 (acoustic
CFL ~0.45 at min dx), 2 simulated hours (480 steps).  Minutes on TPU.

Usage: python tools/supercell_run.py [steps] [gen_levels]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                   "validation", "supercell_state.npz")


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.writer import generate_and_cache

    X = 100.0
    nl = Namelist(
        config_init_case=22, config_coriolis=False,
        config_sphere_radius=6371229.0 / X,
        config_vertical_stretch=1.0,
        config_dt=15.0, config_number_of_sub_steps=4,
        config_nvertlevels=24, config_ztop=20000.0,
        config_zd=14000.0, config_xnutr=0.3, config_len_disp=4800.0,
        config_moisture=True, config_microphysics="wsm6",
        config_pbl="ysu_lite", dtype="float32",
        config_sq_bubble_dtheta=3.0, config_sq_bubble_radius=10000.0,
        config_sq_shear_u=12.0)
    mesh = generate_and_cache(levels, sphere_radius=nl.config_sphere_radius)
    print(f"x1.{mesh.nCells} dx={mesh.dcEdge.mean()/1e3:.1f} km "
          f"dt={nl.config_dt}s planet={2*np.pi*mesh.sphere_radius/1e3:.0f} km",
          flush=True)
    m = build_model(namelist=nl, mesh=mesh)
    t0 = time.time()
    batch = 40
    wmax_series, rain_series = [], []
    for i in range(0, steps, batch):
        m.step(batch)
        s = m.summarize()
        rain = float(np.asarray(m.state.rainnc).max())
        wmax_series.append(max(abs(s["w_min"]), abs(s["w_max"])))
        rain_series.append(rain)
        print(f"t={m.step_count * nl.config_dt:6.0f}s "
              f"w:[{s['w_min']:+.2f},{s['w_max']:+.2f}] "
              f"rain_max={rain:.2f} mm nan={s['nan_detected']}", flush=True)
        if s["nan_detected"]:
            raise SystemExit("NaN - aborting")
    print(f"{steps} steps in {time.time()-t0:.0f} s", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    st = m.state
    np.savez_compressed(
        OUT,
        w=np.asarray(st.w), theta_m=np.asarray(st.theta_m),
        scalars=np.asarray(st.scalars), rainnc=np.asarray(st.rainnc),
        zgrid=np.asarray(m.static.zgrid),
        latCell=mesh.latCell, lonCell=mesh.lonCell,
        sphere_radius=mesh.sphere_radius,
        wmax_series=np.array(wmax_series), rain_series=np.array(rain_series),
        dt=nl.config_dt, t_final=m.step_count * nl.config_dt)
    print("saved", OUT)


if __name__ == "__main__":
    main()
