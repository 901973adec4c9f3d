"""Run the nonhydrostatic Schar mountain-wave benchmark and save the
validation artifact (docs/validation/mw_state.npz).

DCMIP 2-x style reduced-planet configuration (mpas_tpu/init/mountain_wave.py):
X = 500 on the x1.40962 mesh gives ~240 m grid spacing, so the d = 5 km /
xi = 4 km Schar mountain drives waves with N*d/U ~ 4.5 and a strongly
nonhydrostatic xi-scale component (N*xi/(2*pi*U) ~ 0.6) — |w| of order
m/s through the vertically implicit acoustic solver.

Usage: python tools/mountain_wave_run.py [gen_levels] [steps]
  gen_levels: mesh refinement (default 6 -> x1.40962; 5 -> x1.10242 at
  X=250 for a quicker run).  Runs on whatever jax backend is default (TPU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                   "validation", "mw_state.npz")


def make_namelist(levels: int):
    from mpas_tpu.config import Namelist
    # grid spacing at refinement `levels` on the full sphere ~ 480/2^(levels-4) km;
    # pick X so the reduced-planet spacing is ~240 m
    dx_earth_km = 480.0 / 2 ** (levels - 4)
    X = dx_earth_km / 0.240
    dx = dx_earth_km * 1000.0 / X
    dt = round(dx / 240.0, 2)          # ~1 s at 240 m (acoustic CFL 0.72)
    return Namelist(
        config_init_case=21, config_sphere_radius=6371229.0 / X,
        config_coriolis=False, config_dt=dt,
        # 4 acoustic substeps: the generated CVT family's min dx sits ~20%
        # below the mean, so nsub=2 lands at acoustic CFL ~0.8 — past the
        # measured 0.72 stability envelope (docs/VALIDATION.md); nsub=4
        # gives CFL ~0.4 at min dx
        config_number_of_sub_steps=4,
        config_nvertlevels=40, config_ztop=20000.0,
        config_vertical_stretch=1.0,
        config_zd=13000.0, config_xnutr=0.3,
        config_len_disp=dx, dtype="float32",
        config_mtn_h0=250.0, config_mtn_halfwidth=5000.0,
        config_mtn_wavelength=4000.0), X


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.writer import generate_and_cache

    nl, X = make_namelist(levels)
    mesh = generate_and_cache(levels, sphere_radius=nl.config_sphere_radius)
    print(f"x1.{mesh.nCells} X={X:.0f} dx={mesh.dcEdge.mean():.0f} m "
          f"dt={nl.config_dt}s radius={mesh.sphere_radius:.0f} m", flush=True)
    m = build_model(namelist=nl, mesh=mesh)
    t0 = time.time()
    batch = 100
    for i in range(0, steps, batch):
        m.step(batch)
        s = m.summarize()
        print(f"t={m.step_count * nl.config_dt:7.0f}s "
              f"w:[{s['w_min']:+.3f},{s['w_max']:+.3f}] "
              f"u:[{s['u_min']:+.2f},{s['u_max']:+.2f}] nan={s['nan_detected']}",
              flush=True)
        if s["nan_detected"]:
            raise SystemExit("NaN - aborting")
    print(f"{steps} steps in {time.time()-t0:.0f} s", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        w=np.asarray(m.state.w), u=np.asarray(m.state.u),
        theta_m=np.asarray(m.state.theta_m),
        zgrid=np.asarray(m.static.zgrid),
        latCell=mesh.latCell, lonCell=mesh.lonCell,
        sphere_radius=mesh.sphere_radius,
        dc_mean=mesh.dcEdge.mean(),
        namelist_kw=np.array([nl.config_mtn_t0, nl.config_mtn_u0,
                              nl.config_mtn_h0, nl.config_mtn_halfwidth,
                              nl.config_mtn_wavelength]),
        t_final=m.step_count * nl.config_dt)
    print("saved", OUT)


if __name__ == "__main__":
    main()
