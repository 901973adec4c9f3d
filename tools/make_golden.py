"""Generate the golden regression checkpoint for tests/test_golden.py.

Runs the reference benchmark configuration (x1.2562 mesh, 5 levels,
dt=720 s, 10 RK3 steps — constants.rg:16,26,60 / config.REFERENCE_NAMELIST)
in float64 on CPU and stores the prognostic fields (u, w, theta_m, rho_zz)
plus surface pressure.  This is the allclose target named in BASELINE.json
("allclose prognostic fields ... after N RK3 steps on x1.2562"): the golden
locks the numerics so any regression in the dycore shows as a field-level
diff.  Regenerate ONLY for an intentional, documented numerics change:

    JAX_PLATFORMS=cpu python tools/make_golden.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpas_tpu.config import REFERENCE_NAMELIST  # noqa: E402
from mpas_tpu.dynamics.model import build_model  # noqa: E402
from mpas_tpu.ops.diagnostics import output_diagnostics  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "jw_ref10.npz")


def main():
    nl = REFERENCE_NAMELIST.replace(dtype="float64")
    model = build_model(namelist=nl)
    model.step(nl.config_run_duration_steps)
    out = output_diagnostics(model.state, model.static)
    vg = model.vgrid
    pressure = np.asarray(out["pressure"])   # level-major [K, C]
    sp = (vg.cf1 * pressure[0] + vg.cf2 * pressure[1]
          + vg.cf3 * pressure[2])
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        # the golden artifact keeps the element-major [N, K] file layout
        # (tests/test_golden.py transposes the level-major device state)
        u=np.asarray(model.state.u).T, w=np.asarray(model.state.w).T,
        theta_m=np.asarray(model.state.theta_m).T,
        rho_zz=np.asarray(model.state.rho_zz).T,
        surface_pressure=sp,
        config=np.array(str(nl)),
    )
    print(f"golden -> {OUT}")
    s = model.summarize()
    print({k: round(v, 6) for k, v in s.items()})


if __name__ == "__main__":
    main()
