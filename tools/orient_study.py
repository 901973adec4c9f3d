"""On-device A/B of the ownership-aligned edge numbering (mesh/orient.py).

Measures ms/step of the production bench configuration (x1.40962/41L JW,
f32, dt=300) with config_orient_edges off vs on, differential timing
(batch-of-N2 minus batch-of-N1, scalar-fetch terminated) exactly like
bench.py.  Usage: python tools/orient_study.py [gen_levels] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(nl, mesh, steps=20):
    """Chained differential timing: every batch continues from the evolved
    state so no two executions share inputs — the remote backend memoizes
    identical executions, which made the original same-input form report
    below physical device time (docs/PERF.md round-5 finding 2)."""
    from mpas_tpu.dynamics.model import build_model
    m = build_model(namelist=nl, mesh=mesh)

    def run(s, n):
        for _ in range(n):
            s = m.step_fn(s)
        float(s.u[0, 0])                  # sync
        return s

    t0 = time.time()
    s = run(m.state, 3)
    print(f"  compile+warm {time.time()-t0:.0f} s", flush=True)
    best = float("inf")
    for _ in range(3):
        t1 = time.time()
        s = run(s, 5)
        t2 = time.time()
        s = run(s, 5 + steps)
        t3 = time.time()
        best = min(best, ((t3 - t2) - (t2 - t1)) / steps * 1e3)
    return best, m


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    import numpy as np
    from mpas_tpu.config import Namelist
    from mpas_tpu.mesh.writer import generate_and_cache

    mesh = generate_and_cache(levels)
    nl = Namelist(config_nvertlevels=41, config_ztop=30000.0,
                  dtype="float32", config_dt=300.0,
                  config_jw_u_perturbation=1.0)
    print("=== baseline (unaligned) ===", flush=True)
    ms0, m0 = measure(nl, mesh, steps)
    print(f"baseline: {ms0:.2f} ms/step", flush=True)

    print("=== ownership-aligned ===", flush=True)
    ms1, m1 = measure(nl.replace(config_orient_edges=True), mesh, steps)
    print(f"oriented: {ms1:.2f} ms/step ({ms0/ms1:.3f}x)", flush=True)

    # physics sanity: same summarize extrema to f32 tolerance
    s0, s1 = m0.summarize(), m1.summarize()
    for k in ("w_min", "w_max", "theta_min", "theta_max"):
        a, b = s0[k], s1[k]
        print(f"  {k}: {a:.6g} vs {b:.6g}")
        assert abs(a - b) <= 1e-3 * max(1.0, abs(a)), k
    print("extrema agree")


if __name__ == "__main__":
    main()
