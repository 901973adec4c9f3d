"""Cold-compile study (round-5 verdict item 4): measure XLA compile time
and step-time cost of exec_time_optimization_effort at the production
bench configuration (x1.40962/41L).

Runs with the persistent compilation cache DISABLED (every .compile() is a
true cold compile) and measures each compiled binary's step time by
differential timing.  Usage:

    MPAS_TPU_COMPILE_CACHE=0 python tools/compile_study.py [gen_levels]
"""

import os
import sys
import time

os.environ.setdefault("MPAS_TPU_COMPILE_CACHE", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import jax

    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics import srk3
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.writer import generate_and_cache

    mesh = generate_and_cache(levels)
    nl = Namelist(config_nvertlevels=41, config_ztop=30000.0,
                  dtype="float32", config_dt=300.0,
                  config_jw_u_perturbation=1.0)
    m = build_model(namelist=nl, mesh=mesh)

    def step(state):
        return srk3.atm_srk3(state, m.static, m.mesh_arrays, m.vert, nl,
                             nl.config_dt)

    t0 = time.time()
    lowered = jax.jit(step).lower(m.state)
    t_lower = time.time() - t0
    print(f"trace+lower: {t_lower:.1f} s", flush=True)

    results = []
    for label, opts in (
            ("default", None),
            ("effort=-0.5", {"exec_time_optimization_effort": -0.5}),
            ("effort=-1.0", {"exec_time_optimization_effort": -1.0})):
        t0 = time.time()
        compiled = lowered.compile(compiler_options=opts)
        t_c = time.time() - t0

        def run(n):
            s = m.state
            for _ in range(n):
                s = compiled(s)
            return float(s.u[0, 0])

        run(3)
        N = 15
        t1 = time.time(); run(N); t2 = time.time(); run(2 * N); t3 = time.time()
        ms = (t3 - t2 - (t2 - t1)) / N * 1e3
        results.append((label, t_c, ms))
        print(f"{label:12s}: compile {t_c:6.1f} s   step {ms:6.2f} ms",
              flush=True)

    base = results[0]
    for label, t_c, ms in results[1:]:
        print(f"{label}: compile {base[1]/t_c:.2f}x faster, "
              f"step {100*(ms/base[2]-1):+.1f}%")


if __name__ == "__main__":
    main()
