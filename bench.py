"""Headline benchmark: JW baroclinic wave RK3 throughput on one chip.

Prints ONE JSON line:
  {"metric": "grid_cell_levels_per_s_per_chip", "value": N, "unit": "cell-levels/s",
   "vs_baseline": R}

Baseline anchor (BASELINE.md): the reference publishes no numbers; the only
quantitative anchor is MPAS-Fortran running the full 16-day JW case on the
x1.2562 mesh in "perhaps up to an hour" on a workstation (README.md,
'Installing MPAS' step 5): 1920 steps of dt=720 s in 3600 s -> ~1.875 s per
RK3 step at 26 levels -> ~3.55e4 cell-levels/s.  vs_baseline = value / 3.55e4
(>1 means faster than the MPAS-Fortran anchor).
"""

import json
import time

import jax

BASELINE_CELL_LEVELS_PER_S = 2562 * 26 / 1.875

# benchmark configuration: x1.2562, 41 levels (BASELINE.json target config)
N_LEVELS = 41
WARMUP_STEPS = 3
BENCH_STEPS = 20


def main():
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model

    nl = Namelist(config_nvertlevels=N_LEVELS, config_ztop=30000.0,
                  dtype="float32", config_jw_u_perturbation=1.0,
                  config_dt=720.0)
    m = build_model(namelist=nl)

    # differential timing with a forced device->host fetch: on remote/tunneled
    # backends block_until_ready may not synchronize and a single fetch costs a
    # full RTT, so time N1 and N2 steps (each ending in a scalar fetch) and use
    # the difference — dispatch and RTT overheads cancel exactly.
    def run(n):
        s = m.state
        for _ in range(n):
            s = m.step_fn(s)
        return float(s.u[0, 0])

    run(WARMUP_STEPS)

    def best_time(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n)
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = 5, 5 + BENCH_STEPS
    elapsed = best_time(n2) - best_time(n1)

    cells = m.mesh.nCells * N_LEVELS
    value = cells * BENCH_STEPS / elapsed
    print(json.dumps({
        "metric": "grid_cell_levels_per_s_per_chip",
        "value": round(value, 1),
        "unit": "cell-levels/s",
        "vs_baseline": round(value / BASELINE_CELL_LEVELS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
