"""Capture an XProf trace of the SRK3 step and print per-op device time.

Usage: python tools/trace_step.py [gen_levels] [n_vertlevels]
Parses the trace.json.gz event stream: sums durations of device-lane events
(per-fusion/per-op), aggregates by sanitized op name, prints the top
entries.  The honest per-op cost breakdown XLA's cost_analysis can't give.
"""

import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from mpas_tpu.config import Namelist
from mpas_tpu.dynamics.model import build_model
from mpas_tpu.mesh.writer import generate_and_cache

TRACE_DIR = "/tmp/mpas_trace"


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 41
    mode = sys.argv[3] if len(sys.argv) > 3 else "cell"
    cell_form = mode not in ("stencil", "orient")
    mesh = generate_and_cache(levels)
    nl = Namelist(config_nvertlevels=K, config_ztop=30000.0, dtype="float32",
                  config_jw_u_perturbation=1.0, config_dt=300.0,
                  config_cell_form_ops=cell_form,
                  config_orient_edges=(mode == "orient"))
    t0 = time.time()
    m = build_model(namelist=nl, mesh=mesh)
    print(f"model built in {time.time()-t0:.0f}s", flush=True)

    s = m.state
    for _ in range(3):
        s = m.step_fn(s)
    jax.block_until_ready(s.u)
    t0 = time.time()
    with jax.profiler.trace(TRACE_DIR):
        out = s
        for _ in range(3):
            out = m.step_fn(out)
        jax.block_until_ready(out.u)
    wall = time.time() - t0
    print(f"3 traced steps: {wall*1000/3:.1f} ms/step wall", flush=True)

    # newest trace.json.gz
    paths = []
    for root, _, files in os.walk(TRACE_DIR):
        paths += [os.path.join(root, f) for f in files
                  if f.endswith("trace.json.gz")]
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    # device-lane events: pid/tid of TPU op lanes; keep complete events w/ dur
    by_op = defaultdict(float)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        cat = str(ev.get("cat", ""))
        args = ev.get("args", {})
        # XLA op events carry 'long_name' or run on 'XLA Ops' lanes
        if "run_id" in args or "long_name" in args or cat == "tpu_op":
            key = re.sub(r"[.\d]+$", "", name)
            by_op[key] += ev["dur"]
            total += ev["dur"]
    if not by_op:
        # fallback: take the densest thread
        lanes = defaultdict(float)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                lanes[(ev.get("pid"), ev.get("tid"))] += ev["dur"]
        best_lane = max(lanes, key=lanes.get)
        for ev in data.get("traceEvents", []):
            if (ev.get("ph") == "X" and "dur" in ev
                    and (ev.get("pid"), ev.get("tid")) == best_lane):
                key = re.sub(r"[.\d]+$", "", ev.get("name", ""))
                by_op[key] += ev["dur"]
                total += ev["dur"]

    print(f"\ntotal device op time: {total/1000/3:.1f} ms/step over 3 steps")
    print(f"{'op':70s} {'ms/step':>9s} {'%':>6s}")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{name[:70]:70s} {us/1000/3:9.3f} {us/total*100:6.1f}")


if __name__ == "__main__":
    main()
