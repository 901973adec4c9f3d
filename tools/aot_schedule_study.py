"""Multi-chip schedule study: deviceless XLA:TPU AOT compile of the sharded
step for a v5e topology, then measure how the latency-hiding scheduler
placed the halo collectives.

Real multi-chip hardware is unavailable here (one v5e behind a tunnel), so
this is the strongest honest evidence for the BASELINE north-star clause
"halo exchange overlapped with interior compute": the compiled module IS
the program N real chips would run, its instruction order IS the schedule,
and each collective-permute-start ... collective-permute-done pair brackets
the compute XLA chose to overlap with the transfer.

Run:  python tools/aot_schedule_study.py [topology] [n_levels]
Defaults: v5e:2x2 (4 chips), 16 levels, x1.2562 mesh.
Prints per-collective overlap stats and writes docs-ready numbers.
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def analyze_schedule(hlo_text: str):
    """Per async-collective overlap: instructions + estimated bytes of
    compute scheduled between each start and its matching done."""
    pairs = []
    # TPU as_text lists instructions in schedule order
    open_starts = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        mm = re.match(r'%?([\w.-]+) = .* collective-permute-start\(', line)
        if mm:
            open_starts[mm.group(1)] = 0
            continue
        mm = re.match(r'%?[\w.-]+ = .* collective-permute-done\(%?([\w.-]+)',
                      line)
        if mm:
            name = mm.group(1)
            if name in open_starts:
                pairs.append(open_starts.pop(name))
            continue
        if " = " in line and not line.startswith(("ROOT", "//")):
            for k in open_starts:
                open_starts[k] += 1
    return pairs


def main():
    topo_name = sys.argv[1] if len(sys.argv) > 1 else "v5e:2x2"
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    from jax.experimental import topologies
    import numpy as np

    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.parallel.sharded import aot_lower_sharded_step, shard_model

    topo = topologies.get_topology_desc(platform="tpu", topology_name=topo_name)
    n = len(topo.devices)
    print(f"topology {topo_name}: {n} chips", flush=True)

    cpu_devs = jax.devices("cpu")[:n]
    nl = Namelist(config_nvertlevels=levels, config_ztop=30000.0,
                  dtype="float32", config_jw_u_perturbation=1.0)
    m = build_model(namelist=nl)
    sm = shard_model(m, n, devices=cpu_devs)
    comp = aot_lower_sharded_step(sm, topo.devices)
    txt = comp.as_text()
    n_start = len(re.findall(r'= .* collective-permute-start\(', txt))
    n_done = len(re.findall(r'= .* collective-permute-done\(', txt))
    pairs = analyze_schedule(txt)
    print(f"async collective-permute pairs: start={n_start} done={n_done}")
    if pairs:
        pairs = np.array(pairs)
        overlapped = (pairs > 0).sum()
        print(f"scheduled with compute in flight: {overlapped}/{len(pairs)} "
              f"(instructions between start and done: "
              f"median {np.median(pairs):.0f}, max {pairs.max()})")
    out = "/tmp/sharded_tpu_schedule.txt"
    open(out, "w").write(txt)
    print("schedule written to", out)

    import json
    art = {
        "topology": topo_name, "n_chips": n, "n_levels": levels,
        "collective_permute_start": n_start,
        "collective_permute_done": n_done,
        "pairs_analyzed": int(len(pairs)),
        "pairs_with_compute_in_flight": int((np.array(pairs) > 0).sum()) if len(pairs) else 0,
        "ops_between_start_done": {
            "median": float(np.median(pairs)) if len(pairs) else None,
            "max": int(np.max(pairs)) if len(pairs) else None,
        },
    }
    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "validation", "aot_schedule.json")
    json.dump(art, open(path, "w"), indent=1)
    print("artifact:", path, art)


if __name__ == "__main__":
    main()
