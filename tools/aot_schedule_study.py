"""Multi-chip schedule study: deviceless XLA:TPU AOT compile of the sharded
step for a v5e topology, then measure how the latency-hiding scheduler
placed the halo collectives.

Real multi-chip hardware is unavailable here (one v5e behind a tunnel), so
this is the strongest honest evidence for the BASELINE north-star clause
"halo exchange overlapped with interior compute": the compiled module IS
the program N real chips would run, its instruction order IS the schedule,
and each collective-permute-start ... collective-permute-done pair brackets
the compute XLA chose to overlap with the transfer.

Run:  python tools/aot_schedule_study.py [topologies] [n_levels] [gen_levels]
Defaults: "v5e:2x2,v5e:2x4,v5e:4x4" (4/8/16 chips), 16 levels, bundled
x1.2562 mesh (pass gen_levels, e.g. 6 -> x1.40962, to study a generated
mesh).  For each topology: per-collective overlap stats PLUS a cross-check
of the scheduled collective-permute count against the scaling budget's
prediction (#refreshes x (cell rounds + edge rounds), the same accounting
tools/scaling_budget.py charges ICI latency for — the two models must
agree or one of them is wrong).  Writes all topologies into one
docs/validation/aot_schedule.json artifact.
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


def predicted_collectives(sm, nl, levels):
    """The scaling-budget model's collective count for this partition/
    schedule (exchange_bytes_per_step accounting)."""
    from mpas_tpu.parallel import partition as P
    n_scal = 0 if sm.state.scalars is None else int(sm.state.scalars.shape[1])
    acct = P.exchange_bytes_per_step(sm.partition, nl, levels,
                                     n_scalars=n_scal)
    return int(acct["collectives"]), acct


def study_one(topo_name, levels, nl, m, jax, topologies, np):
    from mpas_tpu.parallel.sharded import aot_lower_sharded_step, shard_model

    topo = topologies.get_topology_desc(platform="tpu", topology_name=topo_name)
    n = len(topo.devices)
    print(f"\n=== topology {topo_name}: {n} chips ===", flush=True)

    cpu_devs = jax.devices("cpu")[:n]
    sm = shard_model(m, n, devices=cpu_devs)
    comp = aot_lower_sharded_step(sm, topo.devices)
    txt = comp.as_text()
    n_start = len(re.findall(r'= .* collective-permute-start\(', txt))
    n_done = len(re.findall(r'= .* collective-permute-done\(', txt))
    pairs = analyze_schedule(txt)
    pred, acct = predicted_collectives(sm, nl, levels)
    print(f"async collective-permute pairs: start={n_start} done={n_done}; "
          f"scaling-budget prediction: {pred} "
          f"(match={'YES' if n_start == pred else 'NO'})")
    if pairs:
        pairs = np.array(pairs)
        overlapped = (pairs > 0).sum()
        print(f"scheduled with compute in flight: {overlapped}/{len(pairs)} "
              f"(instructions between start and done: "
              f"median {np.median(pairs):.0f}, max {pairs.max()})")
    out = f"/tmp/sharded_tpu_schedule_{topo_name.replace(':', '_')}.txt"
    open(out, "w").write(txt)
    print("schedule written to", out)
    return {
        "topology": topo_name, "n_chips": n, "n_levels": levels,
        "collective_permute_start": n_start,
        "collective_permute_done": n_done,
        "budget_predicted_collectives": pred,
        "budget_matches_schedule": bool(n_start == pred),
        "pairs_analyzed": int(len(pairs)),
        "pairs_with_compute_in_flight": int((np.array(pairs) > 0).sum()) if len(pairs) else 0,
        "ops_between_start_done": {
            "median": float(np.median(pairs)) if len(pairs) else None,
            "max": int(np.max(pairs)) if len(pairs) else None,
        },
    }


def main():
    topo_names = (sys.argv[1] if len(sys.argv) > 1
                  else "v5e:2x2,v5e:2x4,v5e:4x4").split(",")
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    gen_levels = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    max_chips = 16
    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={max_chips}")
    import jax
    from jax.experimental import topologies
    import numpy as np

    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model

    nl = Namelist(config_nvertlevels=levels, config_ztop=30000.0,
                  dtype="float32", config_jw_u_perturbation=1.0)
    mesh = None
    mesh_name = "x1.2562"
    if gen_levels:
        from mpas_tpu.mesh.writer import generate_and_cache
        mesh = generate_and_cache(gen_levels)
        mesh_name = f"x1.{mesh.nCells}"
    m = build_model(namelist=nl, mesh=mesh)

    arts = [study_one(t, levels, nl, m, jax, topologies, np)
            for t in topo_names]
    for a in arts:
        a["mesh"] = mesh_name

    import json
    # the default (bundled-mesh) study owns aot_schedule.json; generated-
    # mesh studies write a mesh-suffixed artifact so they don't clobber it
    fname = ("aot_schedule.json" if not gen_levels
             else f"aot_schedule_{mesh_name.replace('.', '')}.json")
    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "validation", fname)
    json.dump({"topologies": arts}, open(path, "w"), indent=1)
    print("\nartifact:", path)
    for a in arts:
        print(f"  {a['topology']}: {a['pairs_with_compute_in_flight']}/"
              f"{a['pairs_analyzed']} overlapped, "
              f"{a['collective_permute_start']} collectives "
              f"(budget {a['budget_predicted_collectives']}, "
              f"match={a['budget_matches_schedule']})")


if __name__ == "__main__":
    main()
