"""Multi-chip scaling budget: bytes / collectives / latency model vs v5e
ICI specs, and the projected weak-scaling curve (VERDICT r3 item 7).

Real multi-chip hardware is unavailable in this environment (one v5e chip
behind a tunnel), so this is the quantitative substitute: the ACTUAL
exchange tables built by parallel/partition.py at 2..64 shards provide
per-shard payloads, ppermute round counts, and redundant-compute (halo)
fractions; an explicit ICI cost model turns them into projected step times.

Model assumptions (stated so they can be re-fit on real hardware):
  - v5e ICI: 2-D torus, 4 links/chip, ~1600 Gbps aggregate per chip
    -> ICI_BW_PER_PAIR = 45 GB/s effective one-way per neighbor pair
    (conservative: protocol + fan-in);
  - per-collective launch/latency overhead LAT = 2 us (ppermute on-chip
    schedule + link latency; one v5e hop ~ 1 us);
  - compute: the measured single-chip throughput (bench.py) applied to the
    LOCAL (owned + 3-ring halo) cell count — redundant ring compute is the
    overlap price already paid by the round-4 schedule;
  - no overlap credited (worst case): step = compute + sum of exchanges.
    With the round-4 placement the tend exchange IS overlappable with
    vert_imp_coefs/stage-constant gathers, so real efficiency lands
    between the 'no-overlap' and 'full-overlap' columns.

Usage: python tools/scaling_budget.py [gen_levels ...]
(defaults 6 7 -> x1.40962 + x1.163842; prints a markdown table for
docs/PERF.md).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

ICI_BW_PER_PAIR = 45e9        # B/s effective one-way per neighbor pair
LAT = 2e-6                    # s per collective
K = 41
BYTES = 4
# round-5 XProf device-time rate of the UNALIGNED formulation — the one
# the sharded step uses (the ownership alignment doesn't survive the
# per-shard local renumbering; docs/PERF.md round-5 finding 1).  Override
# with MPAS_CHIP_RATE.
CHIP_CELL_LEVELS_PER_S = float(os.environ.get("MPAS_CHIP_RATE", 22.3e6))


def budget(mesh, S, nl):
    from mpas_tpu.parallel import partition as P
    p = P.build_partition(mesh, S)
    acct = P.exchange_bytes_per_step(p, nl, K, BYTES)

    # per-shard worst-case payload of ONE packed exchange per entity type
    def max_send(x, fields):
        per_shard = np.asarray(x.send_mask).sum(axis=(1, 2))   # values sent
        return per_shard.max() * K * fields * BYTES

    # schedule: counts from the accounting dict
    n_state = acct["state_refreshes"]
    n_tend = acct["tend_refreshes"]
    n_ac = acct["acoustic_refreshes"]
    t_comm = 0.0
    for count, cf, ef in ((n_state, 8, 2), (n_tend, 3, 1), (n_ac, 4, 1)):
        if count == 0:
            continue
        bytes_c = max_send(p.cell_x, cf)
        bytes_e = max_send(p.edge_x, ef)
        rounds = acct["rounds_cell"] + acct["rounds_edge"]
        t_comm += count * (rounds * LAT
                           + bytes_c / ICI_BW_PER_PAIR
                           + bytes_e / ICI_BW_PER_PAIR)

    local = np.asarray(p.cell_mask).sum(axis=1)
    owned = np.asarray(p.cell_owned_mask).sum(axis=1)
    halo_frac = float((local / owned).max()) - 1.0
    t_comp = local.max() * K / CHIP_CELL_LEVELS_PER_S
    return dict(S=S, owned=int(owned.max()), halo_frac=halo_frac,
                collectives=acct["collectives"],
                bytes_per_step=acct["total_bytes_per_step"],
                t_comp=t_comp, t_comm=t_comm,
                t_step=t_comp + t_comm,
                t_step_overlap=max(t_comp, t_comm))


def main():
    levels = [int(a) for a in sys.argv[1:]] or [6, 7]
    from mpas_tpu.config import Namelist
    from mpas_tpu.mesh.writer import generate_and_cache

    nl = Namelist()
    t1 = None
    print("| mesh | shards | owned/shard | halo overhead | collectives/step"
          " | MB/step | comms ms | step ms (no ovl) | step ms (full ovl) |"
          " weak-scale eff |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for lv in levels:
        mesh = generate_and_cache(lv)
        n = mesh.nCells
        base = n * K / CHIP_CELL_LEVELS_PER_S
        for S in (2, 4, 8, 16, 64):
            if n / S < 500:
                continue
            b = budget(mesh, S, nl)
            # weak-scaling reference: one chip running the same per-shard
            # owned size at the measured single-chip rate
            t_ref = b["owned"] * K / CHIP_CELL_LEVELS_PER_S
            eff = t_ref / b["t_step"]
            eff_o = t_ref / b["t_step_overlap"]
            print(f"| x1.{n} | {S} | {b['owned']} | {b['halo_frac']*100:.0f}%"
                  f" | {b['collectives']} |"
                  f" {b['bytes_per_step']/1e6:.1f} |"
                  f" {b['t_comm']*1e3:.2f} | {b['t_step']*1e3:.1f} |"
                  f" {b['t_step_overlap']*1e3:.1f} |"
                  f" {eff*100:.0f}% / {eff_o*100:.0f}% |", flush=True)


if __name__ == "__main__":
    main()
