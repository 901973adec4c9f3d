"""Command-line model driver: the main.rg analog.

Reproduces the reference's run flow (main.rg:15-75): load mesh -> (partition)
-> JW init -> core init -> timestep loop with per-step summaries -> history
output, as a real CLI:

    python -m mpas_tpu --grid x1.2562.grid.nc --levels 26 --steps 10 \
        --dt 720 --output timestep_output.nc [--config namelist.json]
        [--shards 8] [--restart ckpt.npz] [--checkpoint-every 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _honor_platform_env():
    """The env var JAX_PLATFORMS=cpu alone is not reliable here (a TPU
    plugin may claim the backend anyway); set the config explicitly before
    any device query so --shards N can use the virtual CPU devices."""
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass


def main(argv=None):
    _honor_platform_env()
    ap = argparse.ArgumentParser(prog="python -m mpas_tpu",
                                 description="TPU-native MPAS-Atmosphere dycore")
    ap.add_argument("--grid", default="/root/reference/mesh_loading/x1.2562.grid.nc",
                    help="MPAS grid netCDF (or 'generate:LEVELS' for a "
                         "synthetic CVT mesh, e.g. generate:5 -> 10242 cells)")
    ap.add_argument("--config", default=None, help="namelist file (JSON or name=value)")
    ap.add_argument("--levels", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--ztop", type=float, default=None)
    ap.add_argument("--dtype", default=None, choices=["float32", "float64"])
    ap.add_argument("--no-perturbation", action="store_true")
    ap.add_argument("--orient-edges", action="store_true",
                    help="ownership-aligned edge numbering (mesh/orient.py)"
                         " — the recommended single-chip production setting"
                         " (1.19x step time, docs/PERF.md); edge ids/"
                         "checkpoints are not interchangeable with the "
                         "default numbering")
    ap.add_argument("--output", default="timestep_output.nc")
    ap.add_argument("--output-full-3d", action="store_true")
    ap.add_argument("--history-every", type=int, default=0,
                    help="record a history snapshot every N steps (the "
                         "output becomes a multi-time-level file)")
    ap.add_argument("--log-every", type=int, default=0,
                    help="steps between summarize/NaN-check fetches (each "
                         "fetch is a device->host sync — a full RTT on "
                         "tunneled backends, where per-step fetches were "
                         "measured to dominate wall-clock: 578 vs 98 ms "
                         "device time).  Default 0 = every 10 steps.")
    ap.add_argument("--shards", type=int, default=0,
                    help="domain-decompose over N devices (0 = single device)")
    ap.add_argument("--metis", default=None, help="METIS partition file")
    ap.add_argument("--restart", default=None, help="restart checkpoint to resume")
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--checkpoint-path", default="restart.npz")
    ap.add_argument("--physics", action="store_true",
                    help="enable the radiation/cloud physics driver")
    ap.add_argument("--radt-steps", type=int, default=5,
                    help="dynamics steps between radiation calls (>= 1)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    from .config import Namelist
    from .dynamics.model import build_model
    from .io.history import write_history, save_restart, load_restart

    nl = Namelist.from_file(args.config) if args.config else Namelist()
    overrides = {}
    if args.levels is not None:
        if args.levels < 3:
            ap.error(f"--levels must be >= 3 (got {args.levels}): the vertical "
                     "solver needs at least 3 mass levels")
        overrides["config_nvertlevels"] = args.levels
    if args.dt is not None:
        overrides["config_dt"] = args.dt
    if args.ztop is not None:
        overrides["config_ztop"] = args.ztop
    if args.steps is not None:
        overrides["config_run_duration_steps"] = args.steps
    if args.dtype is not None:
        overrides["dtype"] = args.dtype
    if args.no_perturbation:
        overrides["config_jw_u_perturbation"] = 0.0
    if args.orient_edges:
        overrides["config_orient_edges"] = True
    nl = nl.replace(**overrides)

    log = (lambda *a: None) if args.quiet else print

    mesh = None
    if args.grid.startswith("generate:"):
        from .mesh.writer import generate_and_cache
        levels = int(args.grid.split(":")[1])
        log(f"generating (or loading cached) x1.{10 * 4 ** levels + 2} CVT mesh ...")
        # honor a reduced-planet namelist (DCMIP-style small-sphere cases)
        mesh = generate_and_cache(levels,
                                  sphere_radius=nl.config_sphere_radius)
        grid_path = None
    else:
        grid_path = args.grid

    # MPAS rule of thumb: dt ~ 6 s per km of cell spacing; apply when the
    # user did not set an explicit dt (avoids acoustic CFL violation on
    # finer meshes than the 480 km default)
    if args.dt is None and args.config is None:
        import numpy as _np
        if mesh is None:
            from .mesh.loader import load_mesh as _lm
            mesh = _lm(grid_path or args.grid)
        # use the MINIMUM spacing: cs*(dt/2)/dx_min = 0.17*a at a s/km
        dx_km = float(_np.min(mesh.dcEdge)) / 1e3
        # 4 s/km keeps the acoustic CFL ~0.65 with 2 substeps (6 s/km is
        # marginal at CFL ~1 and unstable on imperfect CVT meshes)
        nl = nl.replace(config_dt=min(720.0, 4.0 * dx_km))
    t0 = time.time()
    log(f"building model (levels={nl.config_nvertlevels}, dt={nl.config_dt:.0f}s) ...")
    model = build_model(grid_path=grid_path or args.grid, namelist=nl, mesh=mesh)
    log(f"model ready in {time.time() - t0:.1f}s: {model.mesh.nCells} cells, "
        f"{model.mesh.nEdges} edges, {nl.config_nvertlevels} levels")

    runner = model
    sharded = args.shards > 1
    if sharded:
        from .parallel.sharded import shard_model, sharded_summarize
        log(f"sharding over {args.shards} devices ...")
        runner = shard_model(model, args.shards)

    if args.restart:
        # a sharded checkpoint restores into the sharded runner, a
        # single-device checkpoint into the model — same shard count required
        load_restart(args.restart, runner)
        log(f"resumed from {args.restart} at step {runner.step_count}")

    phys = None
    if args.physics:
        if args.radt_steps < 1:
            ap.error(f"--radt-steps must be >= 1 (got {args.radt_steps})")
        from .physics.driver import physics_init
        phys = physics_init()
        if sharded:
            runner.enable_physics(phys)

    hist = None
    if args.output and args.history_every:
        from .io.history import HistoryWriter
        hist = HistoryWriter(model, full_3d=args.output_full_3d)

    def record_history():
        if hist is None:
            return
        if sharded:
            from .io.history import gathered_state
            hist.record(state=gathered_state(runner, model),
                        time_value=float(runner.step_count))
        else:
            hist.record()

    n_steps = nl.config_run_duration_steps
    t0 = time.time()
    for step in range(n_steps):
        if phys is not None and step % args.radt_steps == 0:
            if sharded:
                runner.apply_physics(phys)
                log("  physics: radiation interval applied (sharded)")
            else:
                pd = model.apply_physics(phys)
                log(f"  physics: cldfra max={pd['cldfra'].max():.2f} "
                    f"OLR mean={pd['olr'].mean():.0f} W/m2 "
                    f"qr range=[{(pd['qrl'].min()*86400):.1f},"
                    f"{(pd['qrs'].max()*86400):.1f}] K/day")
        runner.step(1)
        # summarize forces a device->host sync (a full RTT on tunneled
        # backends): fetch only every --log-every steps (default: every 10)
        log_every = args.log_every if args.log_every > 0 else 10
        if (step + 1) % log_every == 0 or step + 1 == n_steps:
            if sharded:
                from .parallel.sharded import sharded_summarize
                s = sharded_summarize(runner)
            else:
                s = model.summarize()
            log(f"step {runner.step_count}: "
                f"w=[{s['w_min']:+.3e},{s['w_max']:+.3e}] "
                f"u=[{s['u_min']:+.2f},{s['u_max']:+.2f}]"
                + (" *** NaN detected ***" if s["nan_detected"] else ""))
            if s["nan_detected"]:
                log("aborting: NaN in prognostic fields")
                return 1
        if args.history_every and (step + 1) % args.history_every == 0:
            record_history()
        if args.checkpoint_every and (step + 1) % args.checkpoint_every == 0:
            save_restart(args.checkpoint_path, runner)
            log(f"checkpoint -> {args.checkpoint_path}")
    elapsed = time.time() - t0
    log(f"{n_steps} steps in {elapsed:.2f}s "
        f"({elapsed / max(n_steps, 1) * 1000:.1f} ms/step)")

    if args.output:
        if hist is not None:
            hist.write(args.output)
        elif sharded:
            from .io.history import gathered_state
            write_history(args.output, model, state=gathered_state(runner, model),
                          full_3d=args.output_full_3d)
        else:
            write_history(args.output, model, full_3d=args.output_full_3d)
        log(f"history -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
