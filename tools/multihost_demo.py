"""Multi-host (DCN) sharding verification on CPU.

Launches TWO separate JAX processes (jax.distributed.initialize over a
localhost coordinator), each with 4 virtual CPU devices, forming one
8-device global mesh spanning both processes — the CPU stand-in for a
2-host TPU pod slice.  Each process:

  1. builds the model host-side (deterministic, replicated preprocessing),
  2. shard_model(8) — global arrays assembled per-process via
     jax.make_array_from_callback (each process donates the blocks of its
     4 addressable devices),
  3. runs 2 SRK3 steps of the full sharded program (halo ppermutes cross
     the process boundary over the distributed backend),
  4. computes a single-device reference on its own CPU and checks every
     ADDRESSABLE shard's owned entries against it,
  5. checks the in-program psum/pmax summarize is identical on both
     processes.

This is the verification artifact for BASELINE.json's multi-host target
(the reference's Legion multi-node slot, Parallelization in Regent.md:
150-173).  Run:  python tools/multihost_demo.py
Exit code 0 + "MULTIHOST OK" on success.
"""

import os
import subprocess
import sys

PORT = int(os.environ.get("MPAS_MH_PORT", "56427"))


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=2, process_id=pid)
    import numpy as np

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.parallel.sharded import shard_model, sharded_summarize

    nl = Namelist(config_nvertlevels=4, config_ztop=30000.0, dtype="float32",
                  config_jw_u_perturbation=1.0)
    m = build_model(namelist=nl)
    sm = shard_model(m, 8, devices=jax.devices())
    sm.step(2)

    # single-device reference on this process's local CPU
    ref = m.state
    for _ in range(2):
        ref = m.step_fn(ref)

    p = sm.partition
    n_checked = 0
    for name in ("u", "w", "theta_m", "rho_zz"):
        # fields are level-major [K, N]: the entity axis is LAST
        a_ref = np.asarray(getattr(ref, name))
        x = getattr(sm.state, name)
        if x.shape[-1] == p.cell_l2g.shape[1]:
            l2g, om = p.cell_l2g, p.cell_owned_mask
        else:
            l2g, om = p.edge_l2g, p.edge_owned_mask
        for shard in x.addressable_shards:
            s = shard.index[0].start or 0
            local = np.asarray(shard.data)[0]
            sel = om[s] > 0
            want = a_ref[:, l2g[s][sel]]
            got = local[:, sel]
            scale = np.abs(want).max() + 1e-30
            err = np.abs(want - got).max() / scale
            # f32 fusion-order roundoff across the distributed compile is
            # O(1e-4) over 2 steps; a real sharding bug shows as O(1)
            assert err < 5e-4, (name, s, err)
            n_checked += 1
    s = sharded_summarize(sm)
    assert not s["nan_detected"], s

    # cross-process gather_state: every process reassembles the SAME full
    # global arrays (process_allgather over the DCN stand-in) and they match
    # the single-device reference — the multi-host history/restart path
    g = sm.gather_state(m.mesh)
    for name in ("u", "w", "theta_m", "rho_zz"):
        a_ref = np.asarray(getattr(ref, name))
        scale = np.abs(a_ref).max() + 1e-30
        err = np.abs(g[name] - a_ref).max() / scale
        assert err < 5e-4, ("gather_state", name, err)
    print(f"process {pid}: checked {n_checked} owned shard blocks + full "
          f"gather_state; summarize u_max={s['u_max']:.4f}", flush=True)
    if pid == 0:
        print("MULTIHOST OK", flush=True)


def main():
    if "MPAS_MH_PID" in os.environ:
        worker(int(os.environ["MPAS_MH_PID"]))
        return
    procs = []
    for pid in range(2):
        env = dict(os.environ, MPAS_MH_PID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    rc = 0
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        rc |= p.returncode
    for i, out in enumerate(outs):
        print(f"--- process {i} ---")
        print(out[-2000:])
    if rc != 0 or "MULTIHOST OK" not in outs[0]:
        sys.exit(1)


if __name__ == "__main__":
    main()
