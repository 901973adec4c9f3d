"""Multi-host sharding verification: runs tools/multihost_demo.py (two JAX
processes over a localhost coordinator, one 8-device global CPU mesh) and
asserts the cross-process run matches single-device — the BASELINE.json
multi-host target (Parallelization in Regent.md:150-173)."""

import os
import subprocess
import sys

DEMO = os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                    "multihost_demo.py")


def test_two_process_run_matches_single_device():
    # bounded by the subprocess timeout below (pytest-timeout not installed)
    env = dict(os.environ)
    env.pop("MPAS_MH_PID", None)
    env["MPAS_MH_PORT"] = "56431"
    r = subprocess.run([sys.executable, DEMO], env=env, capture_output=True,
                       text=True, timeout=780)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "MULTIHOST OK" in r.stdout
