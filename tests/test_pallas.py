"""Pallas fused acoustic kernel: bit-level equivalence with the XLA path
(interpret mode on CPU; the compiled kernel runs in bench/TPU configs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.config import Namelist
from mpas_tpu.mesh.generator import generate_mesh
from mpas_tpu.ops import acoustic as A
from mpas_tpu.ops import recover as R
from mpas_tpu.ops import tendencies as T


def test_pallas_acoustic_matches_xla():
    from mpas_tpu.dynamics.model import build_model
    mesh = generate_mesh(levels=3, lloyd_iterations=2)
    nl = Namelist(config_nvertlevels=8, config_ztop=30000.0, dtype="float64",
                  config_jw_u_perturbation=1.0)
    m = build_model(namelist=nl, mesh=mesh)
    state = R.compute_moist_coefficients(m.state, m.mesh_arrays)
    save = R.rk_integration_setup(state)
    coefs = A.compute_vert_imp_coefs(state, m.static, m.vert, nl, 240.0)
    tend = T.compute_dyn_tend(state, save, m.static, m.mesh_arrays, m.vert,
                              nl, 0, 720.0)
    tend = R.set_smlstep_pert_variables(tend, m.static, m.mesh_arrays, m.vert)
    z = jnp.zeros_like
    ac0 = A.AcousticState(ru_p=z(state.u), rho_pp=z(state.rho_p),
                          rtheta_pp=z(state.rtheta_p),
                          rtheta_pp_old=z(state.rtheta_p), rw_p=z(state.rw))
    args = (ac0, z(state.ruAvg), z(state.wwAvg), tend, coefs, state, save,
            m.static, m.mesh_arrays, m.vert)
    ac1, _, ww1 = A.advance_acoustic_step(*args, nl, 240.0, 0)
    nlp = nl.replace(config_use_pallas_acoustic=True)
    ac2, _, ww2 = A.advance_acoustic_step(*args, nlp, 240.0, 0)
    for n in ["rho_pp", "rtheta_pp", "rw_p"]:
        a, b = np.asarray(getattr(ac1, n)), np.asarray(getattr(ac2, n))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-12, n
    assert float(jnp.abs(ww1 - ww2).max()) < 1e-12
