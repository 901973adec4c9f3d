"""Legacy-interop escape hatch (PARITY.md section 2.6): raw-pointer native
code called from inside jit via jax.pure_callback — the TPU-native
equivalent of the reference's raw-pointer Fortran physics interop
(/root/reference/fortran/examples.rg:24-59)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.physics import legacy


pytestmark = pytest.mark.skipif(not legacy.available(),
                                reason="native toolchain unavailable")


def test_callback_matches_oracle_inside_jit():
    rng = np.random.default_rng(0)
    K, C = 8, 321
    theta = jnp.asarray(rng.standard_normal((K, C)) * 30 + 300)
    ref = jnp.asarray(np.linspace(280.0, 400.0, K))
    tau = 86400.0

    @jax.jit
    def step(th):
        # legacy physics coupled into a (toy) update inside one jitted program
        tend = legacy.legacy_relaxation_tend(th, ref, tau)
        return th + 60.0 * tend

    out = np.asarray(step(theta))
    want = np.asarray(theta) + 60.0 * (-(np.asarray(theta)
                                         - np.asarray(ref)[:, None]) / tau)
    np.testing.assert_allclose(out, want, rtol=1e-12)


def test_callback_in_model_coupling():
    """The escape hatch drives the dycore's physics slot: one SRK3 step with
    a legacy-computed rt_diabatic_tend stays finite and applies heating."""
    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.generator import generate_mesh
    nl = Namelist(config_nvertlevels=6, config_ztop=30000.0, dtype="float64",
                  config_jw_u_perturbation=0.0)
    m = build_model(namelist=nl, mesh=generate_mesh(levels=3,
                                                    lloyd_iterations=2))
    ref = jnp.asarray(np.linspace(280.0, 500.0, 6))
    tend = legacy.legacy_relaxation_tend(m.state.theta_m, ref, 6 * 3600.0)
    s = m.state.replace(rt_diabatic_tend=tend)
    s1 = m.step_fn(s)
    assert not bool(jnp.any(jnp.isnan(s1.theta_m)))
    # the relaxation actually changed theta relative to an unforced step
    s1_free = m.step_fn(m.state)
    assert float(jnp.abs(s1.theta_m - s1_free.theta_m).max()) > 1e-6
