"""Test configuration: CPU backend with 8 virtual XLA devices (for sharding
tests) and float64 enabled (numerics validation)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# the env var alone is not reliable here (an 'axon' TPU plugin may override
# it); set the config explicitly before any device query
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GRID = "/root/reference/mesh_loading/x1.2562.grid.nc"


@pytest.fixture(scope="session")
def mesh():
    from mpas_tpu.mesh.loader import load_mesh
    return load_mesh(GRID)


@pytest.fixture(scope="session")
def namelist():
    from mpas_tpu.config import Namelist
    return Namelist(config_nvertlevels=8, config_ztop=30000.0, dtype="float64",
                    config_jw_u_perturbation=0.0)


@pytest.fixture(scope="session")
def model(namelist):
    from mpas_tpu.dynamics.model import build_model
    return build_model(namelist=namelist)
