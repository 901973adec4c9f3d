"""Legacy-code interop escape hatch: host-native physics inside the jitted
dycore via jax.pure_callback.

The reference documents calling raw-pointer Fortran physics from Regent
tasks (/root/reference/fortran/examples.rg:24-59) as its interop story for
schemes that will never be ported.  The TPU-native equivalent wraps the
legacy routine (here a C stand-in, native/mesh_preprocess.cpp
legacy_column_relaxation — any Fortran/C/C++ symbol loadable via ctypes
works the same way) in `jax.pure_callback`: XLA suspends the device
program, ships the operands to the host, runs the raw-pointer code, and
resumes with its output.  This trades device-side fusion for zero porting
cost — appropriate for slow-cadence physics, never for per-step kernels.

Demonstrated + tested in tests/test_legacy_interop.py: the callback result
matches the numpy oracle bitwise and composes with jit.
"""

from __future__ import annotations

import ctypes

import jax
import jax.numpy as jnp
import numpy as np


def _fn():
    from ..parallel import native
    lib = native.load_library()
    if lib is None:
        return None
    try:
        f = lib.legacy_column_relaxation
    except AttributeError:
        # stale libmpas_mesh.so built before this symbol existed; treat the
        # legacy path as unavailable rather than crashing callers/skipifs
        return None
    f.argtypes = [ctypes.POINTER(ctypes.c_double),
                  ctypes.POINTER(ctypes.c_double), ctypes.c_double,
                  ctypes.c_int64, ctypes.c_int64,
                  ctypes.POINTER(ctypes.c_double)]
    f.restype = None
    return f


def available() -> bool:
    return _fn() is not None


def _host_relaxation(theta, theta_ref, tau):
    """Host side of the callback: numpy -> raw pointers -> legacy C."""
    f = _fn()
    theta = np.ascontiguousarray(theta, np.float64)
    theta_ref = np.ascontiguousarray(theta_ref, np.float64)
    K, C = theta.shape
    out = np.empty_like(theta)
    dp = ctypes.POINTER(ctypes.c_double)
    f(theta.ctypes.data_as(dp), theta_ref.ctypes.data_as(dp),
      float(tau), K, C, out.ctypes.data_as(dp))
    return out


def legacy_relaxation_tend(theta, theta_ref, tau: float):
    """Jit-compatible Newtonian relaxation tendency computed by the legacy
    raw-pointer routine: tend = -(theta - theta_ref[:, None]) / tau.

    theta [K, C] (level-major, core/state.py), theta_ref [K]."""
    shape = jax.ShapeDtypeStruct(theta.shape, jnp.float64)
    out = jax.pure_callback(
        lambda th, tr: _host_relaxation(th, tr, tau), shape,
        theta.astype(jnp.float64), theta_ref.astype(jnp.float64),
        vmap_method="sequential")
    return out.astype(theta.dtype)
