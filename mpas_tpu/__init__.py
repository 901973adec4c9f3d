"""mpas_tpu: a TPU-native MPAS-Atmosphere nonhydrostatic dynamical core.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
alexaiken/mpas-regent (the Regent/Legion port of NCAR's MPAS-Atmosphere):
centroidal-Voronoi C-grid mesh, terrain-following height coordinate,
3rd-order Runge-Kutta split-explicit timestep with vertically implicit
acoustic/gravity-wave integration, Jablonowski-Williamson initialization,
METIS-seeded domain decomposition with halo exchange over the device mesh,
and CAM-style radiation physics scaffolding.
"""

import os as _os

# persistent XLA compilation cache: the fully-unrolled SRK3 step takes
# 70-300 s to compile on TPU; caching makes repeat runs start instantly
try:
    import jax as _jax
    _cache = _os.environ.get("MPAS_TPU_COMPILE_CACHE",
                             _os.path.expanduser("~/.cache/mpas_tpu_xla"))
    if _cache and _cache != "0":
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from .config import Namelist, REFERENCE_NAMELIST

__version__ = "0.1.0"
