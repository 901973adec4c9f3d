"""mpas_tpu: a TPU-native MPAS-Atmosphere nonhydrostatic dynamical core.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
alexaiken/mpas-regent (the Regent/Legion port of NCAR's MPAS-Atmosphere):
centroidal-Voronoi C-grid mesh, terrain-following height coordinate,
3rd-order Runge-Kutta split-explicit timestep with vertically implicit
acoustic/gravity-wave integration, Jablonowski-Williamson initialization,
METIS-seeded domain decomposition with halo exchange over the device mesh,
and CAM-style radiation physics scaffolding.
"""

from .config import Namelist, REFERENCE_NAMELIST

__version__ = "0.1.0"
