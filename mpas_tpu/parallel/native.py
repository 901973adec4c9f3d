"""ctypes bindings for the native mesh-preprocessing library.

Loads native/libmpas_mesh.so (building it with `make -C native` on first use
if a toolchain is available) and exposes the partitioner / halo-growth /
incident-entity kernels.  Falls back transparently to the numpy
implementations in parallel/partition.py when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmpas_mesh.so")
_lib = None
_tried = False


def load_library():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.mpas_rcb_partition.argtypes = [f64p, ctypes.c_int64, ctypes.c_int32, i32p]
    lib.mpas_grow_rings.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32,
                                    i32p, ctypes.c_int32, ctypes.c_int32,
                                    i32p, ctypes.c_int64, i64p]
    lib.mpas_grow_rings.restype = ctypes.c_int64
    lib.mpas_incident_entities.argtypes = [i32p, i32p, ctypes.c_int32, i32p,
                                           ctypes.c_int64, ctypes.c_int64,
                                           i32p, ctypes.c_int32, i32p,
                                           ctypes.c_int64, i64p]
    lib.mpas_incident_entities.restype = ctypes.c_int64
    _lib = lib
    return _lib


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def available() -> bool:
    return load_library() is not None


def rcb_partition(xyz: np.ndarray, n_parts: int) -> np.ndarray:
    """Native recursive coordinate bisection; xyz [C, 3] float64."""
    lib = load_library()
    assert lib is not None
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    out = np.zeros(len(xyz), dtype=np.int32)
    lib.mpas_rcb_partition(_ptr(xyz, ctypes.c_double), len(xyz), n_parts,
                           _ptr(out, ctypes.c_int32))
    return out


def grow_rings(cells_on_cell, n_edges_on_cell, assign, shard: int, rings: int):
    """Native multi-ring halo growth; returns (local_cells, n_owned)."""
    lib = load_library()
    assert lib is not None
    coc = np.ascontiguousarray(cells_on_cell, dtype=np.int32)
    nec = np.ascontiguousarray(n_edges_on_cell, dtype=np.int32)
    asn = np.ascontiguousarray(assign, dtype=np.int32)
    C, M = coc.shape
    cap = C
    out = np.zeros(cap, dtype=np.int32)
    offs = np.zeros(rings + 1, dtype=np.int64)
    n = lib.mpas_grow_rings(_ptr(coc, ctypes.c_int32), _ptr(nec, ctypes.c_int32),
                            C, M, _ptr(asn, ctypes.c_int32), shard, rings,
                            _ptr(out, ctypes.c_int32), cap,
                            _ptr(offs, ctypes.c_int64))
    assert n >= 0
    return out[:n].copy(), int(offs[0])


def incident_entities(ent_on_cell, n_on_cell, local_cells, n_ent, owner,
                      shard: int):
    """Native incident-entity collection; returns (entities, n_owned)."""
    lib = load_library()
    assert lib is not None
    eoc = np.ascontiguousarray(ent_on_cell, dtype=np.int32)
    lc = np.ascontiguousarray(local_cells, dtype=np.int32)
    own = np.ascontiguousarray(owner, dtype=np.int32)
    width = eoc.shape[1]
    noc = (np.ascontiguousarray(n_on_cell, dtype=np.int32)
           if n_on_cell is not None else None)
    out = np.zeros(n_ent, dtype=np.int32)
    n_owned = np.zeros(1, dtype=np.int64)
    n = lib.mpas_incident_entities(
        _ptr(eoc, ctypes.c_int32),
        _ptr(noc, ctypes.c_int32) if noc is not None else None,
        width, _ptr(lc, ctypes.c_int32), len(lc), n_ent,
        _ptr(own, ctypes.c_int32), shard, _ptr(out, ctypes.c_int32),
        n_ent, _ptr(n_owned, ctypes.c_int64))
    assert n >= 0
    return out[:n].copy(), int(n_owned[0])
