"""Probe: can Mosaic (jax 0.9.x) express the dycore's gather shapes in
Pallas?  Round 3 (jax 0.8.x) could not address multi-vreg gather tables;
docs/PERF.md lever 1 says re-test on new releases.

Tries, on the real TPU:
  A. jnp.take(tbl, idx, axis=1) with tbl [K, C] VMEM-resident, idx [R]
  B. jnp.take_along_axis(tbl, idx2d, axis=1) with idx2d [K, R]
  C. a fused 10-slot weighted reduction (the slot_reduce shape)

Prints which lower + run, and their timing vs the XLA take() baseline.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 83
C = 40962
R = 122880
M = 10


def timeit(f, *args, reps=50):
    o = jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*args)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (K, C), jnp.float32)
    idx = jax.random.randint(key, (R,), 0, C, jnp.int32)
    idx_slots = jax.random.randint(key, (R, M), 0, C, jnp.int32)
    w = jax.random.normal(key, (R, M), jnp.float32)

    base = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
    t_xla = timeit(base, tbl, idx)
    print(f"XLA take [K={K},C={C}] idx[R={R}]: {t_xla:.3f} ms")

    # ---- A: jnp.take along lanes, full table in VMEM, blocked over R ----
    BR = 1024

    def kern_a(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[0], axis=1)

    @jax.jit
    def take_a(tbl, idx):
        return pl.pallas_call(
            kern_a,
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((1, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, BR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, R), jnp.float32),
        )(idx[None, :], tbl)

    try:
        out = jax.block_until_ready(take_a(tbl, idx))
        ref = base(tbl, idx)
        err = jnp.abs(out - ref).max()
        t = timeit(take_a, tbl, idx)
        print(f"A jnp.take in pallas: OK err={err:.2e}  {t:.3f} ms")
    except Exception as e:
        print(f"A jnp.take in pallas: FAIL {type(e).__name__}: {str(e)[:300]}")

    # ---- B: take_along_axis with broadcast idx ----
    def kern_b(idx_ref, tbl_ref, out_ref):
        i2 = jnp.broadcast_to(idx_ref[:], (K, idx_ref.shape[1]))
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], i2, axis=1)

    @jax.jit
    def take_b(tbl, idx):
        return pl.pallas_call(
            kern_b,
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((1, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, BR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, R), jnp.float32),
        )(idx[None, :], tbl)

    try:
        out = jax.block_until_ready(take_b(tbl, idx))
        ref = base(tbl, idx)
        err = jnp.abs(out - ref).max()
        t = timeit(take_b, tbl, idx)
        print(f"B take_along_axis in pallas: OK err={err:.2e}  {t:.3f} ms")
    except Exception as e:
        print(f"B take_along_axis in pallas: FAIL {type(e).__name__}: {str(e)[:300]}")

    # ---- C: fused 10-slot weighted reduce ----
    def kern_c(idx_ref, w_ref, tbl_ref, out_ref):
        acc = None
        for m in range(M):
            g = jnp.take(tbl_ref[:], idx_ref[m], axis=1)        # [K, BR]
            t = w_ref[m][None, :] * g
            acc = t if acc is None else acc + t
        out_ref[:] = acc

    @jax.jit
    def reduce_c(tbl, idx_slots, w):
        return pl.pallas_call(
            kern_c,
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((M, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((M, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, BR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, R), jnp.float32),
        )(idx_slots.T.copy(), w.T.copy(), tbl)

    def reduce_xla(tbl, idx_slots, w):
        acc = None
        for m in range(M):
            t = w[:, m][None, :] * jnp.take(tbl, idx_slots[:, m], axis=1)
            acc = t if acc is None else acc + t
        return acc

    try:
        out = jax.block_until_ready(reduce_c(tbl, idx_slots, w))
        ref = jax.jit(reduce_xla)(tbl, idx_slots, w)
        err = (jnp.abs(out - ref).max() / jnp.abs(ref).max())
        t = timeit(reduce_c, tbl, idx_slots, w)
        t_x = timeit(jax.jit(reduce_xla), tbl, idx_slots, w)
        print(f"C fused slot-reduce pallas: OK err={err:.2e}  {t:.3f} ms "
              f"(XLA: {t_x:.3f} ms)")
    except Exception as e:
        print(f"C fused slot-reduce pallas: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
