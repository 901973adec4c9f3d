"""Micro-probe of the ownership-aligned primitives vs plain gathers at the
bench shape (C=40962, E=3C, K=41, f32).

CAUTIONARY ARTIFACT (docs/PERF.md round-5 finding 1): these isolated
per-op timings pointed the WRONG way — they miss the fusion benefit that
makes the aligned formulation win 1.19x in the full program (slice terms
fuse into elementwise chains; gathers cannot).  Kept as the record of why
fusion-sensitive changes must be judged by whole-program XProf device
time, never by op-level microbenchmarks."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

C, K = 40962, 41
E = 3 * C


def timed(f, *args, n=30):
    g = jax.jit(f)
    r = g(*args)
    jax.block_until_ready(r)
    t1 = time.time()
    for _ in range(n):
        r = g(*args)
    jax.block_until_ready(r)
    t2 = time.time()
    for _ in range(2 * n):
        r = g(*args)
    jax.block_until_ready(r)
    t3 = time.time()
    return ((t3 - t2) - (t2 - t1)) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((K, C)), jnp.float32)
    g_e = jnp.asarray(rng.standard_normal((K, E)), jnp.float32)
    idx = rng.integers(0, C, E).astype(np.int32)          # cell1-style
    eoc = rng.integers(0, E, (C, 10)).astype(np.int32)    # 10-slot reduce
    idx4 = rng.integers(0, E, (C, 4)).astype(np.int32)    # compacted
    w10 = rng.standard_normal((C, 10)).astype(np.float32)
    w4 = rng.standard_normal((C, 4)).astype(np.float32)
    wp = [rng.standard_normal(C).astype(np.float32) for _ in range(3)]

    print("gather idx[E] from [K,C]:   ",
          f"{timed(lambda x: jnp.take(x, idx, axis=1) * 2.0, f):6.3f} ms")
    print("owner_tile concat x3:       ",
          f"{timed(lambda x: jnp.concatenate((x, x, x), axis=1) * 2.0, f):6.3f} ms")

    def red10(g):
        acc = 0.0
        for m in range(10):
            acc = acc + w10[:, m][None, :] * jnp.take(g, eoc[:, m], axis=1)
        return acc

    def red_split(g):
        acc = 0.0
        for s in range(3):
            acc = acc + wp[s][None, :] * g[:, s * C:(s + 1) * C]
        for m in range(4):
            acc = acc + w4[:, m][None, :] * jnp.take(g, idx4[:, m], axis=1)
        return acc

    print("10-slot gather reduce:      ", f"{timed(red10, g_e):6.3f} ms")
    print("3-slice + 4-gather reduce:  ", f"{timed(red_split, g_e):6.3f} ms")


if __name__ == "__main__":
    main()
