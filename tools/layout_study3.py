"""Layout study 3: copy-free formulations of the M-slot weighted reduction.

The round-3 traces show the per-slot lane gathers [K, E_tbl] -> [K, R] are
followed by {1,0}->{0,1} layout copies of every gather output (~14 ms/step,
~17%): the TPU gather emits its output row-major over the gathered index
while consumers want the level-major layout.  Candidates:

  a. current: per-slot lane gather + weighted accumulate in [K, R]
  b. row space: ONE transpose of the table to [E_tbl, K], per-slot ROW
     gathers + weighted accumulate in [R, K] row space, one final transpose
  c. gather+einsum: one batched row gather [R, M, K] + einsum over M
  d. flat row gather: rows idx.reshape(-1) -> [R*M, K], reshape, einsum

Run: python tools/layout_study3.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

C, E, K2 = 40962, 122880, 82   # stacked u/u*pv table height
S = 10
REPS = 30


def timeit(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REPS * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    eoe = jnp.asarray(rng.integers(0, E, (E, S)), jnp.int32)   # edgesOnEdge
    adv = jnp.asarray(rng.integers(0, C, (E, S)), jnp.int32)   # advCellsForEdge
    w = jnp.asarray(rng.standard_normal((E, S)), jnp.float32)
    tbl_e = jnp.asarray(rng.standard_normal((K2, E)), jnp.float32)  # [2K, E]
    tbl_c = jnp.asarray(rng.standard_normal((83, C)), jnp.float32)  # [2K+1, C]
    print(f"device: {jax.devices()[0]}")

    def a_lane(tbl, idx):
        acc = None
        for m in range(S):
            g = jnp.take(tbl, idx[:, m], axis=1)
            t = w[:, m][None, :] * g
            acc = t if acc is None else acc + t
        return acc

    def b_rows(tbl, idx):
        tT = tbl.T                                   # [E_tbl, K]
        acc = None
        for m in range(S):
            g = jnp.take(tT, idx[:, m], axis=0)      # [R, K] rows
            t = w[:, m][:, None] * g
            acc = t if acc is None else acc + t
        return acc.T

    def c_einsum(tbl, idx):
        g = jnp.take(tbl.T, idx, axis=0)             # [R, S, K]
        return jnp.einsum("rs,rsk->kr", w, g)

    def d_flat(tbl, idx):
        g = jnp.take(tbl.T, idx.reshape(-1), axis=0).reshape(idx.shape + (tbl.shape[0],))
        return jnp.einsum("rs,rsk->kr", w, g)

    for name, tbl, idx in [("edgesOnEdge [82,E]", tbl_e, eoe),
                           ("advection   [83,C]", tbl_c, adv)]:
        ta = timeit(a_lane, tbl, idx)
        tb = timeit(b_rows, tbl, idx)
        tc = timeit(c_einsum, tbl, idx)
        td = timeit(d_flat, tbl, idx)
        print(f"{name}: lane={ta:.3f}  rows={tb:.3f}  einsum={tc:.3f}  "
              f"flat={td:.3f} ms")

    # sanity: all formulations agree
    ra = a_lane(tbl_e, eoe); rb = b_rows(tbl_e, eoe); rc = c_einsum(tbl_e, eoe)
    print("agree:", float(jnp.abs(ra - rb).max()), float(jnp.abs(ra - rc).max()))


if __name__ == "__main__":
    main()
