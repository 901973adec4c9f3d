"""Layout study round 3: primitive choices for the full [K, C] state flip
(docs/PERF.md lever 3) + bf16 gather operands (lever 1).

Questions answered on the real TPU:
  1. packed axis-1 gather: one gather from a [3K, C] stack vs 3 separate
     axis-1 gathers vs the round-2 packed ROW gather from [C, 3K].
  2. bf16 gather operands: axis-1 gather cost from bf16 [K, C] vs f32.
  3. interface patch: x.at[k].set(v) on [K+1, C] (major axis) vs
     x.at[:, k].set(v) on [C, K+1] (lane axis) — the ~20 ms/step of
     copies/dynamic-update-slices in the round-2 trace.
  4. slot loop vs one wide gather+einsum for the M-slot reduction in [K, C].
  5. tridiagonal scan without the [C, K] <-> [K, C] transposes.

Run: python tools/layout_study2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

C, E, K = 40962, 122880, 41
M, S = 10, 10
REPS = 50


def timeit(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    coe = jnp.asarray(rng.integers(0, C, (E, 2)), jnp.int32)
    eoc = jnp.asarray(rng.integers(0, E, (C, M)), jnp.int32)
    w_eoc = jnp.asarray(rng.standard_normal((C, M)), jnp.float32)

    f_kc = [jnp.asarray(rng.standard_normal((K, C)), jnp.float32)
            for _ in range(3)]
    f_ck = [jnp.array(f.T) for f in f_kc]
    f_ke = jnp.asarray(rng.standard_normal((K, E)), jnp.float32)
    f_kc_bf = [f.astype(jnp.bfloat16) for f in f_kc]
    i1, i2 = coe[:, 0], coe[:, 1]

    print(f"device: {jax.devices()[0]}")

    # ---- 1. packed gathers: 3 fields x both edge sides ----
    def sep_axis1(a, b, c):
        outs = []
        for f in (a, b, c):
            outs += [jnp.take(f, i1, axis=1), jnp.take(f, i2, axis=1)]
        return sum(outs)

    def stacked_axis1(a, b, c):
        t = jnp.concatenate([a, b, c], axis=0)          # [3K, C]
        g1 = jnp.take(t, i1, axis=1)
        g2 = jnp.take(t, i2, axis=1)
        return sum(g1[i * K:(i + 1) * K] + g2[i * K:(i + 1) * K]
                   for i in range(3))

    def packed_row(a, b, c):
        t = jnp.concatenate([a, b, c], axis=1)          # [C, 3K]
        g = jnp.take(t, coe, axis=0)                    # [E, 2, 3K]
        return sum((g[:, 0, i * K:(i + 1) * K] + g[:, 1, i * K:(i + 1) * K]).T
                   for i in range(3))

    t1 = timeit(sep_axis1, *f_kc)
    t2 = timeit(stacked_axis1, *f_kc)
    t3 = timeit(packed_row, *f_ck)
    print(f"edge pairs x3  separate[K,C]={t1:.3f}  stacked[3K,C]={t2:.3f}  "
          f"packed-row[C,3K]={t3:.3f} ms")

    # ---- 2. bf16 operands ----
    def one_pair(f):
        return (jnp.take(f, i2, axis=1).astype(jnp.float32)
                - jnp.take(f, i1, axis=1).astype(jnp.float32))

    t1 = timeit(one_pair, f_kc[0])
    t2 = timeit(one_pair, f_kc_bf[0])
    def one_pair_stacked_bf(a, b, c):
        t = jnp.concatenate([a, b, c], axis=0)
        g1 = jnp.take(t, i1, axis=1).astype(jnp.float32)
        g2 = jnp.take(t, i2, axis=1).astype(jnp.float32)
        return g1 + g2
    t3 = timeit(one_pair_stacked_bf, *f_kc_bf)
    print(f"edge pair      f32[K,C]={t1:.3f}  bf16[K,C]={t2:.3f}  "
          f"bf16 stacked x3={t3:.3f} ms")

    # ---- 3. interface patches ----
    f_kc1 = jnp.asarray(rng.standard_normal((K + 1, C)), jnp.float32)
    f_ck1 = jnp.array(f_kc1.T)
    row = jnp.asarray(rng.standard_normal(C), jnp.float32)

    def patch_major(x, v):
        return (x.at[0].set(0.0).at[K].set(0.0).at[1].set(v) * 1.0000001)

    def patch_lane(x, v):
        return (x.at[:, 0].set(0.0).at[:, K].set(0.0).at[:, 1].set(v)
                * 1.0000001)

    t1 = timeit(patch_major, f_kc1, row)
    t2 = timeit(patch_lane, f_ck1, row)
    print(f"iface patch    major[K+1,C]={t1:.3f}  lane[C,K+1]={t2:.3f} ms")

    # concat-form interface assembly (current code style) vs at[].set
    def concat_major(x):
        z = jnp.zeros_like(x[:1])
        return jnp.concatenate([z, x[1:K], z], axis=0) * 1.0000001

    def concat_lane(x):
        z = jnp.zeros_like(x[:, :1])
        return jnp.concatenate([z, x[:, 1:K], z], axis=1) * 1.0000001

    t1 = timeit(concat_major, f_kc1)
    t2 = timeit(concat_lane, f_ck1)
    print(f"iface concat   major[K+1,C]={t1:.3f}  lane[C,K+1]={t2:.3f} ms")

    # ---- 4. M-slot reduction: slot loop vs one wide gather ----
    def slot_loop(f):
        acc = None
        for m in range(M):
            g = jnp.take(f, eoc[:, m], axis=1)          # [K, C]
            t = w_eoc[:, m][None, :] * g
            acc = t if acc is None else acc + t
        return acc

    def wide_gather(f):
        g = jnp.take(f, eoc.reshape(-1), axis=1)        # [K, C*M]
        g = g.reshape(K, C, M)
        return jnp.einsum("cm,kcm->kc", w_eoc, g)

    t1 = timeit(slot_loop, f_ke)
    t2 = timeit(wide_gather, f_ke)
    print(f"slot reduce M={M}  loop={t1:.3f}  wide+einsum={t2:.3f} ms")

    # bf16 slot loop
    f_ke_bf = f_ke.astype(jnp.bfloat16)
    def slot_loop_bf(f):
        acc = None
        for m in range(M):
            g = jnp.take(f, eoc[:, m], axis=1).astype(jnp.float32)
            t = w_eoc[:, m][None, :] * g
            acc = t if acc is None else acc + t
        return acc
    t3 = timeit(slot_loop_bf, f_ke_bf)
    print(f"slot reduce M={M}  bf16 loop={t3:.3f} ms")

    # ---- 5. tridiag scan in native [K, C] ----
    a = jnp.asarray(rng.standard_normal((K + 1, C)), jnp.float32)
    al = jnp.asarray(rng.standard_normal((K + 1, C)), jnp.float32)
    rhs_kc = jnp.asarray(rng.standard_normal((K + 1, C)), jnp.float32)
    rhs_ck, a_ck, al_ck = rhs_kc.T, a.T, al.T

    def tri_kc(rhs, a_, al_):
        def fwd(w_prev, x):
            r_k, a_k, alk = x
            w_k = (r_k - a_k * w_prev) * alk
            return w_k, w_k
        _, w = jax.lax.scan(fwd, rhs[0] * 0.0,
                            (rhs[1:K], a_[1:K], al_[1:K]))
        return w

    def tri_ck(rhs, a_, al_):
        def fwd(w_prev, x):
            r_k, a_k, alk = x
            w_k = (r_k - a_k * w_prev) * alk
            return w_k, w_k
        _, w = jax.lax.scan(fwd, rhs[:, 0] * 0.0,
                            (rhs[:, 1:K].T, a_[:, 1:K].T, al_[:, 1:K].T))
        return w

    t1 = timeit(tri_kc, rhs_kc, a, al)
    t2 = timeit(tri_ck, rhs_ck, a_ck, al_ck)
    print(f"tridiag fwd    native[K,C]={t1:.3f}  transposed[C,K]={t2:.3f} ms")

    # ---- 6. zb_metric-style gather+sign+weight loop in [K, C] ----
    zb = jnp.asarray(rng.standard_normal((C, M, K + 1)), jnp.float32)
    zbT = jnp.array(np.moveaxis(np.asarray(zb), 2, 0))   # [K+1, C, M]
    sgn = jnp.asarray(rng.standard_normal((C, M)), jnp.float32)
    flux_ke = jnp.asarray(rng.standard_normal((K + 1, E)), jnp.float32)

    def zb_kc(flux):
        acc = None
        for m in range(M):
            g = jnp.take(flux, eoc[:, m], axis=1)       # [K+1, C]
            t = sgn[:, m][None, :] * (zbT[:, :, m] + jnp.sign(g)) * g
            acc = t if acc is None else acc + t
        return acc

    t1 = timeit(zb_kc, flux_ke)
    print(f"zb_metric      [K,C] loop={t1:.3f} ms")


if __name__ == "__main__":
    main()
