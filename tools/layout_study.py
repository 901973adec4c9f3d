"""Layout study: [C, K] (levels minor / lanes) vs [K, C] (cells minor / lanes).

NEXT.md lever 2: with K=41 in the lane dimension every vreg is 41/128 full;
putting cells in lanes (K in sublanes, padded to 48) should cut vreg count
~2.6x for elementwise work.  The open question is what happens to the
gathers (row gather along axis 0 vs lane-dim gather along axis 1).

Run on the real TPU: python tools/layout_study.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

C, E, K = 40962, 122880, 41
M, S = 10, 10
REPS = 50


def timeit(fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    coe = jnp.asarray(rng.integers(0, C, (E, 2)), jnp.int32)
    eoc = jnp.asarray(rng.integers(0, E, (C, M)), jnp.int32)
    adv = jnp.asarray(rng.integers(0, C, (E, S)), jnp.int32)
    w_eoc = jnp.asarray(rng.standard_normal((C, M)), jnp.float32)
    w_adv = jnp.asarray(rng.standard_normal((E, S)), jnp.float32)

    f_ck = jnp.asarray(rng.standard_normal((C, K)), jnp.float32)
    f_ek = jnp.asarray(rng.standard_normal((E, K)), jnp.float32)
    f_kc = jnp.array(f_ck.T)            # [K, C]
    f_ke = jnp.array(f_ek.T)            # [K, E]

    print(f"device: {jax.devices()[0]}")

    # 1. elementwise chain (5 passes)
    def ew(a):
        b = a * 1.1 + 0.3
        c = jnp.maximum(b, 0.2) * a
        d = c - b * 0.5
        return d * d + a

    t1 = timeit(ew, f_ck)
    t2 = timeit(ew, f_kc)
    print(f"elementwise   [C,K]={t1:.3f} ms   [K,C]={t2:.3f} ms   ratio={t1/t2:.2f}")

    # 2. cell->edge pair gather + diff (pressure-gradient shape)
    def g_ck(f):
        g = jnp.take(f, coe, axis=0)                # [E,2,K]
        return g[:, 1] - g[:, 0]

    def g_kc(f):
        g = jnp.take(f, coe, axis=1)                # [K,E,2]
        return g[..., 1] - g[..., 0]

    t1 = timeit(g_ck, f_ck)
    t2 = timeit(g_kc, f_kc)
    print(f"edge_pair     [C,K]={t1:.3f} ms   [K,C]={t2:.3f} ms   ratio={t1/t2:.2f}")

    # 3. edge->cell weighted sum (flux divergence shape)
    def s_ck(f):
        g = jnp.take(f, eoc, axis=0)                # [C,M,K]
        return jnp.einsum("cm,cmk->ck", w_eoc, g)

    def s_kc(f):
        g = jnp.take(f, eoc, axis=1)                # [K,C,M]
        return jnp.einsum("cm,kcm->kc", w_eoc, g)

    t1 = timeit(s_ck, f_ek)
    t2 = timeit(s_kc, f_ke)
    print(f"edge->cell    [C,K]={t1:.3f} ms   [K,C]={t2:.3f} ms   ratio={t1/t2:.2f}")

    # 4. advection stencil (gather 10 cells + 2 weighted sums)
    def a_ck(f, sgn):
        qa = jnp.take(f, adv, axis=0)               # [E,S,K]
        base = jnp.einsum("es,esk->ek", w_adv, qa)
        third = jnp.einsum("es,esk->ek", w_adv, qa)
        return base + sgn * third

    def a_kc(f, sgn):
        qa = jnp.take(f, adv, axis=1)               # [K,E,S]
        base = jnp.einsum("es,kes->ke", w_adv, qa)
        third = jnp.einsum("es,kes->ke", w_adv, qa)
        return base + sgn * third

    sgn_ek = jnp.sign(f_ek)
    sgn_ke = jnp.sign(f_ke)
    t1 = timeit(a_ck, f_ck, sgn_ek)
    t2 = timeit(a_kc, f_kc, sgn_ke)
    print(f"adv stencil   [C,K]={t1:.3f} ms   [K,C]={t2:.3f} ms   ratio={t1/t2:.2f}")

    # 5. vertical ops: interface interp (minor-axis shifts vs major-axis)
    fzm = jnp.asarray(rng.standard_normal(K + 1), jnp.float32)

    def v_ck(f):
        interior = fzm[1:K] * f[:, 1:] + fzm[1:K] * f[:, :-1]
        z = jnp.zeros_like(f[:, :1])
        return jnp.concatenate([z, interior, z], axis=-1)

    def v_kc(f):
        interior = fzm[1:K, None] * f[1:] + fzm[1:K, None] * f[:-1]
        z = jnp.zeros_like(f[:1])
        return jnp.concatenate([z, interior, z], axis=0)

    t1 = timeit(v_ck, f_ck)
    t2 = timeit(v_kc, f_kc)
    print(f"vert interp   [C,K]={t1:.3f} ms   [K,C]={t2:.3f} ms   ratio={t1/t2:.2f}")

    # 6. a fused mini-chain: gather + elementwise + reduce (dyn_tend-like)
    def chain_ck(u, p):
        p1 = jnp.take(p, coe[:, 0], axis=0)
        p2 = jnp.take(p, coe[:, 1], axis=0)
        grad = (p2 - p1) * 0.01
        t = u * grad + jnp.abs(u) * 0.25 * (p2 + p1)
        g = jnp.take(t, eoc, axis=0)
        return jnp.einsum("cm,cmk->ck", w_eoc, g)

    def chain_kc(u, p):
        p1 = jnp.take(p, coe[:, 0], axis=1)
        p2 = jnp.take(p, coe[:, 1], axis=1)
        grad = (p2 - p1) * 0.01
        t = u * grad + jnp.abs(u) * 0.25 * (p2 + p1)
        g = jnp.take(t, eoc, axis=1)
        return jnp.einsum("cm,kcm->kc", w_eoc, g)

    t1 = timeit(chain_ck, f_ek, f_ck)
    t2 = timeit(chain_kc, f_ke, f_kc)
    print(f"full chain    [C,K]={t1:.3f} ms   [K,C]={t2:.3f} ms   ratio={t1/t2:.2f}")


if __name__ == "__main__":
    main()
