"""Device study: windowed one-hot-matmul gather-reduce vs XLA lane gathers.

The M-slot weighted reductions and their XLA layout copies are the two
largest buckets of the round-3 step profile (docs/PERF.md).  With the RCM
renumbering (mesh/renumber.py) every 128-output block's indices fall in a
narrow window W of the source table, so the whole reduction becomes, per
block,  out = tbl[:, ws:ws+W] @ B  with B[j, c] = sum_m w[c, m] *
(j == idx_local[c, m]) built on the VPU — no gathers, no layout copies,
MXU does the reduction.

Run on the TPU: python tools/windowed_study.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def xla_slot_reduce(tbl, idx, w):
    acc = None
    for m in range(idx.shape[1]):
        g = jnp.take(tbl, idx[:, m], axis=1)
        t = w[:, m][None, :] * g
        acc = t if acc is None else acc + t
    return acc


def make_windowed(Kp, W, M, nb, R, precision):
    def kernel(ws_ref, idxT_ref, wT_ref, tbl_ref, out_ref, twin, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            tbl_ref.at[:, pl.ds(ws_ref[b] * 128, W)], twin, sem)
        cp.start()
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
        cp.wait()
        B = jnp.zeros((W, 128), jnp.float32)
        for m in range(M):
            hit = (iota == idxT_ref[m, :][None, :])
            B = B + jnp.where(hit, wT_ref[m, :][None, :], 0.0)
        out_ref[...] = jax.lax.dot_general(
            twin[...], B, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((M, 128), lambda b, ws: (0, b)),
            pl.BlockSpec((M, 128), lambda b, ws: (0, b)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((Kp, 128), lambda b, ws: (0, b)),
        scratch_shapes=[pltpu.VMEM((Kp, W), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )

    @jax.jit
    def run(ws, idxT, wT, tbl):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Kp, nb * 128), jnp.float32),
        )(ws, idxT, wT, tbl)

    return run


def main():
    from mpas_tpu.mesh.writer import generate_and_cache
    from mpas_tpu.mesh.renumber import renumber_mesh, block_spans

    mesh, _ = renumber_mesh(generate_and_cache(6))
    C, E = mesh.nCells, mesh.nEdges
    idx = np.asarray(mesh.edgesOnCell, np.int32)         # [C, 6]
    M = idx.shape[1]
    w = np.asarray(mesh.edgesOnCellSign * mesh.edgesOnCell_mask, np.float32)

    for Kst in (48, 168):
        key = jax.random.PRNGKey(0)
        tbl = jax.random.normal(key, (Kst, E), jnp.float32)

        # --- XLA baseline ---
        f_x = jax.jit(xla_slot_reduce)
        ref = f_x(tbl, jnp.asarray(idx), jnp.asarray(w))
        tx = timeit(f_x, tbl, jnp.asarray(idx), jnp.asarray(w))

        # --- windowed pallas ---
        B = 128
        nb = (C + B - 1) // B
        Rp = nb * B
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], Rp - C, 0)], 0)
        w_p = np.concatenate([w, np.zeros((Rp - C, M), np.float32)], 0)
        ws = (idx_p.reshape(nb, -1).min(axis=1) // 128).astype(np.int32)
        span = block_spans(idx_p)
        W = int(np.ceil((span.max() + 127) / 128) * 128)
        idx_local = idx_p - (ws[:, None] * 128).repeat(B, 0).reshape(Rp, 1)
        assert idx_local.min() >= 0 and idx_local.max() < W, (idx_local.min(), idx_local.max(), W)
        idxT = jnp.asarray(idx_local.T.reshape(M, Rp))
        wT = jnp.asarray(w_p.T.reshape(M, Rp))
        # pad table so ws*128 + W never overruns
        Ep = int(ws.max() * 128 + W)
        tbl_p = jnp.pad(tbl, ((0, 0), (0, max(0, Ep - E))))

        for prec_name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                                ("DEFAULT", jax.lax.Precision.DEFAULT)):
            run = make_windowed(Kst, W, M, nb, Rp, prec)
            out = run(jnp.asarray(ws), idxT, wT, tbl_p)[:, :C]
            err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
            tp = timeit(run, jnp.asarray(ws), idxT, wT, tbl_p)
            print(f"Kst={Kst} W={W} prec={prec_name}: xla={tx:.3f} ms "
                  f"pallas={tp:.3f} ms speedup={tx/tp:.2f}x rel_err={err:.2e}")


if __name__ == "__main__":
    main()
