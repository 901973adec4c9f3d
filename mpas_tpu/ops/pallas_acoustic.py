"""Pallas TPU kernel: fused vertically-implicit acoustic column update.

The acoustic cell update (dynamics_tasks.rg:1615-1704) is a chain of ~25
column-local array passes in pure XLA — rs/ts assembly, the implicit w
right-hand side, the tridiagonal forward/backward substitution (which as a
lax.scan breaks XLA fusion into 2*K strided micro-ops), the implicit
Rayleigh damping, and the rho_pp/rtheta_pp recovery.  This kernel fuses the
whole chain into ONE pass: each grid step DMAs a [K, BC] level-major block
of every input column into VMEM, runs the entire update including the
K-step recurrences on-chip (row slices over the sublane axis), and writes
the four outputs once.

The horizontal flux divergences (rs0/ts0) stay in XLA (they are
gather-based); everything downstream of them is column-local and lives here.
Numerics are identical to ops/acoustic.advance_acoustic_step's cell section
(validated against it in tests/test_pallas.py).

Layout: all arrays are level-major [K, C] / [K+1, C] (core/state.py);
blocks put the cells in the lane dimension, levels in sublanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants


def _kernel(rs0_ref, ts0_ref, rho_pp_ref, rtheta_pp_ref, rw_p_ref,
            wwAvg_ref, tend_rho_ref, tend_rt_ref, tend_w_ref,
            cofrz_ref, cofwz_ref, coftz_ref, cofwr_ref, cofwt_ref,
            a_tri_ref, alpha_tri_ref, gamma_tri_ref,
            zz_ref, dss_i_ref, zz_rho_i_ref, w_ref, dw_save_ref,
            rho_pp_out, rtheta_pp_out, rw_p_out, wwAvg_out,
            *, K: int, dts: float, epssm: float):
    resm = (1.0 - epssm) / (1.0 + epssm)

    rho_pp = rho_pp_ref[:]          # [K, BC]
    rtheta_pp = rtheta_pp_ref[:]
    rw_p = rw_p_ref[:]              # [K+1, BC]
    cofrz = cofrz_ref[:]            # [K, 1]
    coftz = coftz_ref[:]            # [K+1, BC]

    d_rwp = rw_p[1:K + 1] - rw_p[0:K]
    rs = (rho_pp + dts * tend_rho_ref[:] + rs0_ref[:]
          - cofrz * resm * d_rwp)
    ctz_rwp = coftz * rw_p
    dtseps = 0.5 * dts * (1.0 + epssm)
    rdzw = cofrz / dtseps           # [K, 1] (cofrz = dtseps * rdzw)
    ts = (rtheta_pp + dts * tend_rt_ref[:] + ts0_ref[:]
          - resm * rdzw * (ctz_rwp[1:K + 1] - ctz_rwp[0:K]))

    zz = zz_ref[:]                  # [K, BC]
    cofwz = cofwz_ref[:]            # [K+1, BC]
    cofwr = cofwr_ref[:]
    cofwt = cofwt_ref[:]            # [K, BC]
    tend_w = tend_w_ref[:]          # [K+1, BC]

    zz_ts = zz * ts
    zz_rtpp = zz * rtheta_pp
    rhs = (rw_p[1:K] + dts * tend_w[1:K]
           - cofwz[1:K] * ((zz_ts[1:K] - zz_ts[0:K - 1])
                           + resm * (zz_rtpp[1:K] - zz_rtpp[0:K - 1]))
           - cofwr[1:K] * ((rs[1:K] + rs[0:K - 1])
                           + resm * (rho_pp[1:K] + rho_pp[0:K - 1]))
           + cofwt[1:K] * (ts[1:K] + resm * rtheta_pp[1:K])
           + cofwt[0:K - 1] * (ts[0:K - 1] + resm * rtheta_pp[0:K - 1]))
    # rhs rows are interfaces 1..K-1 (K-1 of them)

    # --- tridiagonal solve in-registers: forward then backward ---
    a_tri = a_tri_ref[:]
    alpha_tri = alpha_tri_ref[:]
    gamma_tri = gamma_tri_ref[:]
    rows = []
    w_prev = rhs[0] * 0.0
    for k in range(1, K):
        w_prev = (rhs[k - 1] - a_tri[k] * w_prev) * alpha_tri[k]
        rows.append(w_prev)
    w_next = w_prev * 0.0
    outs = [None] * (K - 1)
    for k in range(K - 1, 0, -1):
        w_next = rows[k - 1] - gamma_tri[k] * w_next
        outs[k - 1] = w_next
    w_solved = jnp.stack(outs, axis=0)        # [K-1, BC] interfaces 1..K-1

    # --- implicit Rayleigh damping (interfaces 1..K-1) ---
    dss_i = dss_i_ref[:]                      # [K+1, BC]
    zz_rho_i = zz_rho_i_ref[:]                # zz_i * rho_i at interfaces
    w_big = w_ref[:]                          # large-step w
    dw_save = dw_save_ref[:]                  # rw_save - rw
    sl = slice(1, K)
    damped = ((w_solved + dw_save[sl]
               - dts * dss_i[sl] * zz_rho_i[sl] * w_big[sl])
              / (1.0 + dts * dss_i[sl]) - dw_save[sl])

    zero = rhs[:1] * 0.0
    rw_p_new = jnp.concatenate([zero, damped, zero], axis=0)

    wwAvg = (wwAvg_ref[:]
             + jnp.concatenate([zero, 0.5 * (1.0 - epssm) * rw_p[sl]
                                + 0.5 * (1.0 + epssm) * damped, zero], axis=0))

    d_rwp_new = rw_p_new[1:K + 1] - rw_p_new[0:K]
    rho_pp_out[:] = rs - cofrz * d_rwp_new
    ctz_new = coftz * rw_p_new
    rtheta_pp_out[:] = ts - rdzw * (ctz_new[1:K + 1] - ctz_new[0:K])
    rw_p_out[:] = rw_p_new
    wwAvg_out[:] = wwAvg


def acoustic_column_update(rs0, ts0, ac_rho_pp, ac_rtheta_pp, ac_rw_p, wwAvg,
                           tend_rho, tend_rt, tend_w, coefs, zz, dss_i,
                           zz_rho_i, w, dw_save, dts: float, epssm: float,
                           block_c: int = 1024, interpret: bool = False):
    """Fused acoustic cell update.  All arrays level-major [K, C] / [K+1, C];
    returns (rho_pp, rtheta_pp, rw_p, wwAvg)."""
    K, C = rs0.shape
    bc = min(block_c, C)
    grid = (pl.cdiv(C, bc),)
    dtype = rs0.dtype

    def spec(kdim):
        return pl.BlockSpec((kdim, bc), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    cofrz2d = coefs.cofrz.reshape(K, 1).astype(dtype)
    kern = functools.partial(_kernel, K=K, dts=float(dts), epssm=float(epssm))

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            spec(K), spec(K), spec(K), spec(K), spec(K + 1), spec(K + 1),
            spec(K), spec(K), spec(K + 1),
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            spec(K + 1), spec(K + 1), spec(K + 1), spec(K),
            spec(K + 1), spec(K + 1), spec(K + 1),
            spec(K), spec(K + 1), spec(K + 1), spec(K + 1), spec(K + 1),
        ],
        out_specs=(spec(K), spec(K), spec(K + 1), spec(K + 1)),
        # outputs vary over whatever mesh axes the inputs vary over (vma is
        # required for pallas_call under shard_map's varying-axis checking —
        # the sharded TPU path maps this kernel over the 'dom' axis)
        out_shape=(
            jax.ShapeDtypeStruct((K, C), dtype, vma=jax.typeof(rs0).vma),
            jax.ShapeDtypeStruct((K, C), dtype, vma=jax.typeof(rs0).vma),
            jax.ShapeDtypeStruct((K + 1, C), dtype, vma=jax.typeof(rs0).vma),
            jax.ShapeDtypeStruct((K + 1, C), dtype, vma=jax.typeof(rs0).vma),
        ),
        interpret=interpret,
    )(rs0, ts0, ac_rho_pp, ac_rtheta_pp, ac_rw_p, wwAvg,
      tend_rho, tend_rt, tend_w, cofrz2d,
      coefs.cofwz.astype(dtype), coefs.coftz.astype(dtype),
      coefs.cofwr.astype(dtype), coefs.cofwt.astype(dtype),
      coefs.a_tri.astype(dtype), coefs.alpha_tri.astype(dtype),
      coefs.gamma_tri.astype(dtype),
      zz, dss_i, zz_rho_i, w, dw_save)
    return out
