"""Pallas TPU kernel: fused CCD++ residual update + v-sweep reduction.

The dense CCD++ schedule (solvers/ccd_dense.py) costs three HBM passes per
rank under XLA: the rank-1 residual read-modify-write, the v-sweep reduction
pass, and the u-sweep reduction pass. XLA cannot fuse the first two — the
updated residual is both a materialized output and the reduction input, so it
re-reads it. This kernel computes, in ONE pass over each (BM, BN) tile:

    Rb' = Rb + (u_add ⊗ v_add - u_sub ⊗ v_sub) ⊙ Mb      (write back)
    g[col] += u_addᵀ Rb'          (v-sweep numerator partials)
    h[col] += (u_add²)ᵀ Mb        (v-sweep denominator partials)

dropping the schedule's HBM traffic from 22 to 16 B/cell/rank (f32 residual,
bf16 mask). Grid is (n/BN, m/BM) with the row dimension innermost: TPU Pallas
grids execute sequentially, so the g/h output blocks (indexed by column block
only) accumulate across row steps, initialized at row step 0.

Replaces the role of the reference's UpdateRating_DUAL + RankOneUpdate_v CUDA
kernels (/root/reference/cuda_src/CCD_CUDA.cu:24-104), re-derived for an MXU/
VPU memory system instead of pointer-chasing CSC segments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256     # rows per tile (sublane multiples of 8)
BN = 512     # cols per tile (lane multiples of 128)


def _fused_update_vsweep_kernel(u_add_ref, u_sub_ref, v_add_ref, v_sub_ref,
                                R_ref, M_ref, Rout_ref, g_ref, h_ref):
    i = pl.program_id(1)                       # row-block index (innermost)
    Mb = M_ref[:].astype(jnp.float32)
    ua = u_add_ref[:]                          # (BM, 1)
    Rb = (R_ref[:].astype(jnp.float32)
          + (ua * v_add_ref[:] - u_sub_ref[:] * v_sub_ref[:]) * Mb)
    Rout_ref[:] = Rb.astype(Rout_ref.dtype)

    @pl.when(i == 0)
    def _init():
        g_ref[:] = jnp.zeros_like(g_ref)
        h_ref[:] = jnp.zeros_like(h_ref)

    g_ref[:] += jnp.sum(ua * Rb, axis=0, keepdims=True)
    h_ref[:] += jnp.sum(ua * ua * Mb, axis=0, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "bm", "bn", "alias"))
def fused_update_vsweep(Rhat, mask, u_add, u_sub, v_add, v_sub, *,
                        interpret: bool = False, bm: int = BM, bn: int = BN,
                        alias: bool = True):
    """One fused pass. Shapes: Rhat (m, n) f32/bf16, mask (m, n) bf16,
    u_* (m,), v_* (n,); m % bm == 0 and n % bn == 0 (caller pads).
    Returns (Rhat', g, h) with g/h (n,) f32. ``alias`` updates the residual
    in place (input buffer donated to the output)."""
    m, n = Rhat.shape
    assert m % bm == 0 and n % bn == 0, (m, n)
    grid = (n // bn, m // bm)

    def col2(j, i):
        return (0, j)
    out = pl.pallas_call(
        _fused_update_vsweep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), col2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), col2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), Rhat.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        input_output_aliases={4: 0} if alias else {},
        cost_estimate=pl.CostEstimate(
            flops=6 * m * n,
            bytes_accessed=m * n * (2 * Rhat.dtype.itemsize
                                    + mask.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(u_add.reshape(m, 1), u_sub.reshape(m, 1),
      v_add.reshape(1, n), v_sub.reshape(1, n), Rhat, mask)
    Rnew, g, h = out
    return Rnew, g[0], h[0]
