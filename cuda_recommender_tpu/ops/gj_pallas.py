"""Pallas TPU kernel: VMEM-blocked batched Gauss-Jordan solve.

The XLA formulation of the batched k×k solve (solvers/als_ell.py
gauss_jordan_solve) carries the augmented (S, k, k+1) tensor through a k-step
fori_loop — every elimination step streams the WHOLE tensor through HBM
(~2·S·k·(k+1)·4 bytes per step, ~73 GB per ALS side at ml20M k=40, measured
~173 ms/side). This kernel blocks the batch into VMEM-resident tiles and
runs all k elimination steps per tile, so HBM traffic drops to
read-A + read-b + write-x.

Layout is the key: the BATCH lives on the 128-lane axis — tiles are
(k, k+1, 128) with matrix rows on the major axis — so row/column selection
inside the elimination loop is dynamic slicing on non-lane axes (which
Mosaic supports) and every arithmetic op uses full lanes. The first kernel
cut kept the batch major and selected rows via one-hot iota masks: lane
padding (k+1 -> 128) plus mask scans wasted ~5x compute and it barely beat
the XLA loop; this layout is ~an order of magnitude leaner per step.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_S = 128

#: static-unroll the elimination loop (default on; see _eliminate).
UNROLL = bool(int(os.environ.get("CRTPU_GJ_UNROLL", "1")))

# Scoped VMEM is 16 MB. In the pipelined kernel the A block is
# double-buffered and the augmented scratch is single — at k=128 with
# 128-lane blocks that plans 24.75 MB and the compile aborts. Mosaic also
# requires the lane (batch) block to stay a multiple of 128, so the fix for
# large k is not a narrower block: it is the manual-DMA variant below, which
# keeps A in HBM and single-buffers one augmented scratch (~8.7 MB at k=128).
# 10 MB planning budget: the bs512_r8 config planned 11.2 MB by this
# formula but the real scoped allocation hit 19 MB (double-buffering and
# Mosaic temps beyond the model) and aborted — keep ~40% headroom.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pipelined_fits(k: int, bs: int, block_r: int = 0) -> bool:
    scr = block_r * (2 * k + 1) if block_r else 0   # W (k,r,·) + S (r,k+1,·)
    return (2 * k * k + k * (k + 1) + scr) * bs * 4 <= _VMEM_BUDGET


def _eliminate(M_ref, unroll: bool = True):
    """Run all k Gauss-Jordan elimination steps on the augmented VMEM
    scratch M_ref (k, k+1, B), leaving the solution in column k.

    ``unroll=True`` (default): a static Python loop — every row/column
    selection is a STATIC slice. Measured on TPU it buys only ~3% over the
    fori_loop form (results/gj_block_sweep_r3.json): the elimination is
    bound by re-streaming the full scratch through VMEM load/store on
    every one of the k steps, not by the dynamic slicing. Kept (small win,
    bit-identical); CRTPU_GJ_UNROLL=0 reverts. Compile time grows with k
    (k straight-line steps) but is cached."""
    k = M_ref.shape[0]

    if unroll:
        for i in range(k):
            row = M_ref[i:i + 1]                     # (1, k+1, B) static
            d = M_ref[i:i + 1, i:i + 1, :]           # (1, 1, B) pivot
            prow = row / d
            col = M_ref[:, i:i + 1, :]               # (k, 1, B)
            M_ref[:, :, :] = M_ref[:, :, :] - col * prow
            M_ref[i:i + 1] = prow
        return

    def body(i, _):
        row = M_ref[pl.ds(i, 1)]                     # (1, k+1, B)
        d = M_ref[pl.ds(i, 1), pl.ds(i, 1), :]       # (1, 1, B) pivot
        prow = row / d
        col = M_ref[:, pl.ds(i, 1), :]               # (k, 1, B)
        M_ref[:, :, :] = M_ref[:, :, :] - col * prow
        M_ref[pl.ds(i, 1)] = prow
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def _eliminate_blocked(M_ref, W_ref, S_ref, r: int):
    """Blocked Gauss-Jordan: k/r panels, each applying r elimination steps
    to the full augmented scratch in ONE streaming pass.

    The round-3 sweep proved the step-at-a-time elimination is VMEM-stream
    bound: every one of the k steps re-streams the whole (k, k+1, B)
    scratch (results/gj_block_sweep_r3.json). Blocking fixes the traffic,
    not the FLOPs: each GJ step is M <- (I - w_j e_jT) M with
    w_j = (c_j - e_j)/d_j (c_j = current column, d_j = pivot), so a panel
    of r steps composes to

        M <- M - sum_j w_j (x) s_j,    s_j = e_jT (step-j-current M),

    one full-matrix pass with an r-term FMA tree (arithmetic intensity r)
    instead of r single-FMA passes. The panel recursion that produces the
    w_j and s_j maintains only the CURRENT panel columns (W_ref, (k, r, B))
    and panel rows (S_ref, (r, k+1, B)) — at step j, rows/columns <= j are
    dead (s_j is captured by leaving row j untouched afterwards), so each
    step updates only the strictly-future slices. Net VMEM traffic per
    k x (k+1) block drops from ~2k streams to ~2k/r + O(r) streams of the
    full scratch plus O(k*r) small-slab work — but the measured end-to-end
    outcome is a WASH (results/als_gj_blocked_ab_r5.json: full ALS step
    arm medians r0 297.8 / r4 287.9 / r8 293.4 ms/iter over 3 runs,
    per-arm spread up to 40%; the r4 "negative" artifact was invalid —
    its env-var arm switch hit the trace cache), so this stays an opt-in
    experiment (block_r / CRTPU_GJ_BLOCK_R).

    ACCURACY (r5 finding, tests/test_pallas.py
    test_gj_blocked_elimination_correctness): the composed update is NOT
    accuracy-grade on large-magnitude grams. The final
    ``M -= sum_j w_j (x) s_j`` reconstructs the O(1)-sized eliminated
    panel rows by cancelling O(|M|)-sized terms — at gram diagonals ~3e4
    (an ALS item side with tens of thousands of ratings per item) the
    blocked path keeps only ~1-3 digits (up to ~30% relative error
    observed at k=16, r=5) while the step-at-a-time default computes
    prow = row/d directly with no cancellation and stays ~1e-6 on the
    SAME systems. Measured consequence: jester-dims ALS with
    CRTPU_GJ_BLOCK_R set converges to ~0.43 RMSE instead of the golden
    0.185. Do not enable blocked elimination where factors feed back
    (ALS outer iterations); it is only safe for throwaway throughput
    experiments on normalized systems.

    W_ref doubles as the current-panel-columns buffer: column j holds the
    current column until step j consumes it and overwrites it with w_j;
    updates only touch columns > j, which still hold current columns.
    """
    k = M_ref.shape[0]
    for i0 in range(0, k, r):
        rr = min(r, k - i0)
        W_ref[:, :rr, :] = M_ref[:, i0:i0 + rr, :]     # current panel cols
        S_ref[:rr] = M_ref[i0:i0 + rr]                 # current panel rows
        for j in range(rr):
            d = S_ref[j:j + 1, i0 + j:i0 + j + 1, :]   # (1, 1, B) pivot
            W_ref[:, j:j + 1, :] = W_ref[:, j:j + 1, :] / d
            W_ref[i0 + j:i0 + j + 1, j:j + 1, :] = (
                W_ref[i0 + j:i0 + j + 1, j:j + 1, :] - 1.0 / d)
            if j + 1 < rr:
                w = W_ref[:, j:j + 1, :]               # (k, 1, B)
                s = S_ref[j:j + 1]                     # (1, k+1, B)
                W_ref[:, j + 1:rr, :] = (
                    W_ref[:, j + 1:rr, :]
                    - w * S_ref[j:j + 1, i0 + j + 1:i0 + rr, :])
                S_ref[j + 1:rr] = (
                    S_ref[j + 1:rr]
                    - W_ref[i0 + j + 1:i0 + rr, j:j + 1, :] * s)
        acc = W_ref[:, 0:1, :] * S_ref[0:1]
        for j in range(1, rr):
            acc = acc + W_ref[:, j:j + 1, :] * S_ref[j:j + 1]
        M_ref[:, :, :] = M_ref[:, :, :] - acc


def _make_gj_kernel(unroll: bool, block_r: int = 0):
    def _gj_kernel(A_ref, b_ref, x_ref, M_ref, *scratch):
        # A_ref (k, k, B): A[r, c, s] — batch s on lanes; b_ref (k, B);
        # M_ref VMEM scratch (k, k+1, B) holds the augmented systems.
        k = A_ref.shape[0]
        M_ref[:, :k, :] = A_ref[:]
        M_ref[:, k:k + 1, :] = b_ref[:][:, None, :]
        if block_r:
            _eliminate_blocked(M_ref, scratch[0], scratch[1], block_r)
        else:
            _eliminate(M_ref, unroll)
        x_ref[:] = M_ref[:, k, :]                    # (k, B)
    return _gj_kernel


def _make_gj_kernel_dma(unroll: bool, block_r: int = 0):
    def _gj_kernel_dma(A_hbm, b_ref, x_ref, M_ref, *scratch):
        # Large-k variant: A stays in HBM (memory_space=ANY); each grid step
        # DMAs its own batch block into the single augmented scratch, so the
        # only VMEM-resident copy of the (k, k, B) block is M_ref itself.
        sem = scratch[-1]
        k = M_ref.shape[0]
        bs = M_ref.shape[2]
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(A_hbm.at[:, :, pl.ds(i * bs, bs)],
                                   M_ref.at[:, :k, :], sem)
        cp.start()
        cp.wait()
        M_ref[:, k:k + 1, :] = b_ref[:][:, None, :]
        if block_r:
            _eliminate_blocked(M_ref, scratch[0], scratch[1], block_r)
        else:
            _eliminate(M_ref, unroll)
        x_ref[:] = M_ref[:, k, :]
    return _gj_kernel_dma


@functools.partial(jax.jit,
                   static_argnames=("interpret", "block_s", "unroll",
                                    "block_r"))
def gj_solve_pallas_bl(A_t, b_t, *, interpret: bool = False,
                       block_s: int | None = None,
                       unroll: bool | None = None,
                       block_r: int | None = None):
    """Batch-LAST batched SPD solve: A_t (k, k, S), b_t (k, S) -> x_t (k, S).

    This is the native kernel layout (batch on lanes). Producing the gram in
    this layout directly from the assembly einsum ("sek,sel->kls") removes
    the (S, k, k) -> (k, k, S) relayout pass that otherwise streams ~1 GB
    per ALS side through HBM before the solve even starts. S is padded to a
    block multiple with identity systems (x = 0 for the pad).

    ``block_r``: pivots per blocked-elimination panel (_eliminate_blocked).
    0 = the step-at-a-time elimination — the DEFAULT. The r4 A/B that
    "measured blocked negative" was invalid (its env-var arm switch hit
    the trace cache and measured r0 three times — ADVICE.md r4 #1); the
    corrected 3-run A/B (ml20M k=40 full ALS step, group-difference,
    block_r threaded explicitly) finds the arms statistically
    indistinguishable: medians r0 297.8 / r4 287.9 / r8 293.4 ms/iter
    with per-arm run-to-run spread up to 40%
    (results/als_gj_blocked_ab_r5.json). The simpler step-at-a-time
    kernel stays default; blocked elimination remains the tested opt-in
    (CRTPU_GJ_BLOCK_R or explicit block_r)."""
    k, _, S = A_t.shape
    if block_s is None:
        block_s = BLOCK_S
    if unroll is None:
        unroll = UNROLL
    if block_r is None:
        block_r = int(os.environ.get("CRTPU_GJ_BLOCK_R", "0"))
    # negative -> 0 (a negative block_r would make _eliminate_blocked's
    # range() empty and silently return the un-eliminated augmented system)
    block_r = max(0, min(block_r, k))
    pad = (-S) % block_s
    if pad:
        eye_t = jnp.broadcast_to(jnp.eye(k, dtype=A_t.dtype)[:, :, None],
                                 (k, k, pad))
        A_t = jnp.concatenate([A_t, eye_t], axis=2)
        b_t = jnp.concatenate([b_t, jnp.zeros((k, pad), b_t.dtype)], axis=1)
    Sp = S + pad
    cost = pl.CostEstimate(flops=2 * Sp * k * k * (k + 1),
                           bytes_accessed=Sp * (k * k + 2 * k) * 4,
                           transcendentals=0)
    blk_scr = ([pltpu.VMEM((k, block_r, block_s), jnp.float32),
                pltpu.VMEM((block_r, k + 1, block_s), jnp.float32)]
               if block_r else [])
    if _pipelined_fits(k, block_s, block_r):
        x_t = pl.pallas_call(
            _make_gj_kernel(unroll, block_r),
            grid=(Sp // block_s,),
            in_specs=[
                pl.BlockSpec((k, k, block_s), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, block_s), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k, block_s), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, Sp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((k, k + 1, block_s), jnp.float32)]
            + blk_scr,
            cost_estimate=cost,
            interpret=interpret,
        )(A_t.astype(jnp.float32), b_t.astype(jnp.float32))
    else:
        x_t = pl.pallas_call(
            _make_gj_kernel_dma(unroll, block_r),
            grid=(Sp // block_s,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((k, block_s), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k, block_s), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, Sp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((k, k + 1, block_s), jnp.float32)]
            + blk_scr + [pltpu.SemaphoreType.DMA],
            cost_estimate=cost,
            interpret=interpret,
        )(A_t.astype(jnp.float32), b_t.astype(jnp.float32))
    return x_t[:, :S]


@functools.partial(jax.jit, static_argnames=("interpret", "block_s"))
def gj_solve_pallas(A, b, *, interpret: bool = False,
                    block_s: int | None = None):
    """Batch-first convenience wrapper: A (S, k, k), b (S, k) -> x (S, k)."""
    A_t = jnp.transpose(A, (1, 2, 0))
    b_t = jnp.transpose(b, (1, 0))
    x_t = gj_solve_pallas_bl(A_t, b_t, interpret=interpret, block_s=block_s)
    return jnp.transpose(x_t, (1, 0))
