"""Pallas TPU kernels: fused CCD++ panel passes over NaN-sentinel residuals.

The XLA hybrid step touches each dense panel 3+ times per rank (residual
update read+write, v-sweep read, u-sweep read) and, in NaN-sentinel mode,
reads the residual once per g/h einsum pair — ~12 B/cell/rank at bf16.
These kernels fuse each pass group so every byte is read once:

  * ``panel_update_vsweep`` — ONE read-modify-write pass: applies the
    deferred-subtract + add-back delta (outer(u_old, v_old) −
    outer(u_pend, v_pend)), writes the new residual, and emits BOTH
    v-sweep partials (g = uᵀ·R_masked, h = (u²)ᵀ·mask) from the freshly
    updated block while it is VMEM-resident.
  * ``panel_usweep`` — ONE read pass: emits the u-sweep partials
    (g = R_masked·v, h = mask·v²).

Together: 2 reads + 1 write = 6 B/cell/rank at bf16 — half the XLA
schedule's traffic. The mask is derived in-register from the NaN sentinel
(mask_dtype="nan", ops/densify.py), so no mask array exists at all.

Layout rules learned the hard way (each measured on a 3.05e9-cell bf16
panel; HBM floor A 7.4 ms / B 3.7 ms):

  1. EVERY vector crosses the HBM↔VMEM boundary in ROW form — u-side as
     (1, Mp) arrays blocked (1, bm), v-side as (1, W) — never as (M, 1)
     columns. A (bm, 1) block is lane-padded 1→128 by the T(8,128)
     tiling, so per-step column-vector DMAs cost 128x their payload
     (they equaled the panel's own traffic).
  2. Orientation changes happen IN-REGISTER on the tiny vectors
     (``u_row.T`` — a cheap (1, n)↔(n, 1) relayout), never on the
     (bm, bw) block: a lane-contracting ``dot_general`` on the block
     makes Mosaic transpose the whole block every step (B pass 30.9 →
     13.2 ms native).
  3. The rank-1 delta is a VPU broadcast (u_col * v_row) that fuses into
     the elementwise update chain; expressing it as an MXU outer product
     materializes (bm, bw) f32 VMEM temps (A pass 67 → 22.5 ms).
  4. Big-block reductions DO use the MXU, in its native orientation
     (contract lanes of LHS x sublanes of RHS): uᵀ·R = dot((1,bm),
     (bm,bw)); R·v = dot((bm,bw), v.T) with the (bm, 1) product
     transposed back to a row in-register.

Replaces the reference's per-rank CUDA kernel sequence
UpdateRating_DUAL + RankOneUpdate_v/_u (/root/reference/cuda_src/
CCD_CUDA.cu:60-104,24-58) for the panel-covered cells; the decomposition
itself has no reference counterpart.

Grid/accumulation notes: reductions that span grid steps keep their
reduced dimension INNERMOST (fastest) so the tiny accumulator output
blocks are revisited consecutively — initialized on the first visit
(pl.when), accumulated in VMEM, flushed when the outer index advances.
TPU grids are sequential, making this race-free.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

#: default block shape (rows x cols). 512x2048 bf16 = 2 MB residual block;
#: with double-buffered in/out aliasing plus f32 temps this stays under
#: scoped VMEM (3072-wide fails to compile). Measured best on the v5e
#: block sweep: A 22.5 ms / B 13.2 ms on a 3.05e9-cell panel (1024-wide:
#: 24.7 / 13.2). Env-overridable for block-size sweeps.
BM = int(os.environ.get("CRTPU_PANEL_BM", "512"))
BW = int(os.environ.get("CRTPU_PANEL_BW", "2048"))

_F32 = jax.lax.Precision.HIGHEST


def _round_to_storage(x, dtype):
    """Round f32 ``x`` to the storage dtype's grid, returning f32, with an
    op sequence that is honest on EVERY backend. A plain
    astype(dt).astype(f32) round-trip is elided by XLA's excess-precision
    rule (measured 0.3% sweep-vs-stored drift), and lax.reduce_precision
    does not lower in Mosaic — so bf16 uses the canonical integer
    round-to-nearest-even on the raw bits (NaN sentinels are canonical
    0x7FC00000 and survive the bias add unchanged). fp8 keeps the astype
    round-trip (screening dtype; Mosaic lowers its converts honestly)."""
    dt = jnp.dtype(dtype)
    if dt == jnp.dtype(jnp.float32):
        return x
    if dt == jnp.dtype(jnp.bfloat16):
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        lsb = (bits >> 16) & jnp.uint32(1)
        rounded = (bits + jnp.uint32(0x7FFF) + lsb) & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(rounded, jnp.float32)
    return x.astype(dt).astype(jnp.float32)


def padded_panel_shape(M: int, W: int, bm: int = BM, bw: int = BW,
                       shards: int = 1) -> tuple[int, int]:
    """Block-aligned allocation shape for a (M, W) panel so the kernels run
    pad-free (an in-loop pad/slice would add two full copy passes per
    rank). Blocks clamp to the panel dims, so small panels stay small.

    ``shards`` > 1 (M must be shards-aligned): each device's LOCAL row
    block is padded independently, so the global array is the
    concatenation of N block-aligned local blocks — the layout the
    sharded hybrid step needs (tail-only padding would shift every
    device's block boundary)."""
    if shards > 1:
        Ml = M // shards
        bm_ = min(bm, Ml)
        return (shards * (-(-Ml // bm_) * bm_),
                padded_panel_shape(Ml, W, bm, bw)[1])
    bm_, bw_ = min(bm, M), min(bw, W)
    return (-(-M // bm_) * bm_, -(-W // bw_) * bw_)


def _col_reduce(u_row, B):
    """(1, bw) = u·B for u (1, bm), B (bm, bw) — MXU-NATIVE contraction
    (lanes of LHS x sublanes of RHS), f32 accumulate."""
    return jax.lax.dot_general(u_row, B, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_F32)


def _row_reduce_rowout(v_row, B):
    """(1, bm) = (B·vᵀ)ᵀ for B (bm, bw), v (1, bw). B·vᵀ contracts lanes
    of B against sublanes of vᵀ — MXU-native, so only the two TINY vectors
    relayout (v to a column going in, the (bm, 1) product back to a row
    coming out). Contracting v against B's lanes directly instead forces
    Mosaic to transpose the whole (bm, bw) block every step — measured
    2.3x slower (30.9 vs 13.2 ms on a 3.05e9-cell panel)."""
    prod = jax.lax.dot_general(B, v_row.T, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_F32)
    return prod.T


def _uv_kernel(Rd_ref, uo_ref, up_ref, vo_ref, vp_ref,
               Rout_ref, g_ref, h_ref):
    im = pl.program_id(1)
    f32 = jnp.float32
    uo, up = uo_ref[...], up_ref[...]    # (1, bm) row-blocks
    # delta via VPU broadcast from in-register transposed columns: fuses
    # into the elementwise update chain. MXU outer products (contraction
    # dim 1) materialize two (bm, bw) f32 VMEM temps instead — measured
    # 3x slower (67 vs 22.5 ms on a 3.05e9-cell panel).
    delta = uo.T * vo_ref[...] - up.T * vp_ref[...]
    # f32 add + ONE explicit rounding to the storage dtype. The sweep MUST
    # see exactly the value that persists (see _round_to_storage).
    # NaN (unobserved sentinel) passes through the add untouched.
    Rnew = _round_to_storage(Rd_ref[...].astype(f32) + delta, Rd_ref.dtype)
    Rout_ref[...] = Rnew.astype(Rd_ref.dtype)         # exact: pre-rounded
    isn = jnp.isnan(Rnew)
    Rf = jnp.where(isn, jnp.float32(0), Rnew)
    Mf = (~isn).astype(f32)
    gp = _col_reduce(uo, Rf)                          # (1, bw)
    hp = _col_reduce(uo * uo, Mf)

    @pl.when(im == 0)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)
        h_ref[...] = jnp.zeros_like(h_ref)

    g_ref[...] += gp
    h_ref[...] += hp


def _vsweep_kernel(Rd_ref, u_ref, g_ref, h_ref):
    im = pl.program_id(1)
    f32 = jnp.float32
    Rf32 = Rd_ref[...].astype(f32)
    isn = jnp.isnan(Rf32)
    Rf = jnp.where(isn, jnp.float32(0), Rf32)
    Mf = (~isn).astype(f32)
    u = u_ref[...]                       # (1, bm)
    gp = _col_reduce(u, Rf)
    hp = _col_reduce(u * u, Mf)

    @pl.when(im == 0)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)
        h_ref[...] = jnp.zeros_like(h_ref)

    g_ref[...] += gp
    h_ref[...] += hp


def _usweep_kernel(Rd_ref, v_ref, g_ref, h_ref):
    jw = pl.program_id(1)
    f32 = jnp.float32
    Rf32 = Rd_ref[...].astype(f32)
    isn = jnp.isnan(Rf32)
    Rf = jnp.where(isn, jnp.float32(0), Rf32)
    Mf = (~isn).astype(f32)
    v = v_ref[...]                       # (1, bw)
    gp = _row_reduce_rowout(v, Rf)                    # (1, bm)
    hp = _row_reduce_rowout(v * v, Mf)

    @pl.when(jw == 0)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)
        h_ref[...] = jnp.zeros_like(h_ref)

    g_ref[...] += gp
    h_ref[...] += hp


def _pad2(x, bm, bw, fill):
    M, W = x.shape
    pm, pw = (-M) % bm, (-W) % bw
    if pm or pw:
        x = jnp.pad(x, ((0, pm), (0, pw)), constant_values=fill)
    return x


def _row_flat(x, Mp):
    """(M,) f32 vector -> (1, Mp) row form (zero-padded). Blocks of shape
    (1, bm) then satisfy Mosaic's sublane rule (block dim 1 == array dim 1)
    while keeping the vector lane-major — a (Mp, 1) column would be
    lane-padded 1->128 on every per-step DMA."""
    return jnp.pad(x.astype(jnp.float32), (0, Mp - x.shape[0]))[None, :]


@functools.partial(jax.jit, static_argnames=("interpret", "bm", "bw"))
def panel_update_vsweep(Rd, u_old, u_pend, v_old, v_pend, *,
                        interpret: bool = False, bm: int = BM, bw: int = BW):
    """Fused residual update + v-sweep partials for one NaN-sentinel panel.

    Rd (M, W) storage dtype; u_* (M,) f32; v_* (W,) f32. Returns
    (Rd_new, g, h): g[j] = Σ_i u_old[i]·R_new[i,j]·mask, h[j] = Σ_i
    u_old[i]²·mask — identical math to the XLA einsum path, blocked
    f32 accumulation order.
    """
    M, W = Rd.shape
    bm_, bw_ = min(bm, M), min(bw, W)
    Rp = _pad2(Rd, bm_, bw_, jnp.nan)    # pad cells: unobserved
    Mp, Wp = Rp.shape
    f32 = jnp.float32
    uo = _row_flat(u_old, Mp)
    up = _row_flat(u_pend, Mp)
    vo = _pad2(v_old.astype(f32)[None, :], 1, bw_, 0.0)
    vp = _pad2(v_pend.astype(f32)[None, :], 1, bw_, 0.0)
    grid = (Wp // bw_, Mp // bm_)        # rows innermost: g/h accumulate
    Rn, g, h = pl.pallas_call(
        _uv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bw_), lambda jw, im: (im, jw)),
            pl.BlockSpec((1, bm_), lambda jw, im: (0, im)),
            pl.BlockSpec((1, bm_), lambda jw, im: (0, im)),
            pl.BlockSpec((1, bw_), lambda jw, im: (0, jw)),
            pl.BlockSpec((1, bw_), lambda jw, im: (0, jw)),
        ],
        out_specs=[
            pl.BlockSpec((bm_, bw_), lambda jw, im: (im, jw)),
            pl.BlockSpec((1, bw_), lambda jw, im: (0, jw)),
            pl.BlockSpec((1, bw_), lambda jw, im: (0, jw)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Wp), Rd.dtype),
            jax.ShapeDtypeStruct((1, Wp), f32),
            jax.ShapeDtypeStruct((1, Wp), f32),
        ],
        input_output_aliases={0: 0},     # residual updated in place
        cost_estimate=pl.CostEstimate(
            flops=11 * Mp * Wp,
            bytes_accessed=2 * Mp * Wp * Rd.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(Rp, uo, up, vo, vp)
    return Rn[:M, :W], g[0, :W], h[0, :W]


@functools.partial(jax.jit, static_argnames=("interpret", "bm", "bw"))
def panel_vsweep(Rd, u, *, interpret: bool = False, bm: int = BM,
                 bw: int = BW):
    """v-sweep partials only (inner iterations i > 0, where no residual
    update precedes the sweep): g[j] = Σ_i u[i]·R_masked[i,j], h[j] =
    Σ_i u[i]²·mask[i,j]. One read pass."""
    M, W = Rd.shape
    bm_, bw_ = min(bm, M), min(bw, W)
    Rp = _pad2(Rd, bm_, bw_, jnp.nan)
    Mp, Wp = Rp.shape
    f32 = jnp.float32
    uu = _row_flat(u, Mp)
    grid = (Wp // bw_, Mp // bm_)        # rows innermost: g/h accumulate
    g, h = pl.pallas_call(
        _vsweep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bw_), lambda jw, im: (im, jw)),
            pl.BlockSpec((1, bm_), lambda jw, im: (0, im)),
        ],
        out_specs=[
            pl.BlockSpec((1, bw_), lambda jw, im: (0, jw)),
            pl.BlockSpec((1, bw_), lambda jw, im: (0, jw)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Wp), f32),
            jax.ShapeDtypeStruct((1, Wp), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * Mp * Wp,
            bytes_accessed=Mp * Wp * Rd.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(Rp, uu)
    return g[0, :W], h[0, :W]


@functools.partial(jax.jit, static_argnames=("interpret", "bm", "bw"))
def panel_usweep(Rd, v, *, interpret: bool = False, bm: int = BM,
                 bw: int = BW):
    """u-sweep partials for one NaN-sentinel panel: g[i] = Σ_j
    R_masked[i,j]·v[j], h[i] = Σ_j mask[i,j]·v[j]². One read pass; the
    per-row outputs come back as (1, Mp) rows from the kernel (a (M, 1)
    column output would be 128x lane-padded on every flush)."""
    M, W = Rd.shape
    bm_, bw_ = min(bm, M), min(bw, W)
    Rp = _pad2(Rd, bm_, bw_, jnp.nan)
    Mp, Wp = Rp.shape
    f32 = jnp.float32
    vv = _pad2(v.astype(f32)[None, :], 1, bw_, 0.0)
    grid = (Mp // bm_, Wp // bw_)        # cols innermost: g/h accumulate
    g, h = pl.pallas_call(
        _usweep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bw_), lambda im, jw: (im, jw)),
            pl.BlockSpec((1, bw_), lambda im, jw: (0, jw)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm_), lambda im, jw: (0, im)),
            pl.BlockSpec((1, bm_), lambda im, jw: (0, im)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Mp), f32),
            jax.ShapeDtypeStruct((1, Mp), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * Mp * Wp,
            bytes_accessed=Mp * Wp * Rd.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(Rp, vv)
    return g[0, :M], h[0, :M]
