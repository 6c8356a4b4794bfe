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

Replaces the reference's per-rank CUDA kernel sequence
UpdateRating_DUAL + RankOneUpdate_v/_u (/root/reference/cuda_src/
CCD_CUDA.cu:60-104,24-58) for the panel-covered cells; the decomposition
itself has no reference counterpart.

Grid/accumulation notes: the reduction over panel rows (for g/h) spans
row-grid steps, so the row dimension is innermost (fastest) and the
(1, bw) output blocks are revisited — initialized at the first row block
(pl.when), accumulated in VMEM, flushed when the column block advances.
TPU grids are sequential, making this race-free.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

#: default block shape (rows x cols). 512x1024 bf16 = 1 MB residual block;
#: with double-buffered in/out aliasing plus f32 temps this stays well
#: under scoped VMEM. Env-overridable for block-size sweeps.
BM = int(os.environ.get("CRTPU_PANEL_BM", "512"))
BW = int(os.environ.get("CRTPU_PANEL_BW", "1024"))


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


def padded_panel_shape(M: int, W: int, bm: int = BM,
                       bw: int = BW) -> tuple[int, int]:
    """Block-aligned allocation shape for a (M, W) panel so the kernels run
    pad-free (an in-loop pad/slice would add two full copy passes per
    rank). Blocks clamp to the panel dims, so small panels stay small."""
    bm_, bw_ = min(bm, M), min(bw, W)
    return (-(-M // bm_) * bm_, -(-W // bw_) * bw_)


_F32 = jax.lax.Precision.HIGHEST


def _col_reduce(a, B):
    """(1, bw) = aᵀ·B for a (bm, 1), B (bm, bw) — MXU, f32 accumulate.
    VPU broadcast-multiply + cross-sublane sum was ~3x off the HBM
    roofline at Netflix panel sizes; the MXU does these for free."""
    return jax.lax.dot_general(a, B, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_F32)


def _row_reduce(B, v):
    """(bm, 1) = B·vᵀ for B (bm, bw), v (1, bw) — MXU, f32 accumulate."""
    return jax.lax.dot_general(B, v, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_F32)


def _uv_kernel(Rd_ref, uo_ref, up_ref, vo_ref, vp_ref,
               Rout_ref, g_ref, h_ref):
    im = pl.program_id(1)
    f32 = jnp.float32
    delta = (uo_ref[...] * vo_ref[...] - up_ref[...] * vp_ref[...])
    # f32 add + ONE explicit rounding to the storage dtype. The sweep MUST
    # see exactly the value that persists: a plain astype round-trip gets
    # elided by XLA's excess-precision rule (measured: bf16 g drifted 0.3%
    # from the stored residual), while lax.reduce_precision is an explicit
    # op that survives fusion. NaN (unobserved sentinel) passes through.
    Rnew = _round_to_storage(Rd_ref[...].astype(f32) + delta, Rd_ref.dtype)
    Rout_ref[...] = Rnew.astype(Rd_ref.dtype)         # exact: pre-rounded
    isn = jnp.isnan(Rnew)
    Rf = jnp.where(isn, jnp.float32(0), Rnew)
    Mf = (~isn).astype(f32)
    u = uo_ref[...]                      # (bm, 1); v-sweep reads u_old
    gp = _col_reduce(u, Rf)                           # (1, bw)
    hp = _col_reduce(u * u, Mf)

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
    u = u_ref[...]                       # (bm, 1)
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
    gp = _row_reduce(Rf, v)                           # (bm, 1)
    hp = _row_reduce(Mf, v * v)

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
    uo = _pad2(u_old.astype(f32)[:, None], bm_, 1, 0.0)
    up = _pad2(u_pend.astype(f32)[:, None], bm_, 1, 0.0)
    vo = _pad2(v_old.astype(f32)[None, :], 1, bw_, 0.0)
    vp = _pad2(v_pend.astype(f32)[None, :], 1, bw_, 0.0)
    grid = (Wp // bw_, Mp // bm_)        # rows innermost: g/h accumulate
    Rn, g, h = pl.pallas_call(
        _uv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bw_), lambda jw, im: (im, jw)),
            pl.BlockSpec((bm_, 1), lambda jw, im: (im, 0)),
            pl.BlockSpec((bm_, 1), lambda jw, im: (im, 0)),
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
    uu = _pad2(u.astype(f32)[:, None], bm_, 1, 0.0)
    grid = (Wp // bw_, Mp // bm_)        # rows innermost: g/h accumulate
    g, h = pl.pallas_call(
        _vsweep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bw_), lambda jw, im: (im, jw)),
            pl.BlockSpec((bm_, 1), lambda jw, im: (im, 0)),
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
    R_masked[i,j]·v[j], h[i] = Σ_j mask[i,j]·v[j]². One read pass."""
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
            pl.BlockSpec((bm_, 1), lambda im, jw: (im, 0)),
            pl.BlockSpec((bm_, 1), lambda im, jw: (im, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), f32),
            jax.ShapeDtypeStruct((Mp, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * Mp * Wp,
            bytes_accessed=Mp * Wp * Rd.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(Rp, vv)
    return g[:M, 0], h[:M, 0]
