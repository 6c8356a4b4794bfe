"""Panel-kernel variant matrix: where does the time go inside the fused
NaN-sentinel passes? (Round-3 follow-up: with the ELL tail fused, the
panels ARE the headline iteration — pass A 22.5 ms / pass B 13.2 ms on a
3.05e9-cell bf16 panel vs 7.4 / 3.7 ms HBM floors, i.e. ~272 GB/s of 819.)

Diagnostic variants, all timed PIPELINED (10 dispatches, one fence):

  rmw    pure read-modify-write floor: Rout = Rd + 1 (bf16), no sweeps —
         the achievable 2-pass rate at this block shape (DMA pipeline
         efficiency, no VPU chain)
  read   pure read floor: g += row-reduce(Rd as bits) — 1-pass rate
  A0     production panel_update_vsweep (manual RNE rounding, f32 chain)
  A1     astype-rounding variant: Rnew = (R + delta).astype(bf16);
         sweep consumes Rnew.astype(f32) — saves the 6-op manual RNE IF
         Mosaic lowers the round-trip honestly (checked: outputs compared
         bit-exactly against A0)
  B0     production panel_usweep

Usage: python scripts/panel_kernel_variants.py [M W bm bw]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

if os.environ.get("CRTPU_BENCH_CPU"):         # tiny CPU dry-run of the flow
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp      # noqa: E402
import numpy as np           # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from cuda_recommender_tpu.ops import panel_pallas as pp   # noqa: E402


def _rmw_kernel(Rd_ref, Rout_ref):
    Rout_ref[...] = Rd_ref[...] + jnp.bfloat16(1.0)


def _read_kernel(Rd_ref, g_ref):
    im = pl.program_id(1)
    x = Rd_ref[...].astype(jnp.float32)
    x = jnp.where(jnp.isnan(x), 0.0, x)

    @pl.when(im == 0)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)

    g_ref[...] += jnp.sum(x, axis=0, keepdims=True)


def _uv_kernel_astype(Rd_ref, uo_ref, up_ref, vo_ref, vp_ref,
                      Rout_ref, g_ref, h_ref):
    im = pl.program_id(1)
    f32 = jnp.float32
    uo, up = uo_ref[...], up_ref[...]
    delta = uo.T * vo_ref[...] - up.T * vp_ref[...]
    Rb = (Rd_ref[...].astype(f32) + delta).astype(Rd_ref.dtype)
    Rout_ref[...] = Rb
    Rnew = Rb.astype(f32)                # sweep MUST see the stored value
    isn = jnp.isnan(Rnew)
    Rf = jnp.where(isn, jnp.float32(0), Rnew)
    Mf = (~isn).astype(f32)
    gp = jax.lax.dot_general(uo, Rf, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)
    hp = jax.lax.dot_general(uo * uo, Mf, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)

    @pl.when(im == 0)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)
        h_ref[...] = jnp.zeros_like(h_ref)

    g_ref[...] += gp
    h_ref[...] += hp


def run_uv_variant(kernel, Rd, uo, up, vo, vp, bm, bw, interp):
    M, W = Rd.shape
    f32 = jnp.float32
    Mp, Wp = M, W                        # caller pre-pads
    grid = (Wp // bw, Mp // bm)
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bw), lambda jw, im: (im, jw)),
            pl.BlockSpec((1, bm), lambda jw, im: (0, im)),
            pl.BlockSpec((1, bm), lambda jw, im: (0, im)),
            pl.BlockSpec((1, bw), lambda jw, im: (0, jw)),
            pl.BlockSpec((1, bw), lambda jw, im: (0, jw)),
        ],
        out_specs=[
            pl.BlockSpec((bm, bw), lambda jw, im: (im, jw)),
            pl.BlockSpec((1, bw), lambda jw, im: (0, jw)),
            pl.BlockSpec((1, bw), lambda jw, im: (0, jw)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Wp), Rd.dtype),
            jax.ShapeDtypeStruct((1, Wp), f32),
            jax.ShapeDtypeStruct((1, Wp), f32),
        ],
        input_output_aliases={0: 0},
        interpret=interp,
    )(Rd, uo[None, :], up[None, :], vo[None, :], vp[None, :])


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 165_376
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 18_432
    bm = int(sys.argv[3]) if len(sys.argv) > 3 else pp.BM
    bw = int(sys.argv[4]) if len(sys.argv) > 4 else pp.BW
    interp = jax.default_backend() == "cpu"
    if interp:
        M, W = 1024, 2048
    n = 1 if interp else 10
    gb = M * W * 2 / 1e9
    bm_, bw_ = min(bm, M), min(bw, W)

    @jax.jit
    def init():
        r = jax.lax.broadcasted_iota(jnp.int32, (M, W), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (M, W), 1)
        obs = ((r * 7 + c * 13) % 41) == 0
        return jnp.where(obs, 1.0, jnp.nan).astype(jnp.bfloat16)

    rng = np.random.default_rng(0)
    uo = jnp.asarray(rng.normal(size=M).astype(np.float32))
    up = jnp.asarray(rng.normal(size=M).astype(np.float32))
    vo = jnp.asarray(rng.normal(size=W).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=W).astype(np.float32))

    def timed_chain(tag, fn, Rd, *rest, passes=3.0, chains=True):
        """Chain the (donated) residual through n dispatches, one fence."""
        out = fn(Rd, *rest)
        Rd = out[0] if chains else Rd
        np.asarray(jax.tree.leaves(out)[-1])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(Rd, *rest)
            Rd = out[0] if chains else Rd
        np.asarray(jax.tree.leaves(out)[-1])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt*1e3:.1f} ms ({passes * gb / dt:.0f} GB/s eff)",
              flush=True)
        return out, dt

    # floors
    rmw = jax.jit(lambda Rd: pl.pallas_call(
        _rmw_kernel, grid=(W // bw_, M // bm_),
        in_specs=[pl.BlockSpec((bm_, bw_), lambda jw, im: (im, jw))],
        out_specs=pl.BlockSpec((bm_, bw_), lambda jw, im: (im, jw)),
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.bfloat16),
        input_output_aliases={0: 0}, interpret=interp)(Rd),
        donate_argnums=0)
    Rd = init()
    (Rd,), _ = timed_chain("rmw_floor   ", lambda r: (rmw(r),), Rd,
                           passes=2.0)
    del Rd

    read = jax.jit(lambda Rd: pl.pallas_call(
        _read_kernel, grid=(W // bw_, M // bm_),
        in_specs=[pl.BlockSpec((bm_, bw_), lambda jw, im: (im, jw))],
        out_specs=pl.BlockSpec((1, bw_), lambda jw, im: (0, jw)),
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
        interpret=interp)(Rd))
    Rd = init()
    timed_chain("read_floor  ", lambda r: (r, read(r)), Rd, passes=1.0,
                chains=False)
    del Rd

    # A0: production
    kA0 = jax.jit(functools.partial(pp.panel_update_vsweep, bm=bm_, bw=bw_,
                                    interpret=interp), donate_argnums=0)
    Rd = init()
    (Rd0, g0, h0), _ = timed_chain("A0_prod     ", kA0, Rd, uo, up, vo, vp)

    # A1: astype rounding — and verify bit-exactness vs A0 over the SAME
    # number of chained applications from the same init
    kA1 = jax.jit(functools.partial(run_uv_variant, _uv_kernel_astype,
                                    bm=bm_, bw=bw_, interp=interp),
                  donate_argnums=0)
    Rd = init()
    (Rd1, g1, h1), _ = timed_chain("A1_astype   ", kA1, Rd, uo, up, vo, vp)
    b0 = np.asarray(jax.device_get(Rd0)).view(np.uint16)
    b1 = np.asarray(jax.device_get(Rd1)).view(np.uint16)
    mism = int((b0 != b1).sum())
    g_mism = float(np.abs(np.asarray(g0) - np.asarray(g1)).max())
    print(f"A1 vs A0: residual bit-mismatches {mism}/{b0.size}, "
          f"max|g diff| {g_mism:.3e}", flush=True)
    del Rd1, b0, b1

    # B0: production usweep
    kB = jax.jit(functools.partial(pp.panel_usweep, bm=bm_, bw=bw_,
                                   interpret=interp))
    timed_chain("B0_usweep   ", lambda r, v: (r, kB(r, v)), Rd0, vo,
                passes=1.0, chains=False)


if __name__ == "__main__":
    main()
