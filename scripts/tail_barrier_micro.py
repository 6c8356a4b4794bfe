"""Test the round-4 hypothesis on the fused ELL tail's 2.5x projection miss:
a gather consumed INSIDE another computation (whether via ops/ell_ops
fused_* lax.map bodies or via XLA rematerializing a tile into its consumer
fusion) runs ~6x slower than a standalone materializing gather pass
(results/fused_tail_micro_r4.json: FS sweeps-only 33 ms/rank vs the
materialized A/B control's 5.4; results/tail_micro_r3.json).

If true, the fix is NOT fusion — it is forced materialization:
jax.lax.optimization_barrier between the chunked row-gather and its
consumers pins the tiles as real HBM buffers, so consumers re-READ
(~0.16 ns/f32 at 819 GB/s) instead of re-GATHERING (~4.5 ns/row).

Modes (each ONE jitted program, k ranks in fori_loop with value deps):

  A    paired_gather + external lanes_to_slots sweep reductions, both
       sides (replicates tail_micro_r3 mode B: the fast baseline)
  AB   A with optimization_barrier on the gathered tiles
  C    A + residual updates REUSING the tiles (r3's +32.8 ms pathology)
  CB   C with optimization_barrier on the tiles — if the remat hypothesis
       holds, CB ~= A + ~4.6 ms of exclusive-tile update streams
  PROD full production-shaped tail rebuilt on barriers: 2-wide cols /
       3-wide rows barrier'd gathers + updates + sweeps + all 4
       stacked_remaps — the candidate replacement for fused_update_sweep

Usage: python scripts/tail_barrier_micro.py [k=40]

DCE WARNING (results/tail_floor_r4.json): modes in this script that consume
reduction outputs through [:8]-style SLICES are partially dead-code-
eliminated by XLA (slicing through the concatenated per-bucket outputs
drops every bucket but the first) and their absolute numbers UNDERSTATE
the true cost by up to 10x. Only modes that carry and return the values
arrays, or whose outputs pass through a lax.map, measure full work. Kept
as-is for the historical record — do not re-trust sliced-consumer numbers.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if os.environ.get("CRTPU_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp                                          # noqa: E402

from cuda_recommender_tpu.core.config import Config              # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.ops.ell_ops import (                   # noqa: E402
    _bslice, _row_gather_tiles, extend_zero, lanes_to_slots, slots_to_lanes,
    stacked_remap)
from cuda_recommender_tpu.solvers.ccd_hybrid import plan_hybrid  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    if os.environ.get("CRTPU_BENCH_CPU"):
        m, n, nnz, cells, k = 1_900, 450, 120_000, 9_000, 6
    else:
        m, n, nnz, cells = 480_189, 17_770, 100_000_000, 6_500_000_000
    R, _ = synthetic_cached(m, n, nnz, seed=1, test_fraction=0.02)
    cfg = Config(k=k, lambda_=0.05, backend="hybrid",
                 residual_dtype="bfloat16", mask_dtype="nan",
                 hybrid_dense_cells=cells,
                 hybrid_panel_widths=(4096, 2048) if n > 4096 else (64,))
    plan = plan_hybrid(R, cfg, materialize_dense=False)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side

    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_r0 = tuple(jnp.asarray(b.val) for b in rows.buckets)
    vals_c0 = tuple(jnp.asarray(b.val) for b in cols.buckets)
    upos_safe = jnp.asarray(plan.upos_of_slot_safe)
    ipos_safe = jnp.asarray(plan.ipos_of_slot_safe)
    slot_of_upos = jnp.asarray(plan.slot_of_upos)
    slot_of_ipos = jnp.asarray(plan.slot_of_ipos)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(m) * 1e-3, jnp.float32)
    v0 = jnp.asarray(rng.standard_normal(n) * 1e-3, jnp.float32)

    def gather_tiles(table_ext, idx, barrier):
        pcs = [_row_gather_tiles(table_ext, ix) for ix in idx]
        if barrier:
            pcs = [jax.lax.optimization_barrier(t) for t in pcs]
        return pcs

    def side_sweep(pcs, vals, side, col):
        gs, hs = [], []
        for i, b in enumerate(side.buckets):
            sw = pcs[i][col]
            gs.append(lanes_to_slots(sw * vals[i], b))
            hs.append(lanes_to_slots(sw * sw, b))
        tail = side.n_slots - (side.bucket_offsets[-1]
                               + side.buckets[-1].slots_per_shard)
        zt = [jnp.zeros(tail, jnp.float32)] if tail else []
        return jnp.concatenate(gs + zt), jnp.concatenate(hs + zt)

    def side_update(pcs, vals, side, owns, signs):
        out = []
        for i, b in enumerate(side.buckets):
            nv = vals[i]
            for j, (s, o) in enumerate(zip(signs, owns)):
                nv = nv + jnp.float32(s) * pcs[i][j] * slots_to_lanes(
                    _bslice(o, side, i), b)
            out.append(nv)
        return tuple(out)

    def make(mode):
        @jax.jit
        def prog(u, v, vals_r, vals_c):
            def body(t, carry):
                u, v, vals_r, vals_c = carry
                s = 1e-9 * (t + 1).astype(jnp.float32)
                up, vo = u * s, v * s
                if mode in ("A", "AB", "C", "CB"):
                    barrier = mode in ("AB", "CB")
                    pc = gather_tiles(extend_zero(jnp.stack([up, u], -1)),
                                      idx_c, barrier)
                    pr = gather_tiles(extend_zero(jnp.stack([vo, v], -1)),
                                      idx_r, barrier)
                    if mode in ("C", "CB"):
                        ovp, ovo = stacked_remap((vo, v), ipos_safe)
                        oup, ouo = stacked_remap((up, u), upos_safe)
                        vals_c = side_update(pc, vals_c, cols, (ovp, ovo),
                                             (-1e-6, 1e-6))
                        vals_r = side_update(pr, vals_r, rows, (oup, ouo),
                                             (-1e-6, 1e-6))
                    g, h = side_sweep(pc, vals_c, cols, 1)
                    gr, hr = side_sweep(pr, vals_r, rows, 1)
                    u = u + 1e-12 * gr[:8].sum()
                    v = v + 1e-12 * g[:8].sum()
                    return u, v, vals_r, vals_c
                # PROD: the full production-shaped tail on barriers:
                # update consumes cols [0,1]; sweep consumes col 1 (cols
                # side) / col 2 = the new v (rows side), exactly like
                # fused_update_sweep's sweep_col choices.
                ovp, ovo = stacked_remap((vo, v), ipos_safe)
                oup, ouo = stacked_remap((up, u), upos_safe)
                pc = gather_tiles(extend_zero(jnp.stack([up, u], -1)),
                                  idx_c, True)
                vals_c = side_update(pc, vals_c, cols, (ovp, ovo),
                                     (-1e-6, 1e-6))
                g, h = side_sweep(pc, vals_c, cols, 1)
                vs = v * 0.5
                pr = gather_tiles(extend_zero(jnp.stack([vo, v, vs], -1)),
                                  idx_r, True)
                vals_r = side_update(pr, vals_r, rows, (oup, ouo),
                                     (-1e-6, 1e-6))
                gr, hr = side_sweep(pr, vals_r, rows, 2)
                ge, he = stacked_remap((g, h), slot_of_ipos)
                gre, hre = stacked_remap((gr, hr), slot_of_upos)
                u = u + 1e-12 * gre[:8].sum()
                v = v + 1e-12 * ge[:8].sum()
                return u, v, vals_r, vals_c
            return jax.lax.fori_loop(0, k, body, (u, v, vals_r, vals_c))
        return prog

    out = {"k": k}
    for mode in ["A", "AB", "C", "CB", "PROD"]:
        prog = make(mode)
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r0, vals_c0)
        _ = np.asarray(r[0]).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r0, vals_c0)
        _ = np.asarray(r[0]).sum()
        dt = time.perf_counter() - t0
        out[mode] = {"total_s": round(dt, 3),
                     "per_rank_ms": round(dt / k * 1e3, 2),
                     "compile_s": round(compile_s, 1)}
        print(f"{mode}: {dt:.3f} s = {dt/k*1e3:.2f} ms/rank "
              f"(compile {compile_s:.1f}s)", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
