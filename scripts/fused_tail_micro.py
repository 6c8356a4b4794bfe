"""Attribute the FUSED ELL tail's per-rank cost at the Netflix-100M
headline plan (round-3 follow-up: after the single-consumer fusion the
decomposition still measures tail_only at ~38 ms/rank while the round-3
op-group controls predicted ~13: gathers+sweeps 5.5, in-chunk updates +4.6,
remaps ~3 — results/residual_update_micro_r3.json).

Modes, each ONE jitted program, k ranks in a fori_loop with value deps:

  F    production fused tail: stacked_remap owns + fused_update_sweep both
       sides (cols 2-wide, rows 3-wide) + stacked_remap outputs — exactly
       the rank_body's ELL section
  FN   F without the slot<->entity remaps (owns = resident slot vectors,
       partials consumed in slot space) — isolates remap cost
  F2   F with the rows side gathering 2-wide [v_old, v] instead of 3-wide
       (numerically wrong; times the 3rd table column's marginal cost)
  FS   fused_sweep only, both sides (the i>0 shape; no update, no owns)
  M    materialized 3-wide gather tiles (paired_gather) + ONE combined
       elementwise+reduce expression per bucket (update + g/h partials) —
       XLA multi-output fusion consumes each tile once; the sweep column
       is shared by the g-product and h-square
  M4   like M with a 4-wide table duplicating the sweep column, so every
       gathered column has EXACTLY one consumer op

Usage: python scripts/fused_tail_micro.py [k=40]

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
    _bslice, _row_gather_tiles, extend_zero, fused_sweep, fused_update_sweep,
    lanes_to_slots, slots_to_lanes, stacked_remap)
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
    own_u_const = jnp.asarray(rng.standard_normal(rows.n_slots) * 1e-3,
                              jnp.float32)
    own_i_const = jnp.asarray(rng.standard_normal(cols.n_slots) * 1e-3,
                              jnp.float32)

    def mat_update_sweep(idx, vals, side, table_ext, owns, signs, sweep_dup):
        """Materialized T-wide gather + one combined expression per bucket:
        each gathered column feeds the single multi-output fusion (update +
        g/h reduces)."""
        pcs = [_row_gather_tiles(table_ext, ix) for ix in idx]
        new_vals, gs, hs = [], [], []
        nu = len(signs)
        for i, b in enumerate(side.buckets):
            g = pcs[i]
            nv = vals[i]
            for j, (s, o) in enumerate(zip(signs, owns)):
                nv = nv + s * g[j] * slots_to_lanes(_bslice(o, side, i), b)
            new_vals.append(nv)
            if sweep_dup:      # columns nu, nu+1, nu+2 are sweep copies —
                #                each gathered column has EXACTLY 1 consumer
                gs.append(lanes_to_slots(g[nu] * nv, b))
                hs.append(lanes_to_slots(g[nu + 1] * g[nu + 2], b))
            else:              # one sweep column, 2 consumers (g and h)
                gs.append(lanes_to_slots(g[nu] * nv, b))
                hs.append(lanes_to_slots(g[nu] * g[nu], b))
        tail = side.n_slots - (side.bucket_offsets[-1]
                               + side.buckets[-1].slots_per_shard)
        zt = [jnp.zeros(tail, jnp.float32)] if tail else []
        return (tuple(new_vals), jnp.concatenate(gs + zt),
                jnp.concatenate(hs + zt))

    def make(mode):
        @jax.jit
        def prog(u, v, vals_r, vals_c):
            def body(t, carry):
                u, v, vals_r, vals_c = carry
                s = 1e-9 * (t + 1).astype(jnp.float32)
                up, vo = u * s, v * s
                if mode in ("M", "M4"):
                    dup = mode == "M4"
                    ovp, ovo = stacked_remap((vo, v), ipos_safe)
                    oup, ouo = stacked_remap((up, u), upos_safe)
                    ctab = [up, u] + [u] * (3 if dup else 1)
                    vals_c, g, h = mat_update_sweep(
                        idx_c, vals_c, cols,
                        extend_zero(jnp.stack(ctab, -1)),
                        owns=(ovp, ovo), signs=(-1e-6, 1e-6), sweep_dup=dup)
                    vs = v * 0.5
                    rtab = [vo, v] + [vs] * (3 if dup else 1)
                    vals_r, gr, hr = mat_update_sweep(
                        idx_r, vals_r, rows,
                        extend_zero(jnp.stack(rtab, -1)),
                        owns=(oup, ouo), signs=(-1e-6, 1e-6), sweep_dup=dup)
                    ge, he = stacked_remap((g, h), slot_of_ipos)
                    gre, hre = stacked_remap((gr, hr), slot_of_upos)
                    u = u + 1e-12 * gre[:8].sum()
                    v = v + 1e-12 * ge[:8].sum()
                    return u, v, vals_r, vals_c
                if mode == "FS":
                    g, h = fused_sweep(idx_c, vals_c, cols,
                                       extend_zero(jnp.stack([u, u], -1)))
                    gr, hr = fused_sweep(idx_r, vals_r, rows,
                                         extend_zero(jnp.stack([v, v], -1)))
                    u = u + 1e-12 * gr[:m].sum()
                    v = v + 1e-12 * g[:n].sum()
                    return u, v, vals_r, vals_c
                if mode == "FN":
                    ovp, ovo = own_i_const, own_i_const * 0.5
                    oup, ouo = own_u_const, own_u_const * 0.5
                else:
                    ovp, ovo = stacked_remap((vo, v), ipos_safe)
                    oup, ouo = stacked_remap((up, u), upos_safe)
                vals_c, g, h = fused_update_sweep(
                    idx_c, vals_c, cols,
                    extend_zero(jnp.stack([up, u], -1)),
                    owns=(ovp, ovo), signs=(-1e-6, 1e-6), sweep_col=1)
                rtab = ([vo, v] if mode == "F2" else [vo, v, v * 0.5])
                vals_r, gr, hr = fused_update_sweep(
                    idx_r, vals_r, rows,
                    extend_zero(jnp.stack(rtab, -1)),
                    owns=(oup, ouo), signs=(-1e-6, 1e-6),
                    sweep_col=len(rtab) - 1)
                if mode == "FN":
                    u = u + 1e-12 * gr[:8].sum()
                    v = v + 1e-12 * g[:8].sum()
                else:
                    ge, he = stacked_remap((g, h), slot_of_ipos)
                    gre, hre = stacked_remap((gr, hr), slot_of_upos)
                    u = u + 1e-12 * gre[:8].sum()
                    v = v + 1e-12 * ge[:8].sum()
                return u, v, vals_r, vals_c
            return jax.lax.fori_loop(0, k, body, (u, v, vals_r, vals_c))
        return prog

    out = {"k": k}
    for mode in ["M", "M4", "F", "FN", "F2", "FS"]:
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
