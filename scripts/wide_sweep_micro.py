"""Measure T-wide gather-reduce scaling for the rank-deferred tail design.

The one fast gather shape on TPU is gather -> products -> sibling lane
reductions (mode A, results/tail_barrier_micro: 5.4 ms/rank both sides at
T=2, ~0.4 ns/lane-row). The deferred-update tail needs tables of width
T = 1 + 2G (sweep vector + G pend + G old vectors), with T sibling
reductions per bucket: S0 = sum col0*vals, Sj = sum col0*colj. If the cost
is ~flat in T (gather-issue-bound, all T lanes arrive per row), deferring
the residual flush across G ranks wins ~2x on the whole tail.

Modes: T2, T5, T9, T17, T33 — both sides, k ranks in a fori_loop.
Also FL<G>: the amortized flush pass — one 2G-wide gather materialized +
elementwise vals update, run k/G times (its padded gather amplification is
128/2G instead of 64x).

Usage: python scripts/wide_sweep_micro.py [k=40]

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
    _bslice, extend_zero, lanes_to_slots, slots_to_lanes)
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
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(m) * 1e-3, jnp.float32)
    v0 = jnp.asarray(rng.standard_normal(n) * 1e-3, jnp.float32)
    own_u = jnp.asarray(rng.standard_normal(rows.n_slots) * 1e-3, jnp.float32)
    own_i = jnp.asarray(rng.standard_normal(cols.n_slots) * 1e-3, jnp.float32)

    def wide_sweep(idx, vals, side, table_ext):
        """T sibling reductions per bucket: S0 = sum col0*vals,
        Sj = sum col0*colj (j>=1)."""
        T = int(table_ext.shape[1])
        outs = [[] for _ in range(T)]
        for i, b in enumerate(side.buckets):
            g = table_ext[idx[i]]                    # (rows, L, T)
            sw = g[..., 0]
            outs[0].append(lanes_to_slots(sw * vals[i], b))
            for j in range(1, T):
                outs[j].append(lanes_to_slots(sw * g[..., j], b))
        tail = side.n_slots - (side.bucket_offsets[-1]
                               + side.buckets[-1].slots_per_shard)
        zt = [jnp.zeros(tail, jnp.float32)] if tail else []
        return [jnp.concatenate(o + zt) for o in outs]

    def flush(idx, vals, side, table_ext, owns):
        """One 2G-wide materialized gather + elementwise vals update."""
        T = int(table_ext.shape[1])
        out = []
        for i, b in enumerate(side.buckets):
            g = table_ext[idx[i]]                    # (rows, L, T) padded
            nv = vals[i]
            for j in range(T):
                nv = nv + jnp.float32((-1.0) ** j) * g[..., j] * \
                    slots_to_lanes(_bslice(owns[j], side, i), b)
            out.append(nv)
        return tuple(out)

    def make_sweep(T):
        @jax.jit
        def prog(u, v, vals_r, vals_c):
            def body(t, carry):
                u, v = carry
                ctab = extend_zero(jnp.stack(
                    [u * (1.0 + 1e-9 * j * (t + 1)) for j in range(T)], -1))
                rtab = extend_zero(jnp.stack(
                    [v * (1.0 + 1e-9 * j * (t + 1)) for j in range(T)], -1))
                sc = wide_sweep(idx_c, vals_c, cols, ctab)
                sr = wide_sweep(idx_r, vals_r, rows, rtab)
                u = u + 1e-12 * sum(x[:8].sum() for x in sr)
                v = v + 1e-12 * sum(x[:8].sum() for x in sc)
                return u, v
            return jax.lax.fori_loop(0, k, body, (u, v))
        return prog

    def make_flush(G):
        T = 2 * G
        owns_i = [own_i * (1.0 + 0.01 * j) for j in range(T)]
        owns_u = [own_u * (1.0 + 0.01 * j) for j in range(T)]

        @jax.jit
        def prog(u, v, vals_r, vals_c):
            def body(t, carry):
                u, v, vals_r, vals_c = carry
                s = 1e-9 * (t + 1).astype(jnp.float32)
                ctab = extend_zero(jnp.stack(
                    [u * (1.0 + s * j) for j in range(T)], -1))
                rtab = extend_zero(jnp.stack(
                    [v * (1.0 + s * j) for j in range(T)], -1))
                vals_c = flush(idx_c, vals_c, cols, ctab, owns_i)
                vals_r = flush(idx_r, vals_r, rows, rtab, owns_u)
                u = u + 1e-12 * vals_r[0][0, :1].sum()
                v = v + 1e-12 * vals_c[0][0, :1].sum()
                return u, v, vals_r, vals_c
            nflush = max(1, k // G)
            return jax.lax.fori_loop(0, nflush, body,
                                     (u, v, vals_r, vals_c))
        return prog

    out = {"k": k}
    for T in (2, 5, 9, 17, 33):
        prog = make_sweep(T)
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r0, vals_c0)
        _ = np.asarray(r[0]).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r0, vals_c0)
        _ = np.asarray(r[0]).sum()
        dt = time.perf_counter() - t0
        out[f"T{T}"] = {"per_rank_ms": round(dt / k * 1e3, 2),
                        "compile_s": round(compile_s, 1)}
        print(f"T{T}: {dt/k*1e3:.2f} ms/rank (compile {compile_s:.1f}s)",
              flush=True)
    for G in (4, 8):
        prog = make_flush(G)
        nflush = max(1, k // G)
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r0, vals_c0)
        _ = np.asarray(r[0]).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r0, vals_c0)
        _ = np.asarray(r[0]).sum()
        dt = time.perf_counter() - t0
        out[f"FL{G}"] = {"per_flush_ms": round(dt / nflush * 1e3, 2),
                         "per_rank_ms": round(dt / (nflush * G) * 1e3, 2),
                         "compile_s": round(compile_s, 1)}
        print(f"FL{G}: {dt/nflush*1e3:.2f} ms/flush = "
              f"{dt/(nflush*G)*1e3:.2f} ms/rank (compile {compile_s:.1f}s)",
              flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
